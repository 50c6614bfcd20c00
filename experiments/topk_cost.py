"""Measure candidate-selection strategies for the fat-cluster broad phase:
per-ray top-K smallest t over C clusters, on TPU.

Strategies:
  a) jax.lax.top_k on the negated scores
  b) jax.lax.approx_top_k (recall<1 -> only usable with a fallback pass)
  c) K rounds of argmin+mask (what a scan-based selector would pay)
Also times the scoring matmul itself for context.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

R = 8192  # ray chunk
C = 16384  # clusters
K = 32
ITERS = 8


def timed(fn, *args, reps=3):
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(fn(*args))
    return (time.perf_counter() - t0) / reps


def main():
    rtt = timed(jax.jit(lambda x: x + 1.0), jnp.zeros(()))
    print(f"RTT {rtt*1e3:.1f} ms")

    scores = jax.random.uniform(jax.random.key(0), (R, C), jnp.float32)
    rayf = jax.random.normal(jax.random.key(1), (R, 20), jnp.float32)
    clusf = jax.random.normal(jax.random.key(2), (20, C), jnp.float32)

    @jax.jit
    def matmul_only(rayf, clusf):
        def body(i, s):
            return s + (rayf + i) @ clusf

        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((R, C))).sum()

    dt = (timed(matmul_only, rayf, clusf) - rtt) / ITERS
    print(f"scoring matmul ({R}x20x{C}): {dt*1e3:.2f} ms/iter")

    @jax.jit
    def topk(scores):
        def body(i, s):
            v, idx = jax.lax.top_k(-(scores + i), K)
            return s + v.sum() + idx.sum()

        return jax.lax.fori_loop(0, ITERS, body, 0.0)

    dt = (timed(topk, scores) - rtt) / ITERS
    print(f"lax.top_k    ({R}x{C} -> {K}): {dt*1e3:.2f} ms/iter")

    @jax.jit
    def approx(scores):
        def body(i, s):
            v, idx = jax.lax.approx_max_k(-(scores + i), K)
            return s + v.sum() + idx.sum()

        return jax.lax.fori_loop(0, ITERS, body, 0.0)

    dt = (timed(approx, scores) - rtt) / ITERS
    print(f"approx_max_k ({R}x{C} -> {K}): {dt*1e3:.2f} ms/iter")

    @jax.jit
    def argmin_rounds(scores):
        def body(i, carry):
            s, acc = carry
            j = jnp.argmin(s, axis=1)
            acc = acc + j.sum()
            s = s + jax.nn.one_hot(j, C) * 1e9
            return s, acc

        _, acc = jax.lax.fori_loop(0, K, lambda i, c: body(i, c), (scores, 0.0))
        return acc

    dt = timed(argmin_rounds, scores) - rtt
    print(f"argmin x{K} rounds ({R}x{C}): {dt*1e3:.2f} ms total")


if __name__ == "__main__":
    main()
