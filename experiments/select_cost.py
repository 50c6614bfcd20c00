"""Selection-primitive costs for the two-level broad phase:
  * top-k / approx-top-k over a SMALL C (256 superclusters)
  * 8x masked-argmax passes (scan extraction)
  * argsort of millions of keys (sort-centric pair grouping)
All at full-frame ray counts (262144) in one dispatch.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

R = 262144
C1 = 256
K = 8
ITERS = 4


def timed(fn, *args, reps=3):
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(fn(*args))
    return (time.perf_counter() - t0) / reps


def main():
    rtt = timed(jax.jit(lambda x: x + 1.0), jnp.zeros(()))
    print(f"RTT {rtt*1e3:.1f} ms")

    scores = jax.random.uniform(jax.random.key(0), (R, C1), jnp.float32)

    def loop(fn):
        @jax.jit
        def run(scores):
            def body(i, s):
                v, idx = fn(scores + i)
                return s + v.sum() + idx.sum()
            return jax.lax.fori_loop(0, ITERS, body, 0.0)
        return run

    dt = (timed(loop(lambda s: jax.lax.top_k(-s, K)), scores) - rtt) / ITERS
    print(f"lax.top_k     ({R}x{C1} -> {K}): {dt*1e3:.2f} ms/iter")

    dt = (timed(loop(lambda s: jax.lax.approx_max_k(-s, K)), scores) - rtt) / ITERS
    print(f"approx_max_k  ({R}x{C1} -> {K}): {dt*1e3:.2f} ms/iter")

    @jax.jit
    def argmax8(scores):
        def body(i, s):
            sc = scores + i
            acc = 0.0
            for _ in range(K):
                j = jnp.argmin(sc, axis=1)
                acc = acc + j.sum()
                sc = sc + jax.nn.one_hot(j, C1) * 1e9
            return s + acc
        return jax.lax.fori_loop(0, ITERS, body, 0.0)

    dt = (timed(argmax8, scores) - rtt) / ITERS
    print(f"argmin x{K} extract ({R}x{C1}): {dt*1e3:.2f} ms/iter")

    # full-row sort of the C1 axis (gives ALL candidates in t order)
    dt = (timed(loop(lambda s: (jnp.sort(s, axis=1), jnp.int32(0))), scores) - rtt) / ITERS
    print(f"sort axis1    ({R}x{C1}): {dt*1e3:.2f} ms/iter")

    for n in (1 << 20, 1 << 21, 1 << 22):
        keys = jax.random.randint(jax.random.key(1), (n,), 0, 1 << 30, jnp.int32)

        @jax.jit
        def argsort_n(keys):
            def body(i, s):
                return s + jnp.argsort(keys ^ i).sum()
            return jax.lax.fori_loop(0, ITERS, body, jnp.int64(0) if False else 0)

        dt = (timed(argsort_n, keys) - rtt) / ITERS
        print(f"argsort {n>>20}M int32 keys: {dt*1e3:.2f} ms/iter")


if __name__ == "__main__":
    main()
