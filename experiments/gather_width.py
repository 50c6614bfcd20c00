"""Microbenchmark: XLA gather throughput vs row width on the real TPU.

Methodology (hard-won, round 2):
* ``sum(gather(T, idx))`` is strength-reduced by XLA to a width-1 gather;
  weight the gathered rows with a per-index random matrix instead.
* ``block_until_ready`` under axon resolves before the work is done;
  pull a scalar to host numpy.
* One dispatch over the tunnel costs ~33 ms RTT — amortize K kernel
  iterations inside a single jit (fori_loop, rotating the index vector so
  iterations can't be CSE'd) and subtract the measured RTT floor.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

N_IDX = 1 << 20  # 1M gathers per iteration
TABLE_BYTES = 256 << 20
K = 16  # kernel iterations per dispatch


def timed_scalar(fn, *args, reps=3):
    np.asarray(fn(*args))  # compile + settle
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(fn(*args))
    return (time.perf_counter() - t0) / reps


def rtt_floor():
    f = jax.jit(lambda x: x + 1.0)
    return timed_scalar(f, jnp.zeros(()))


def bench_width(width: int, rtt: float):
    rows = TABLE_BYTES // (4 * width)
    table = jax.random.normal(jax.random.key(0), (rows, width), jnp.float32)
    weights = jax.random.normal(jax.random.key(1), (N_IDX, width), jnp.float32)
    idx = jnp.asarray(np.random.default_rng(0).integers(0, rows, N_IDX), jnp.int32)

    @jax.jit
    def run(table, idx, w):
        def body(i, s):
            ix = (idx + i * 12345) % rows  # different random rows each iter
            return s + (jnp.take(table, ix, axis=0) * w).sum()

        return jax.lax.fori_loop(0, K, body, 0.0)

    dt = max(timed_scalar(run, table, idx, weights) - rtt, 1e-9) / K
    gather_bytes = N_IDX * width * 4
    print(f"width {width:5d} f32 ({width*4:6d} B/row): {dt*1e3:7.2f} ms/iter  "
          f"{N_IDX/dt/1e6:8.1f} Mrows/s  gather-read {gather_bytes/dt/1e9:7.1f} GB/s "
          f"(+same again in weight reads)")


def bench_copy(rtt: float):
    n = TABLE_BYTES // 4
    x = jax.random.normal(jax.random.key(2), (n,), jnp.float32)
    w = jax.random.normal(jax.random.key(3), (n,), jnp.float32)

    @jax.jit
    def run(x, w):
        def body(i, s):
            return s + (jnp.roll(x, i) * w).sum()

        return jax.lax.fori_loop(0, K, body, 0.0)

    dt = max(timed_scalar(run, x, w) - rtt, 1e-9) / K
    print(f"contiguous x*w sum over 2x{TABLE_BYTES>>20} MB: {dt*1e3:.2f} ms/iter "
          f"= {2*TABLE_BYTES/dt/1e9:.0f} GB/s")


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    rtt = rtt_floor()
    print(f"dispatch RTT floor: {rtt*1e3:.2f} ms")
    bench_copy(rtt)
    for width in (8, 32, 128, 256, 512, 1024):
        bench_width(width, rtt)
