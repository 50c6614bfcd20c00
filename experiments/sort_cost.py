"""Sort-cost census on the current axon/XLA stack (round 5).

The reinstalled stack sorts ~25-100x slower than rounds 2/3 measured
(argsort 1M was 0.27 ms, now ~30-110 ms), and the deferred ladder pays
~7 argsorts per traversal call. Times each variant as K chained
iterations inside one dispatch (scalar pull), so tunnel RTT and D2H
cannot pollute the numbers.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

K = 8


def bench(name, fn, *args):
    out = fn(*args)
    float(np.asarray(out))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(fn(*args)))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s}: {best/K*1e3:8.2f} ms/op  ({best*1e3:7.1f} ms/{K})")


def chained(body):
    @jax.jit
    def f(x):
        def it(i, acc):
            return body(acc ^ i)  # new key stream each iter, same shape
        out = jax.lax.fori_loop(0, K, it, x)
        return out[0]
    return f


def chained_f(body):
    @jax.jit
    def f(x):
        def it(i, acc):
            return body(acc + jnp.float32(i))
        out = jax.lax.fori_loop(0, K, it, x)
        return out[0]
    return f


def partition_perm(mask):
    """Stable partition: permutation putting mask-True lanes first.
    Bit-identical to jnp.argsort(~mask) (both stable)."""
    n = mask.shape[0]
    m = mask.astype(jnp.int32)
    n_true = jnp.sum(m)
    pos_t = jnp.cumsum(m) - 1
    pos_f = n_true + jnp.cumsum(1 - m) - 1
    dest = jnp.where(mask, pos_t, pos_f)
    return jnp.zeros(n, jnp.int32).at[dest].set(
        jax.lax.iota(jnp.int32, n)
    )


def main():
    n = 262144
    rng = np.random.default_rng(0)
    ki = jax.device_put(rng.integers(0, 1 << 30, size=n).astype(np.int32))
    kb = jax.device_put((rng.random(n) < 0.3))
    kf = jax.device_put(rng.random(n).astype(np.float32))
    km = jax.device_put(rng.integers(0, 1 << 30, size=(n, 8)).astype(np.int32))

    bench("argsort i32 (default/stable)", chained(lambda x: jnp.argsort(x).astype(jnp.int32)), ki)
    bench("argsort i32 stable=False", chained(lambda x: jnp.argsort(x, stable=False).astype(jnp.int32)), ki)
    bench("sort i32 (values only)", chained(lambda x: jnp.sort(x)), ki)
    bench("lax.sort_key_val", chained(lambda x: jax.lax.sort_key_val(x, jax.lax.iota(jnp.int32, n))[1]), ki)
    bench("lax.sort 1-operand unstable", chained(lambda x: jax.lax.sort(x, is_stable=False)), ki)
    bench("argsort bool key", chained(lambda x: jnp.argsort((x & 1) == 1).astype(jnp.int32)), ki)
    bench("partition perm (cumsum+scatter)", chained(lambda x: partition_perm((x & 1) == 1)), ki)
    bench("argsort f32", chained_f(lambda x: jnp.argsort(x).astype(jnp.float32)), kf)

    @jax.jit
    def axis_sort(km):
        def it(i, acc):
            return jnp.argsort(-(acc ^ i), axis=1).astype(jnp.int32)
        return jax.lax.fori_loop(0, K, it, km)[0, 0]
    out = axis_sort(km); float(np.asarray(out))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); float(np.asarray(axis_sort(km)))
        best = min(best, time.perf_counter() - t0)
    print(f"{'argsort (n,8) axis=1':44s}: {best/K*1e3:8.2f} ms/op  ({best*1e3:7.1f} ms/{K})")

    # sanity: partition == argsort(~mask)
    mb = np.asarray(kb)
    p1 = np.asarray(jnp.argsort(~jnp.asarray(mb)))
    p2 = np.asarray(partition_perm(jnp.asarray(mb)))
    assert (p1 == p2).all(), "partition_perm != stable argsort(~mask)"
    print("partition_perm == argsort(~mask): OK")


if __name__ == "__main__":
    main()
