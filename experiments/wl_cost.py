"""Per-while_loop fixed cost on axon TPU: K zero-iteration while_loops
chained over a (262144, 32) state, K = 0/1/4/16; also 0-iter vs 1-iter.

    python experiments/wl_cost.py
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

n = 262144
x0 = jnp.ones((n, 32), jnp.float32)

def sync(x):
    return float(np.asarray(x).reshape(-1)[0])

def timed(fn, *a, reps=5):
    sync(fn(*a))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); sync(fn(*a)); best = min(best, time.perf_counter() - t0)
    return best

for K in (0, 1, 4, 16):
    @jax.jit
    def f(x, K=K):
        for i in range(K):
            x = jax.lax.while_loop(
                lambda c: jnp.sum(c[:, 0]) < 0.0,  # false: 0 iterations
                lambda c: c + 1.0,
                x + np.float32(i) * 1e-30,
            )
        return x[0, 0]
    print(f"K={K:2d} zero-iter while_loops: {timed(f, x0)*1e3:7.1f} ms")

for K in (1, 4, 16):
    @jax.jit
    def g(x, K=K):
        for i in range(K):
            x = jax.lax.while_loop(
                lambda c: jnp.sum(c[:, 0]) < 2.0 * n,  # true once
                lambda c: c + 1.0,
                x + np.float32(i) * 1e-30,
            )
        return x[0, 0]
    print(f"K={K:2d} one-iter while_loops:  {timed(g, x0)*1e3:7.1f} ms")

# argsort + gather + scatter rung-boundary analog, K of them
for K in (1, 4, 16):
    @jax.jit
    def h(x, K=K):
        for i in range(K):
            keys = x[:, 1] + np.float32(i)
            prio = jnp.argsort(keys)[: n // 4]
            sub = x[prio] * 2.0
            x = x.at[prio].set(sub)
        return x[0, 0]
    print(f"K={K:2d} rung boundaries:      {timed(h, x0)*1e3:7.1f} ms")
