"""Measure the compacted-phase state-swap cost hypothesis: gathering N
separate narrow arrays (the deferred traversal's pytree state) vs ONE
packed (n, C) i32 row, at the real wavefront/batch sizes.

If separate-array swaps cost ~count x rows x 12 ns, they dominate the
320 ms incoherent wavefront and packing the state is the next 2-4x.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

N = 262144
W = 16384
DEPTH = 16
CANDS = 6
REPS = 200  # phases per dispatch (loop in-device, host sync once)


def sync(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).reshape(-1)[0])


def timed(fn, *args, reps=3):
    sync(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    key = jax.random.key(0)
    # separate-array state as deferred.py holds it today (+ ray fields the
    # outer_body gathers via gather_sub)
    state_sep = dict(
        cur=jnp.arange(N, dtype=jnp.int32),
        sp=jnp.zeros(N, jnp.int32),
        stack=jnp.zeros((N, DEPTH), jnp.int32),
        best_u=jnp.ones(N, jnp.float32),
        pack=jnp.zeros(N, jnp.int32),
        cand_t=jnp.ones((N, CANDS), jnp.float32),
        cand_id=jnp.zeros((N, CANDS), jnp.int32),
        done=jnp.zeros(N, bool),
        ox=jnp.ones(N, jnp.float32), oy=jnp.ones(N, jnp.float32), oz=jnp.ones(N, jnp.float32),
        dx=jnp.ones(N, jnp.float32), dy=jnp.ones(N, jnp.float32), dz=jnp.ones(N, jnp.float32),
        ix=jnp.ones(N, jnp.float32), iy=jnp.ones(N, jnp.float32), iz=jnp.ones(N, jnp.float32),
        lim=jnp.ones(N, jnp.float32),
    )
    C = 1 + 1 + DEPTH + 1 + 1 + CANDS + CANDS + 1 + 10  # 37 -> pad 40
    packed = jnp.zeros((N, 40), jnp.int32)

    def work(sub_cur):
        # stand-in for per-phase useful work so XLA can't elide the swap
        return jnp.sum(sub_cur)

    @jax.jit
    def swap_sep(state):
        def body(c, _):
            state, acc = c
            order = jnp.argsort(state["done"])
            sel = order[:W]
            sub = {k: v[sel] for k, v in state.items()}
            acc = acc + work(sub["cur"])
            sub["cur"] = sub["cur"] + 1
            state = {k: v.at[sel].set(sub[k]) for k, v in state.items()}
            return (state, acc), None

        (state, acc), _ = jax.lax.scan(body, (state, jnp.int32(0)), None, length=REPS)
        return acc

    @jax.jit
    def swap_packed(p):
        def body(c, _):
            p, acc = c
            order = jnp.argsort(p[:, -1])
            sel = order[:W]
            sub = p[sel]
            acc = acc + work(sub[:, 0])
            sub = sub.at[:, 0].add(1)
            p = p.at[sel].set(sub)
            return (p, acc), None

        (p, acc), _ = jax.lax.scan(body, (p, jnp.int32(0)), None, length=REPS)
        return acc

    t = timed(swap_sep, state_sep)
    print(f"separate arrays: {t/REPS*1e3:6.2f} ms/phase")
    t = timed(swap_packed, packed)
    print(f"packed (n,40) i32: {t/REPS*1e3:6.2f} ms/phase")

    # unpack/repack cost on the packed batch: extract ~20 (W,) columns and
    # reinsert them (the shuffle tax the packed design pays instead)
    @jax.jit
    def swap_packed_unpack(p):
        def body(c, _):
            p, acc = c
            order = jnp.argsort(p[:, -1])
            sel = order[:W]
            sub = p[sel]
            cols = [sub[:, i] for i in range(20)]
            acc = acc + work(cols[0])
            cols = [c + 1 for c in cols]
            sub = jnp.concatenate(
                [jnp.stack(cols, axis=1), sub[:, 20:]], axis=1
            )
            p = p.at[sel].set(sub)
            return (p, acc), None

        (p, acc), _ = jax.lax.scan(body, (p, jnp.int32(0)), None, length=REPS)
        return acc

    t = timed(swap_packed_unpack, packed)
    print(f"packed + 20-col unpack/repack: {t/REPS*1e3:6.2f} ms/phase")


if __name__ == "__main__":
    main()
