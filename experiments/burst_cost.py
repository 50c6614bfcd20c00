"""Directly time ONE descent burst and ONE test burst at several batch
widths on real L1 bounce lanes, isolating where the ~330 ms goes.
In-device scan of REPS bursts per dispatch; decomposes per-phase cost
into descent / test / (implicit) overhead."""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import jax
import jax.numpy as jnp
import numpy as np

from batch_scaling import get_l1
from rpt_tpu.deferred import (
    CAND_SLOTS, _descent_burst, _test_burst, _tree_wide,
)
import rpt_tpu.deferred as dmod
from rpt_tpu.dtypes import DTYPE, INF
from rpt_tpu.ray import Ray
from rpt_tpu.vec import Vec3
import bench

REPS = 20


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
    scene = bench.build_scene().compile()
    tables = scene.tables
    ct = tables["clusters"]
    wide = _tree_wide(ct.tree)
    o, d, ok = get_l1(scene, tables, 0)

    for W in (16384, 65536):
        o_w, d_w = o[:W], d[:W]
        ray = Ray(
            Vec3(*(jnp.asarray(o_w[:, i]) for i in range(3))),
            Vec3(*(jnp.asarray(d_w[:, i]) for i in range(3))),
        )
        n = W
        dlen = ray.dir.length()
        dn = ray.dir * jnp.where(dlen > 0, 1.0 / jnp.maximum(dlen, 1e-20), 1.0)
        uray = Ray(ray.origin, dn)
        inv_dir = Vec3.ones(dn.shape) / dn
        limit_u = jnp.full(n, INF, DTYPE)
        depth = ct.tree_depth

        def init_state():
            return (
                jnp.full(n, (1 << wide) - 1, jnp.int32),
                jnp.zeros(n, jnp.int32),
                jnp.zeros((n, depth), jnp.int32),
                jnp.full(n, INF, DTYPE),
                jnp.full(n, -1, jnp.int32),
                jnp.full((n, CAND_SLOTS), INF, DTYPE),
                jnp.zeros((n, CAND_SLOTS), jnp.int32),
                jnp.zeros(n, bool),
            )

        @jax.jit
        def desc_only(steps):
            def body(state, _):
                # reset cur so every rep does full-length descent
                state = (init_state()[0],) + state[1:]
                state = _descent_burst(
                    ct.tree, uray, inv_dir, scene.t_min, limit_u, state, steps
                )
                return state, None

            state, _ = jax.lax.scan(body, init_state(), None, length=REPS)
            return state[3]

        @jax.jit
        def test_only(rounds):
            dmodT = rounds

            def body(state, _):
                s0 = init_state()
                # seed every lane with one candidate group at the root
                cand_t = s0[5].at[:, 0].set(scene.t_min)
                cand_id = s0[6].at[:, 0].set((1 << wide) - 1)
                state = (
                    jnp.full(n, -1, jnp.int32), s0[1], s0[2], state[3], s0[4],
                    cand_t, cand_id, s0[7],
                )
                old_T = dmod.TEST_ROUNDS
                state = _test_burst(
                    ct, uray, dn, inv_dir, scene.t_min, limit_u, state, False
                )
                return state, None

            state, _ = jax.lax.scan(body, init_state(), None, length=REPS)
            return state[3]

        t12 = timed(desc_only, 12)
        t1 = timed(desc_only, 1)
        print(f"W={W}: descent burst D=12: {t12/REPS*1e3:6.2f} ms "
              f"(D=1: {t1/REPS*1e3:6.2f} ms, per-step "
              f"{(t12-t1)/11/REPS*1e3:5.2f} ms)", flush=True)
        t = timed(test_only, dmod.TEST_ROUNDS)
        print(f"W={W}: test burst T={dmod.TEST_ROUNDS}: {t/REPS*1e3:6.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
