"""Instrument the deferred-traversal outer loop on the real L1 bounce
wavefront: phase count, pending-lane decay, active descent-step slots,
active test-round slots. Pinpoints where the 320 ms goes vs the ~60 ms
fetch floor."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

from batch_scaling import get_l1, sync, timed
from rpt_tpu.deferred import (
    CAND_SLOTS, FULL_MASK, _descent_burst, _test_burst,
)
import rpt_tpu.deferred as dmod
from rpt_tpu.dtypes import DTYPE, INF
from rpt_tpu.ray import Ray
from rpt_tpu.vec import Vec3
import bench


def main():
    scene = bench.build_scene().compile()
    tables = scene.tables
    o, d, ok = get_l1(scene, tables, 0)
    n = o.shape[0]
    ray = Ray(
        Vec3(jnp.asarray(o[:, 0]), jnp.asarray(o[:, 1]), jnp.asarray(o[:, 2])),
        Vec3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2])),
    )
    ct = tables["clusters"]
    t_min = scene.t_min

    dlen = ray.dir.length()
    safe = dlen > 0.0
    dn = ray.dir * jnp.where(safe, 1.0 / jnp.where(safe, dlen, 1.0), 1.0)
    limit_u = jnp.full(n, INF, DTYPE)
    best_u0 = jnp.full(n, INF, DTYPE)
    active = jnp.asarray(ok) & safe
    uray = Ray(ray.origin, dn)
    inv_dir = Vec3.ones(dn.shape) / dn
    depth = ct.tree_depth
    W = max(4096, n // dmod.BATCH_DIV)

    def init_state():
        return (
            jnp.where(active, FULL_MASK, -1).astype(jnp.int32),
            jnp.zeros(n, jnp.int32),
            jnp.zeros((n, depth), jnp.int32),
            best_u0,
            jnp.full(n, -1, jnp.int32),
            jnp.full((n, CAND_SLOTS), INF, DTYPE),
            jnp.zeros((n, CAND_SLOTS), jnp.int32),
            ~active,
        )

    def phase(state, uray, inv_dir, limit_u):
        state = _descent_burst(ct.tree, uray, inv_dir, t_min, limit_u, state,
                               dmod.DESCENT_STEPS)
        state = _test_burst(ct, uray, uray.dir, inv_dir, t_min, limit_u, state,
                            False)
        cur, sp, stack, best_u, pack, cand_t, cand_id, done = state
        done = done | ((cur < 0) & ~jnp.any(cand_t < INF, axis=1))
        return (cur, sp, stack, best_u, pack, cand_t, cand_id, done)

    def gather_sub(sel):
        sub_ray = Ray(
            Vec3(uray.origin.x[sel], uray.origin.y[sel], uray.origin.z[sel]),
            Vec3(dn.x[sel], dn.y[sel], dn.z[sel]),
        )
        sub_inv = Vec3(inv_dir.x[sel], inv_dir.y[sel], inv_dir.z[sel])
        return sub_ray, sub_inv, limit_u[sel]

    @jax.jit
    def run_stats(max_phases):
        state = init_state()

        def body(c):
            state, i, pend_hist, desc_hist, test_hist = c
            pending = ~state[7]
            order = jnp.argsort(state[7])
            sel = order[:W]
            sub_ray, sub_inv, sub_limit = gather_sub(sel)
            sub = tuple(a[sel] for a in state)
            # stats BEFORE the phase: how many selected lanes need descent
            # (cur >= 0, buffer not full) vs tests (any candidate)
            n_cand = jnp.sum(sub[5] < INF, axis=1)
            desc_need = (sub[0] >= 0) & (n_cand < CAND_SLOTS) & ~sub[7]
            test_need = (n_cand > 0) & ~sub[7]
            sub = phase(sub, sub_ray, sub_inv, sub_limit)
            state = tuple(a.at[sel].set(b) for a, b in zip(state, sub))
            pend_hist = pend_hist.at[i].set(jnp.sum(pending))
            desc_hist = desc_hist.at[i].set(jnp.sum(desc_need))
            test_hist = test_hist.at[i].set(jnp.sum(test_need))
            return state, i + 1, pend_hist, desc_hist, test_hist

        def cond(c):
            state, i = c[0], c[1]
            return jnp.any(~state[7]) & (i < max_phases)

        z = jnp.zeros(400, jnp.int32)
        state, i, ph, dh, th = jax.lax.while_loop(
            cond, body, (init_state(), jnp.int32(0), z, z, z)
        )
        return i, ph, dh, th, state[3]

    i, ph, dh, th, best = run_stats(jnp.int32(400))
    i = int(i)
    ph, dh, th = np.asarray(ph)[:i], np.asarray(dh)[:i], np.asarray(th)[:i]
    print(f"phases: {i}, W={W}")
    print(f"pending at phase 0,1,2,4,8,16,32,...: "
          f"{[int(ph[min(j, i-1)]) for j in [0,1,2,4,8,16,32,64,128,256] if j < i]}")
    print(f"selected needing descent (mean/med): {dh.mean():.0f}/{np.median(dh):.0f}")
    print(f"selected needing tests   (mean/med): {th.mean():.0f}/{np.median(th):.0f}")
    print(f"slot util: descent-need fraction {dh.sum()/ (i*W):.2f}, "
          f"test-need fraction {th.sum()/(i*W):.2f}")

    # per-phase wall time: slope of time vs phase cap
    for cap in (4, 8, 16, 32):
        t = timed(lambda c: run_stats(c)[4], jnp.int32(cap))
        print(f"  capped {cap:3d} phases: {t*1e3:7.1f} ms  ({t/cap*1e3:5.2f} ms/phase)")
    t = timed(lambda c: run_stats(c)[4], jnp.int32(400))
    print(f"  full run: {t*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
