"""Time Phase A (descent ladder) vs Phase B (drain ladder) of the
two-phase deferred traversal separately, on the real L1 bounce
wavefront, plus per-stage sequential-iteration counts (host replay).
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import jax
import jax.numpy as jnp
import numpy as np

from batch_scaling import get_l1
import rpt_tpu.deferred as D
from rpt_tpu.dtypes import DTYPE, INF
from rpt_tpu.ray import Ray
from rpt_tpu.vec import Vec3
import bench


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
    o, d, ok = get_l1(scene, tables, 0)
    n = o.shape[0]
    ray = Ray(
        Vec3(jnp.asarray(o[:, 0]), jnp.asarray(o[:, 1]), jnp.asarray(o[:, 2])),
        Vec3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2])),
    )
    t_min = scene.t_min
    dnorm = ray.dir.length()
    dn = ray.dir / jnp.where(dnorm > 0, dnorm, 1.0)
    uray = Ray(ray.origin, dn)
    inv_dir = Vec3.ones(dn.shape) / dn
    limit_u = jnp.full((n,), INF, DTYPE)
    active = jnp.ones(n, bool)

    def init_state():
        return (
            jnp.where(active, (1 << D._tree_wide(ct.tree)) - 1, -1).astype(jnp.int32),
            jnp.zeros(n, jnp.int32),
            jnp.zeros((n, ct.tree_depth), jnp.int32),
            jnp.full((n,), INF, DTYPE),
            jnp.full(n, -1, jnp.int32),
            jnp.full((n, D.CAND_SLOTS), INF, DTYPE),
            jnp.zeros((n, D.CAND_SLOTS), jnp.int32),
            ~active,
        )

    @jax.jit
    def phase_a(_):
        state = init_state()

        def mk(sray, sinv, slim):
            return D._make_descent_step(ct.tree, sray, sinv, t_min, slim)

        state = D._run_ladder(
            state, uray, inv_dir, limit_u, lambda s, lim: D._descend_mask(s), mk
        )
        return state

    @jax.jit
    def phase_ab(_):
        state = phase_a.__wrapped__(0)

        def mk(sray, sinv, slim):
            return D._make_test_round(ct, sray, sray.dir, sinv, t_min, slim, False)

        state = D._run_ladder(
            state, uray, inv_dir, limit_u,
            lambda s, lim: D._pending_mask(s, lim, False), mk,
        )
        return state

    ta = timed(phase_a, 0)
    tab = timed(phase_ab, 0)
    print(f"Phase A (descent ladder): {ta*1e3:.1f} ms")
    print(f"Phase A+B:                {tab*1e3:.1f} ms  -> B ~= {(tab-ta)*1e3:.1f} ms")

    # occupancy after A
    st = phase_a(0)
    nc = np.asarray(jnp.sum(st[5] < INF, axis=1))
    curs = np.asarray(st[0])
    print(f"after A: stalled(cur>=0) {int((curs>=0).sum())}; cand occupancy "
          f"mean {nc.mean():.2f} p99 {np.percentile(nc,99):.0f} max {nc.max()}; "
          f"lanes with >=1 cand {(nc>0).sum()} / {n}")


if __name__ == "__main__":
    main()
