"""Bisect the ~70 ms zero-active deferred_traverse cost: build the
program up in pieces and time each increment on the real chip.

    python experiments/zero_bisect.py
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
from rpt_tpu.deferred import (
    CAND_SLOTS, _descend_mask, _make_descent_step, _make_prune,
    _make_test_round, _pack_blocks, _pending_mask, _run_ladder, _tree_wide,
    _unpack_blocks,
)
from rpt_tpu.dtypes import DTYPE, INF
from rpt_tpu.ray import Ray
from rpt_tpu.tiled import _recover_hit
from rpt_tpu.vec import Vec3
import bench


def sync(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).reshape(-1)[0])


def timed(fn, *args, reps=5):
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
    o, d, ok = get_l1(scene, tables, 0)
    n = len(o)
    ray = Ray(
        Vec3(jnp.asarray(o[:, 0]), jnp.asarray(o[:, 1]), jnp.asarray(o[:, 2])),
        Vec3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2])),
    )
    best_time = jnp.full((n,), INF, DTYPE)
    active0 = jnp.zeros(n, bool)
    t_min = scene.t_min
    limit = INF

    def prologue(ct, active):
        dlen = ray.dir.length()
        safe = dlen > 0.0
        unit = jnp.abs(dlen - 1.0) < 1e-6
        inv = jnp.where(unit, 1.0, 1.0 / jnp.where(safe, dlen, 1.0))
        dn = ray.dir * inv
        dlen2 = jnp.where(unit, 1.0, dlen)
        scale = jnp.where(safe, dlen2, 1.0)
        best_u0 = jnp.broadcast_to(best_time, (n,)) * scale
        limit_u = jnp.broadcast_to(limit, (n,)).astype(DTYPE) * scale
        act = active & safe & (limit_u > t_min)
        uray = Ray(ray.origin, dn)
        inv_dir = Vec3.ones(dn.shape) / dn
        depth = ct.tree_depth
        state = (
            jnp.where(act, (1 << _tree_wide(ct.tree)) - 1, -1).astype(jnp.int32),
            jnp.zeros(n, jnp.int32),
            jnp.zeros((n, depth), jnp.int32),
            best_u0,
            jnp.full(n, -1, jnp.int32),
            jnp.full((n, CAND_SLOTS), INF, DTYPE),
            jnp.zeros((n, CAND_SLOTS), jnp.int32),
            ~act,
        )
        return state, uray, inv_dir, limit_u, dn, safe, dlen2, depth

    @jax.jit
    def p0(tables):
        ct = tables["clusters"]
        state, *_ = prologue(ct, active0)
        return state[3]

    print(f"prologue+init only:        {timed(p0, tables)*1e3:7.1f} ms")

    @jax.jit
    def p1(tables):
        ct = tables["clusters"]
        state, uray, inv_dir, limit_u, dn, safe, dlen2, depth = prologue(ct, active0)

        def make_descender(sray, sinv, slim):
            return _make_descent_step(ct.tree, sray, sinv, t_min, slim)

        state = _run_ladder(
            state, uray, inv_dir, limit_u,
            lambda s, lim: _descend_mask(s), make_descender,
        )
        return state[3]

    print(f"+ Phase A ladder:          {timed(p1, tables)*1e3:7.1f} ms")

    @jax.jit
    def p2(tables):
        ct = tables["clusters"]
        state, uray, inv_dir, limit_u, dn, safe, dlen2, depth = prologue(ct, active0)

        def make_drainer(sray, sinv, slim):
            return _make_test_round(ct, sray, sray.dir, sinv, t_min, slim, False)

        state = _run_ladder(
            state, uray, inv_dir, limit_u,
            lambda s, lim: _pending_mask(s, lim, False), make_drainer,
        )
        return state[3]

    print(f"+ Phase B ladder (alone):  {timed(p2, tables)*1e3:7.1f} ms")

    @jax.jit
    def p3(tables):
        ct = tables["clusters"]
        state, uray, inv_dir, limit_u, dn, safe, dlen2, depth = prologue(ct, active0)
        fblk0, iblk0 = _pack_blocks(state, uray, inv_dir, limit_u)
        fblk0, iblk0 = jax.lax.while_loop(
            lambda b: jnp.any(b[1][:, 3] == 0),
            lambda b: b,
            (fblk0, iblk0),
        )
        st, _, _, _ = _unpack_blocks(fblk0, iblk0, depth)
        return st[3]

    print(f"+ cleanup loop (alone):    {timed(p3, tables)*1e3:7.1f} ms")

    @jax.jit
    def p4(tables):
        ct = tables["clusters"]
        state, uray, inv_dir, limit_u, dn, safe, dlen2, depth = prologue(ct, active0)
        best_u, pack = state[3], state[4]
        tri, u, v, w = _recover_hit(ct.rec, best_u, pack, ray.origin, dn, t_min)
        return u

    print(f"+ recover_hit (alone):     {timed(p4, tables)*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
