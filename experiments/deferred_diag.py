"""Why is deferred-leaf ~= tree on the bounce wavefront?

1. Host numpy simulation of the cluster-tree traversal on real L1 bounce
   rays: per-ray node-visit and cluster-candidate counts (mean/median/p99
   /max) with immediate best-hit pruning — the arithmetic lower bound any
   scheduler can reach.
2. Device timings on the same wavefront: tri-tree _traverse vs
   deferred_traverse vs tiled_traverse alone.
"""

import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import rpt_tpu as rpt
from rpt_tpu import sampling
from rpt_tpu.dtypes import DTYPE, INF
from rpt_tpu.integrators.path import _dead_ray_fields, _sanitize
from rpt_tpu.intersect import _traverse, closest_hit
from rpt_tpu.materials import sample_f
from rpt_tpu.ray import Ray
from rpt_tpu.renderer import _pixel_grid
from rpt_tpu.vec import Vec3, where as vwhere
import bench


def sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    return float(np.asarray(leaves[0]).reshape(-1)[0])


def timed(fn, *args, reps=3):
    sync(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def get_l1_wavefront(scene, tables):
    camera = rpt.Camera.look_at((-2.5, 4.0, 6.5), (0, 0, 0), (0, 1, 0), math.pi / 6)
    W = H = 512
    n = W * H
    xn_np, yn_np, pixel_ids, _ = _pixel_grid(W, H)
    key = jax.random.key(0)
    pix_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
        jnp.asarray(pixel_ids, jnp.int32)
    )
    keys = sampling.fold(pix_keys, 0)
    ray0 = camera.cast_ray(
        jnp.asarray(xn_np, DTYPE), jnp.asarray(yn_np, DTYPE), sampling.fold(keys, 3)
    )

    @jax.jit
    def derive(tables):
        hit = closest_hit(scene, tables, ray0)
        hitmask = hit.time < INF
        kb = sampling.fold(keys, 0)
        mat = tables["materials"].lookup(hit.material)
        pos = _sanitize(ray0.at(hit.time), hitmask)
        wo = -ray0.dir.normalize()
        wi, pdf, valid = sample_f(mat, hit.normal, wo, sampling.fold(kb, 3))
        ok = hitmask & valid
        dead_pos, dead_dir = _dead_ray_fields(n)
        return (
            vwhere(ok, pos, dead_pos).to_array(),
            vwhere(ok, wi, dead_dir).to_array(),
            ok,
        )

    o, d, ok = derive(tables)
    return Ray(Vec3(o[:, 0], o[:, 1], o[:, 2]), Vec3(d[:, 0], d[:, 1], d[:, 2])), ok, n


def simulate(tree, fat, o, d, t_min, n_sub=16384, seed=0):
    """Lock-step numpy WIDE-tree traversal (8-ary rows, packed
    row<<8|mask cursor) with immediate candidate testing; returns per-ray
    (node_visits, candidates_tested)."""
    rng = np.random.default_rng(seed)
    sel = rng.choice(len(o), n_sub, replace=False)
    o = o[sel].astype(np.float64)
    d = d[sel].astype(np.float64)
    d /= np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-20)
    inv = 1.0 / np.where(np.abs(d) > 1e-20, d, 1e-20)

    depth = 64
    n = n_sub
    cur = np.full(n, 0xFF, np.int64)  # row 0, full mask
    sp = np.zeros(n, np.int64)
    stack = np.zeros((n, depth), np.int64)
    best = np.full(n, np.inf)
    visits = np.zeros(n, np.int64)
    cands = np.zeros(n, np.int64)

    f3 = fat.reshape(fat.shape[0], 10, -1).astype(np.float64)

    def test_cluster(lanes, cids):
        nonlocal best, cands
        cands[lanes] += 1
        v1 = f3[cids, 0:3].transpose(0, 2, 1)  # (m, 64, 3)
        e1 = f3[cids, 3:6].transpose(0, 2, 1)
        e2 = f3[cids, 6:9].transpose(0, 2, 1)
        oo = o[lanes][:, None, :]
        dd = d[lanes][:, None, :]
        pn = np.cross(e1, e2)
        pn /= np.maximum(np.linalg.norm(pn, axis=2, keepdims=True), 1e-30)
        cosine = (pn * dd).sum(2)
        t = (pn * (v1 - oo)).sum(2) / np.where(np.abs(cosine) < 1e-12, 1e-12, cosine)
        ok = (np.abs(cosine) >= 1e-8) & (t >= t_min) & (t < best[lanes][:, None])
        p = oo + dd * t[:, :, None]
        d2 = p - v1
        d00 = (e1 * e1).sum(2)
        d01 = (e1 * e2).sum(2)
        d11 = (e2 * e2).sum(2)
        d20 = (d2 * e1).sum(2)
        d21 = (d2 * e2).sum(2)
        den = d00 * d11 - d01 * d01
        den = np.where(np.abs(den) < 1e-30, 1e-30, den)
        v = (d11 * d20 - d01 * d21) / den
        w = (d00 * d21 - d01 * d20) / den
        ok &= (v >= 0) & (w >= 0) & (1.0 - v - w >= 0)
        tt = np.where(ok, t, np.inf).min(1)
        best[lanes] = np.minimum(best[lanes], tt)

    steps = 0
    while (cur >= 0).any():
        steps += 1
        if steps > 100000:
            raise RuntimeError("no convergence")
        act = np.nonzero(cur >= 0)[0]
        visits[act] += 1
        row = tree[cur[act] >> 8]
        mask = cur[act] & 0xFF
        o8 = np.repeat(o[act], 8, axis=1).reshape(len(act), 3, 8).reshape(len(act), 24)
        iv8 = np.repeat(inv[act], 8, axis=1).reshape(len(act), 3, 8).reshape(len(act), 24)
        t1 = (row[:, 0:24] - o8) * iv8
        t2 = (row[:, 24:48] - o8) * iv8
        lo = np.minimum(t1, t2)
        hi = np.maximum(t1, t2)
        enter = np.nan_to_num(lo, nan=-np.inf).reshape(-1, 3, 8).max(1)
        exit_ = np.nan_to_num(hi, nan=np.inf).reshape(-1, 3, 8).min(1)
        ptr = row[:, 48:56].astype(np.int64)
        meta = row[:, 56:64]
        in_mask = ((mask[:, None] >> np.arange(8)[None, :]) & 1) == 1
        hit = (
            (enter <= exit_) & (exit_ >= t_min)
            & (enter <= best[act][:, None]) & (meta >= 0) & in_mask
        )
        is_leaf = hit & (meta > 0)

        # immediate-test leaf children (near first)
        order = np.argsort(np.where(is_leaf, enter, np.inf), axis=1)
        rows = np.arange(len(act))
        for k in range(8):
            ch = order[:, k]
            sel_hit = is_leaf[rows, ch]
            if sel_hit.any():
                test_cluster(act[sel_hit], ptr[rows, ch][sel_hit])

        int_hit = hit & (meta == 0)
        ei = np.where(int_hit, enter, np.inf)
        ni = np.argmin(ei, axis=1)
        has_int = int_hit.any(1)
        nxt = ptr[rows, ni]
        rest = (int_hit * (1 << np.arange(8))[None, :]).sum(1)
        rest = np.where(has_int, rest & ~(1 << ni), rest)
        entry = (cur[act] >> 8 << 8) | rest
        do_push = has_int & (rest != 0)
        stack[act[do_push], sp[act[do_push]]] = entry[do_push]
        sp[act] += do_push
        newcur = np.where(has_int, (nxt << 8) | 0xFF, -1)
        popping = ~has_int & (sp[act] > 0)
        sp_idx = sp[act] - 1
        newcur[popping] = stack[act[popping], sp_idx[popping]]
        sp[act[popping]] -= 1
        cur[act] = newcur
    return visits, cands


def main():
    scene = bench.build_scene().compile()
    tables = scene.tables
    ct = tables["clusters"]
    ray, ok, n = get_l1_wavefront(scene, tables)
    print(f"L1 wavefront: {int(np.asarray(ok).sum())}/{n} live bounce lanes")

    # ---- numpy simulation -------------------------------------------
    o = np.stack([np.asarray(c) for c in (ray.origin.x, ray.origin.y, ray.origin.z)], 1)
    d = np.stack([np.asarray(c) for c in (ray.dir.x, ray.dir.y, ray.dir.z)], 1)
    live = np.asarray(ok)
    oL, dL = o[live], d[live]
    tree = np.asarray(ct.tree, np.float64)
    fat = np.asarray(ct.fat)
    visits, cands = simulate(tree, fat, oL, dL, scene.t_min, n_sub=16384)
    for name, x in (("node visits", visits), ("cands tested", cands)):
        print(
            f"{name}: mean {x.mean():.1f} med {np.median(x):.0f} "
            f"p99 {np.percentile(x, 99):.0f} max {x.max()}"
        )
    tot_phases = np.ceil(cands / 7.0)
    print(f"capacity-phase bound (7 cands/phase): mean {tot_phases.mean():.2f}")

    # ---- device timings ---------------------------------------------
    bvh = tables["bvh"]

    @jax.jit
    def f_tree(tables, ray):
        t, tri, u, v, w = _traverse(
            tables["bvh"], ray, scene.t_min, jnp.full(n, INF, DTYPE),
            jnp.full(n, INF, DTYPE), any_hit=False,
        )
        return t

    @jax.jit
    def f_def(tables, ray):
        from rpt_tpu.deferred import deferred_traverse

        t, tri, u, v, w = deferred_traverse(
            tables["clusters"], ray, scene.t_min, INF,
            jnp.full(n, INF, DTYPE), any_hit=False,
        )
        return t

    @jax.jit
    def f_tiled(tables, ray):
        from rpt_tpu.tiled import tiled_traverse

        t, tri, u, v, w, cert = tiled_traverse(
            tables["clusters"], ray, scene.t_min, INF,
            jnp.full(n, INF, DTYPE), any_hit=False,
        )
        return t, jnp.sum(cert)

    t = timed(f_tree, tables, ray)
    print(f"tri-tree _traverse:   {t*1e3:7.1f} ms")
    t = timed(f_def, tables, ray)
    print(f"deferred_traverse:    {t*1e3:7.1f} ms")
    try:
        t = timed(f_tiled, tables, ray)
        _, cert = f_tiled(tables, ray)
        print(f"tiled_traverse:       {t*1e3:7.1f} ms (cert {int(cert)}/{n})")
    except Exception as e:
        print(f"tiled_traverse crashed: {type(e).__name__}")

    # agreement check tree vs deferred on this wavefront
    tt = np.asarray(f_tree(tables, ray))
    td = np.asarray(f_def(tables, ray))
    both = np.isfinite(tt) & np.isfinite(td)
    agree = (np.isfinite(tt) == np.isfinite(td)).mean()
    close = (np.abs(tt[both] - td[both]) <= 1e-5 + 1e-5 * tt[both]).mean()
    print(f"tree vs deferred: mask agree {agree:.5f}, t close {close:.5f}")


if __name__ == "__main__":
    main()
