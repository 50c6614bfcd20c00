"""Ceiling measurement for ORIGIN-CLUSTER SEEDING: bounce/shadow rays
start ON the mesh; if their closest hit / occluder frequently lies in the
32-tri fat cluster CONTAINING the origin triangle, one up-front fat-row
test could (a) retire occluded shadow lanes before any descent and
(b) seed best_u to prune closest-hit descent.

Statistics only (no timing) — runs on CPU with a lane subset.

    python experiments/origin_cluster.py
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import bench
from rpt_tpu import sampling
from rpt_tpu.deferred import deferred_traverse
from rpt_tpu.dtypes import DTYPE, INF
from rpt_tpu.ray import Ray
from rpt_tpu.vec import Vec3

SUB = 8192  # lanes measured


def main():
    scene = bench.build_scene().compile()
    tables = scene.tables
    ct = tables["clusters"]

    # map triangle id -> cluster row (from the recovery table)
    rec = np.asarray(ct.rec)  # (C, R) packed recovery rows; last block = tri ids
    # rec layout: component-major like fat rows; tri ids live in a slot
    # block — recover via the public helper instead of layout guessing:
    # build a tri->cluster map by scattering each cluster's tri ids.
    from rpt_tpu.accel.clusters import CLUSTER_TRIS

    # rec is (C*K, 12): one row per (cluster, slot); col 9 = tri id
    K = CLUSTER_TRIS
    ids = rec[:, 9].astype(np.int64)
    n_tris = int(ids.max()) + 1
    tri2cluster = np.full(n_tris + 1, -1, np.int64)
    valid = ids >= 0
    tri2cluster[ids[valid]] = np.arange(len(ids))[valid] // K

    # L1 bounce wavefront from the bench scene (first SUB lanes)
    from batch_scaling import get_l1

    o, d, ok = get_l1(scene, tables, 0)
    sel = np.random.default_rng(0).permutation(np.flatnonzero(ok))[:SUB]
    ray = Ray(
        Vec3(*(jnp.asarray(o[sel, i]) for i in range(3))),
        Vec3(*(jnp.asarray(d[sel, i]) for i in range(3))),
    )
    n = len(sel)

    # which tri does each L1 ray hit? (closest via deferred)
    t1, tri1, *_ = deferred_traverse(
        ct, ray, scene.t_min, INF, jnp.full(n, INF, DTYPE), any_hit=False
    )
    tri1 = np.asarray(tri1)
    hit1 = np.isfinite(np.asarray(t1)) & (tri1 >= 0)

    # origin tri: re-cast the matching L0 camera rays (same jitter
    # stream as get_l1) on the measured subset and take the hit tri
    from batch_scaling import get_l0_rays

    o0, d0 = get_l0_rays(scene, tables, 0)
    ray0 = Ray(
        Vec3(*(jnp.asarray(o0[sel, i]) for i in range(3))),
        Vec3(*(jnp.asarray(d0[sel, i]) for i in range(3))),
    )
    t0, tri0a, *_ = deferred_traverse(
        ct, ray0, scene.t_min, INF, jnp.full(n, INF, DTYPE), any_hit=False
    )
    tri0 = np.where(np.isfinite(np.asarray(t0)), np.asarray(tri0a), -1)
    oc = tri2cluster[np.clip(tri0, 0, n_tris)]
    hc = tri2cluster[np.clip(tri1, 0, n_tris)]
    both = hit1 & (tri0 >= 0)
    same = (oc == hc) & both
    print(f"L1 closest hit in ORIGIN cluster: {same.sum()}/{both.sum()} "
          f"= {same.sum()/max(both.sum(),1):.3f}")

    # shadow rays from the same origins toward light 1
    from rpt_tpu.lights import illuminate
    lstat, ltab = next(
        (ls, lt) for ls, lt in zip(scene.lights, tables["lights"])
        if ls.kind != "ambient"
    )
    key = jax.random.key(0)
    keys = sampling.keys_for(key, n)
    pos = ray.origin
    _, wi, dist = illuminate(lstat, ltab, pos, keys)
    limit = dist * (1.0 - scene.shadow_eps)
    ts, tris, *_ = deferred_traverse(
        ct, Ray(pos, wi), scene.t_min, limit, jnp.full(n, INF, DTYPE),
        any_hit=False,  # closest so we see WHICH tri occludes
    )
    ts = np.asarray(ts)
    occ = np.isfinite(ts) & (ts < np.asarray(limit))
    sc = tri2cluster[np.clip(np.asarray(tris), 0, n_tris)]
    samec = (sc == oc) & occ & (tri0 >= 0)
    print(f"L1 shadow occluded: {occ.mean():.3f}; occluder in ORIGIN "
          f"cluster: {samec.sum()}/{occ.sum()} = "
          f"{samec.sum()/max(occ.sum(),1):.3f}")


if __name__ == "__main__":
    main()
