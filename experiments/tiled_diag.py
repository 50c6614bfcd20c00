"""Diagnose the tile-binned traversal on the dragon bench scene:
candidate-count distributions, certification rates, and isolated timings
for the tiled core vs the old short-stack traversal."""

import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import rpt_tpu as rpt
from rpt_tpu.dtypes import DTYPE, INF
from rpt_tpu.intersect import Hit, _traverse
from rpt_tpu.ray import Ray
from rpt_tpu.renderer import _pixel_grid
from rpt_tpu.tiled import TILE, _cull_keys, KEY_MAX, tiled_traverse

sys.path.insert(0, "/root/repo")
import bench


def main():
    scene = bench.build_scene().compile()
    camera = rpt.Camera.look_at(
        (-2.5, 4.0, 6.5), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0), math.pi / 6
    )
    W = H = 512
    xn_np, yn_np, _, _ = _pixel_grid(W, H)
    xn = jnp.asarray(xn_np, DTYPE)
    yn = jnp.asarray(yn_np, DTYPE)
    key = jax.random.key(0)
    ray = camera.cast_ray(xn, yn, key)
    n = W * H

    ct = scene.tables["clusters"]
    bvh = scene.tables["bvh"]
    print(f"clusters: {ct.n_clusters} (padded {ct.sph.shape[0]}), "
          f"fat {ct.fat.shape}, nodes {bvh.nodes.shape[0]}")

    # ---- candidate stats from the culling keys --------------------------
    @jax.jit
    def stats(ct_sph, ox, oy, oz, dx, dy, dz):
        o = jnp.stack([ox, oy, oz], 1).reshape(n // TILE, TILE, 3)
        d = jnp.stack([dx, dy, dz], 1).reshape(n // TILE, TILE, 3)
        o_lo, o_hi = o.min(1), o.max(1)
        o_c = 0.5 * (o_lo + o_hi)
        o_r = 0.5 * jnp.sqrt(((o_hi - o_lo) ** 2).sum(-1))
        ds = d.sum(1)
        axis = ds / jnp.maximum(jnp.sqrt((ds**2).sum(-1, keepdims=True)), 1e-20)
        cos_t = jnp.clip((d * axis[:, None, :]).sum(-1).min(1) - 1e-6, -1.0, 1.0)
        keys, t0, tsc = _cull_keys(
            ct_sph, o_c, o_r, axis, cos_t, 1e-4,
            jnp.full((n // TILE,), INF), 17, 14,
        )
        return (keys != KEY_MAX).sum(axis=1)

    cand = np.asarray(stats(ct.sph, ray.origin.x, ray.origin.y, ray.origin.z,
                            ray.dir.x, ray.dir.y, ray.dir.z))
    print(f"primary-ray tiles: candidates/tile mean {cand.mean():.1f} "
          f"p50 {np.percentile(cand,50):.0f} p90 {np.percentile(cand,90):.0f} "
          f"p99 {np.percentile(cand,99):.0f} max {cand.max()}")

    # ---- isolated timings ----------------------------------------------
    best = jnp.full((n,), INF, DTYPE)

    run_tiled = jax.jit(lambda ct, ray, best: tiled_traverse(
        ct, ray, 1e-4, INF, best, any_hit=False))
    out = run_tiled(ct, ray, best)
    np.asarray(out[0])
    t0 = time.perf_counter()
    out = run_tiled(ct, ray, best)
    certified = np.asarray(out[5])
    dt_tiled = time.perf_counter() - t0
    print(f"tiled core: {dt_tiled*1e3:.1f} ms for {n} rays "
          f"({n/dt_tiled/1e6:.1f} Mrays/s), certified {certified.mean()*100:.2f}%")
    hits = np.isfinite(np.asarray(out[0]))
    print(f"hit rate {hits.mean()*100:.1f}%")

    run_old = jax.jit(lambda bvh, ray, best: _traverse(
        bvh, ray, 1e-4, jnp.full((n,), INF, DTYPE), best, any_hit=False))
    out2 = run_old(bvh, ray, best)
    np.asarray(out2[0])
    t0 = time.perf_counter()
    out2 = run_old(bvh, ray, best)
    t_old = np.asarray(out2[0])
    dt_old = time.perf_counter() - t0
    print(f"old traversal: {dt_old*1e3:.1f} ms ({n/dt_old/1e6:.1f} Mrays/s)")

    t_new = np.asarray(out[0])
    match = (np.isfinite(t_old) == np.isfinite(t_new))
    both = np.isfinite(t_old) & np.isfinite(t_new)
    close = np.allclose(t_old[both], t_new[both], rtol=1e-4, atol=1e-4)
    print(f"agreement (certified lanes should match): mask {match.mean()*100:.2f}%, "
          f"times close: {close} "
          f"(uncertified {100*(1-certified.mean()):.2f}% may differ)")


if __name__ == "__main__":
    main()
