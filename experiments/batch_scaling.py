"""Does batching K samples' bounce wavefronts into one deferred traversal
cut per-lane cost? (PERF.md round-3 lever: cross-sample batching.)

Builds REAL L1 bounce wavefronts for K different sample indices (distinct
RNG folds -> distinct jitter/bounce dirs), concatenates them, and times
deferred_traverse closest-hit and any-hit at each K. Also sweeps
BATCH_DIV at the widest K (the optimal batch width may be absolute, not
a fraction of n).
"""

import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import rpt_tpu as rpt
from rpt_tpu import sampling
from rpt_tpu.dtypes import DTYPE, INF
from rpt_tpu.integrators.path import _dead_ray_fields, _sanitize
from rpt_tpu.intersect import closest_hit
from rpt_tpu.materials import sample_f
from rpt_tpu.ray import Ray
from rpt_tpu.renderer import _pixel_grid
from rpt_tpu.vec import Vec3, where as vwhere
import rpt_tpu.deferred as deferred_mod
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


def get_l1(scene, tables, sample_index: int):
    camera = rpt.Camera.look_at((-2.5, 4.0, 6.5), (0, 0, 0), (0, 1, 0), math.pi / 6)
    W = H = 512
    n = W * H
    dim = float(max(W, H))
    xn_np, yn_np, pixel_ids, _ = _pixel_grid(W, H)
    key = jax.random.key(0)
    pix_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
        jnp.asarray(pixel_ids, jnp.int32)
    )

    @jax.jit
    def derive(tables, s):
        keys = sampling.fold(pix_keys, s)
        jx = sampling.uniform(sampling.fold(keys, 1), -1.0 / dim, 1.0 / dim)
        jy = sampling.uniform(sampling.fold(keys, 2), -1.0 / dim, 1.0 / dim)
        ray0 = camera.cast_ray(
            jnp.asarray(xn_np, DTYPE) + jx, jnp.asarray(yn_np, DTYPE) + jy,
            sampling.fold(keys, 3),
        )
        hit = closest_hit(scene, tables, ray0)
        hitmask = hit.time < INF
        kb = sampling.fold(sampling.fold(keys, 4), jnp.asarray(0))
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

    o, d, ok = derive(tables, jnp.asarray(sample_index, jnp.int32))
    return np.asarray(o), np.asarray(d), np.asarray(ok)


def get_l0_rays(scene, tables, sample_index: int):
    """The level-0 camera rays matching get_l1's derivation (same jitter
    stream), as host (o, d) arrays."""
    camera = rpt.Camera.look_at((-2.5, 4.0, 6.5), (0, 0, 0), (0, 1, 0), math.pi / 6)
    W = H = 512
    n = W * H
    dim = float(max(W, H))
    xn_np, yn_np, pixel_ids, _ = _pixel_grid(W, H)
    key = jax.random.key(0)
    pix_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
        jnp.asarray(pixel_ids, jnp.int32)
    )
    keys = sampling.fold(pix_keys, jnp.asarray(sample_index, jnp.int32))
    jx = sampling.uniform(sampling.fold(keys, 1), -1.0 / dim, 1.0 / dim)
    jy = sampling.uniform(sampling.fold(keys, 2), -1.0 / dim, 1.0 / dim)
    ray0 = camera.cast_ray(
        jnp.asarray(xn_np, DTYPE) + jx, jnp.asarray(yn_np, DTYPE) + jy,
        sampling.fold(keys, 3),
    )
    return np.asarray(ray0.origin.to_array()), np.asarray(ray0.dir.to_array())


def main():
    scene = bench.build_scene().compile()
    tables = scene.tables
    parts = [get_l1(scene, tables, s) for s in range(8)]
    print("wavefronts derived", flush=True)

    def make_ray(k):
        o = np.concatenate([p[0] for p in parts[:k]], axis=0)
        d = np.concatenate([p[1] for p in parts[:k]], axis=0)
        return Ray(
            Vec3(jnp.asarray(o[:, 0]), jnp.asarray(o[:, 1]), jnp.asarray(o[:, 2])),
            Vec3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2])),
        ), o.shape[0]

    for any_hit in (False, True):
        label = "any-hit " if any_hit else "closest"
        for k in (1, 2, 4, 8):
            ray, n = make_ray(k)

            @jax.jit
            def f(tables, ray, n=n):
                t, tri, u, v, w = deferred_mod.deferred_traverse(
                    tables["clusters"], ray, scene.t_min,
                    jnp.full(n, 3.0, DTYPE) if any_hit else INF,
                    jnp.full(n, INF, DTYPE), any_hit=any_hit,
                )
                return t

            t = timed(f, tables, ray)
            print(
                f"{label} K={k}: {t*1e3:7.1f} ms total, "
                f"{t*1e3/k:6.1f} ms/sample", flush=True,
            )

    # BATCH_DIV sweep at K=8
    ray, n = make_ray(8)
    for B in (8, 16, 32, 64, 128):
        deferred_mod.BATCH_DIV = B

        @jax.jit
        def f(tables, ray, n=n):
            t, tri, u, v, w = deferred_mod.deferred_traverse(
                tables["clusters"], ray, scene.t_min, INF,
                jnp.full(n, INF, DTYPE), any_hit=False,
            )
            return t

        t = timed(f, tables, ray)
        print(f"closest K=8 BATCH_DIV={B:3d} (W={max(4096, n // B)}): "
              f"{t*1e3:7.1f} ms, {t*1e3/8:6.1f} ms/sample", flush=True)


if __name__ == "__main__":
    main()
