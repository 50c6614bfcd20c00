"""Break the tiled traversal cost into phases on the dragon wavefront:
  1. culling + key build alone
  2. round loop with the tri test stubbed out (loop + reduce overhead)
  3. N tri-test rounds alone (no loop logic)
"""

import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import rpt_tpu as rpt
from rpt_tpu.dtypes import DTYPE, INF
from rpt_tpu.renderer import _pixel_grid
from rpt_tpu import tiled
from rpt_tpu.tiled import TILE, KEY_MAX, _cull_keys, _tile_tri_test
import bench


def timed(fn, *args, reps=3):
    np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / reps


def main():
    scene = bench.build_scene().compile()
    camera = rpt.Camera.look_at((-2.5, 4.0, 6.5), (0, 0, 0), (0, 1, 0), math.pi / 6)
    W = H = 512
    xn_np, yn_np, _, _ = _pixel_grid(W, H)
    ray = camera.cast_ray(jnp.asarray(xn_np, DTYPE), jnp.asarray(yn_np, DTYPE),
                          jax.random.key(0))
    n = W * H
    T = n // TILE
    ct = scene.tables["clusters"]
    c_pad = ct.sph.shape[0]
    idbits = max(1, math.ceil(math.log2(c_pad)))
    qbits = 31 - idbits

    def tile_geom(ox, oy, oz, dx, dy, dz):
        o = jnp.stack([ox, oy, oz], 1).reshape(T, TILE, 3)
        d = jnp.stack([dx, dy, dz], 1).reshape(T, TILE, 3)
        o_lo, o_hi = o.min(1), o.max(1)
        o_c = 0.5 * (o_lo + o_hi)
        o_r = 0.5 * jnp.sqrt(((o_hi - o_lo) ** 2).sum(-1))
        ds = d.sum(1)
        axis = ds / jnp.maximum(jnp.sqrt((ds**2).sum(-1, keepdims=True)), 1e-20)
        cos_t = jnp.clip((d * axis[:, None, :]).sum(-1).min(1) - 1e-6, -1.0, 1.0)
        return o_c, o_r, axis, cos_t

    rx = (ray.origin.x, ray.origin.y, ray.origin.z, ray.dir.x, ray.dir.y, ray.dir.z)

    @jax.jit
    def phase_cull(sph, *rx):
        o_c, o_r, axis, cos_t = tile_geom(*rx)
        keys, t0, tsc = _cull_keys(sph, o_c, o_r, axis, cos_t, 1e-4,
                                   jnp.full((T,), INF), qbits, idbits)
        return keys.sum()

    print(f"cull+keys: {timed(phase_cull, ct.sph, *rx)*1e3:.1f} ms")

    keys_fn = jax.jit(lambda sph, *rx: _cull_keys(
        sph, *tile_geom(*rx), 1e-4, jnp.full((T,), INF), qbits, idbits))
    keys, t0s, tsc = keys_fn(ct.sph, *rx)

    R = 24

    @jax.jit
    def phase_minloop(keys):
        def body(c):
            thresh, acc, i = c
            masked = jnp.where(keys > thresh[:, None], keys, KEY_MAX)
            key_next = masked.min(axis=1)
            return key_next, acc + key_next.sum(), i + 1

        thresh = jnp.full((T,), -1, jnp.int32)
        _, acc, _ = jax.lax.while_loop(lambda c: c[2] < R, body,
                                       (thresh, jnp.int64(0) if False else jnp.int32(0), jnp.int32(0)))
        return acc

    dt = timed(phase_minloop, keys)
    print(f"{R}x masked-min over keys {keys.shape}: {dt*1e3:.1f} ms ({dt/R*1e3:.2f}/round)")

    o3 = jnp.stack(rx[:3], 1).reshape(T, TILE, 3)
    d3 = jnp.stack(rx[3:], 1).reshape(T, TILE, 3)
    from rpt_tpu.vec import Vec3
    ov = Vec3(o3[:, :, 0], o3[:, :, 1], o3[:, :, 2])
    dv = Vec3(d3[:, :, 0], d3[:, :, 1], d3[:, :, 2])

    @jax.jit
    def phase_tritest(fat, cid0):
        z = jnp.zeros((T, TILE), DTYPE)
        state = (jnp.full((T, TILE), INF, DTYPE), jnp.full((T, TILE), -1, jnp.int32),
                 z, z, z)

        def body(c):
            best, tri, bu, bv, bw, i = c
            rows = jnp.take(fat, (cid0 + i) % ct.n_clusters, axis=0)
            best, tri, bu, bv, bw = _tile_tri_test(
                rows, ov, dv, 1e-4, jnp.full((T, TILE), INF, DTYPE),
                best, tri, bu, bv, bw, jnp.ones((T, TILE), bool))
            return best, tri, bu, bv, bw, i + 1

        out = jax.lax.while_loop(lambda c: c[5] < R, body, state + (jnp.int32(0),))
        return out[0].sum()

    cid0 = jnp.arange(T, dtype=jnp.int32) % ct.n_clusters
    dt = timed(phase_tritest, ct.fat, cid0)
    print(f"{R}x full-width tri-test rounds: {dt*1e3:.1f} ms ({dt/R*1e3:.2f}/round)")


if __name__ == "__main__":
    main()
