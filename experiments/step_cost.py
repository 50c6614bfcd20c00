"""True per-step cost decomposition of the deferred traversal, via
synthetic steps with evolving random cursors (so XLA cannot collapse the
loop and the gather pattern stays random):

  a) gather-only: fetch one wide row per lane, consume with a weight
  b) full descent step: gather + slab test + one-hot stack/cand updates
  c) test round: node refetch + fat 2.5 KB gather + dense 64-tri test

Each timed as a lax.scan of K steps per dispatch at several widths."""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import jax
import jax.numpy as jnp
import numpy as np

from batch_scaling import get_l1
from rpt_tpu.deferred import _tree_wide, _wide_row_test
from rpt_tpu.tiled import _tile_tri_test
from rpt_tpu.dtypes import DTYPE, INF
from rpt_tpu.ray import Ray
from rpt_tpu.vec import Vec3
import bench

K = 64


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
    n_rows = ct.tree.shape[0]
    n_fat = ct.fat.shape[0]
    o, d, ok = get_l1(scene, tables, 0)

    for W in (16384, 65536):
        o_w, d_w = o[:W], d[:W]
        ray = Ray(
            Vec3(*(jnp.asarray(o_w[:, i]) for i in range(3))),
            Vec3(*(jnp.asarray(d_w[:, i]) for i in range(3))),
        )
        dn = ray.dir * (1.0 / ray.dir.length())
        inv_dir = Vec3.ones(dn.shape) / dn
        o3w = jnp.concatenate(
            [jnp.repeat(ray.origin.to_array()[:, i : i + 1], wide, axis=1) for i in range(3)],
            axis=1,
        )
        inv3w = jnp.concatenate(
            [jnp.repeat(inv_dir.to_array()[:, i : i + 1], wide, axis=1) for i in range(3)],
            axis=1,
        )
        o1 = Vec3(ray.origin.x[:, None], ray.origin.y[:, None], ray.origin.z[:, None])
        d1 = Vec3(dn.x[:, None], dn.y[:, None], dn.z[:, None])
        lanes = jnp.arange(W, dtype=jnp.uint32)
        live = jnp.ones(W, bool)
        t_min = scene.t_min

        def advance(seed):
            x = (seed * jnp.uint32(747796405) + jnp.uint32(2891336453) + lanes)
            x = (x ^ (x >> 16)) * jnp.uint32(2246822519)
            return x ^ (x >> 13)

        @jax.jit
        def gather_only(s0):
            def body(c, _):
                seed, acc = c
                r = advance(seed)
                idx = (r % jnp.uint32(n_rows)).astype(jnp.int32)
                row = jnp.take(ct.tree, idx, axis=0)
                acc = acc + jnp.sum(row[:, 0] * (1.0 + idx.astype(DTYPE) * 1e-9))
                return (r[0] + seed, acc), None

            (s, acc), _ = jax.lax.scan(body, (s0, jnp.zeros((), DTYPE)), None, length=K)
            return acc

        @jax.jit
        def descent_step(s0):
            depth = ct.tree_depth
            stack0 = jnp.zeros((W, depth), jnp.int32)
            cand_t0 = jnp.full((W, 6), INF, DTYPE)
            cand_id0 = jnp.zeros((W, 6), jnp.int32)
            depth_iota = jax.lax.broadcasted_iota(jnp.int32, (W, depth), 1)
            cslot_iota = jax.lax.broadcasted_iota(jnp.int32, (W, 6), 1)

            def body(c, _):
                seed, stack, sp, cand_t, cand_id, best, acc = c
                r = advance(seed)
                row_id = (r % jnp.uint32(n_rows)).astype(jnp.int32)
                mask = jnp.full(W, (1 << wide) - 1, jnp.int32)
                enter, ptr, meta, hit, slot = _wide_row_test(
                    ct.tree, row_id, mask, o3w, inv3w, t_min, best, live
                )
                n_cand = jnp.sum(cand_t < INF, axis=1)
                leaf_hit = hit & (meta > 0)
                any_leaf = jnp.any(leaf_hit, axis=1)
                g_t = jnp.maximum(jnp.min(jnp.where(leaf_hit, enter, INF), axis=1), t_min)
                g_bits = jnp.sum(jnp.where(leaf_hit, 1 << slot, 0), axis=1)
                at = (cslot_iota == (n_cand % 6)[:, None]) & any_leaf[:, None]
                cand_t = jnp.where(at, g_t[:, None], cand_t)
                cand_id = jnp.where(at, ((row_id << wide) | g_bits)[:, None], cand_id)
                int_hit = hit & (meta == 0)
                ei = jnp.where(int_hit, enter, INF)
                ni = jnp.argmin(ei, axis=1).astype(jnp.int32)
                has_int = jnp.any(int_hit, axis=1)
                rest = jnp.sum(jnp.where(int_hit, 1 << slot, 0), axis=1) & ~(
                    jnp.where(has_int, 1 << ni, 0)
                )
                at_sp = depth_iota == (sp % depth)[:, None]
                stack = jnp.where(at_sp & (rest != 0)[:, None],
                                  ((row_id << wide) | rest)[:, None], stack)
                sp = (sp + 1) % depth
                acc = acc + jnp.sum(jnp.where(has_int, 1, 0))
                return (r[0] + seed, stack, sp, cand_t, cand_id, best, acc), None

            init = (s0, stack0, jnp.zeros(W, jnp.int32), cand_t0, cand_id0,
                    jnp.full(W, INF, DTYPE), jnp.zeros((), jnp.int32))
            c, _ = jax.lax.scan(body, init, None, length=K)
            return c[-1]

        @jax.jit
        def test_round(s0):
            def body(c, _):
                seed, best, pack, acc = c
                r = advance(seed)
                row_id = (r % jnp.uint32(n_rows)).astype(jnp.int32)
                mask = jnp.full(W, (1 << wide) - 1, jnp.int32)
                enter, ptr, meta, hit, slot = _wide_row_test(
                    ct.tree, row_id, mask, o3w, inv3w, t_min, best, live
                )
                cid = (advance(r[0] + seed) % jnp.uint32(n_fat)).astype(jnp.int32)
                fat_rows = jnp.take(ct.fat, cid, axis=0)
                best1, pack1 = _tile_tri_test(
                    fat_rows, o1, d1, t_min,
                    jnp.full((W, 1), INF, DTYPE), best[:, None],
                    pack[:, None], cid, jnp.ones((W, 1), bool),
                )
                acc = acc + jnp.sum(best1[:, 0] * 0.0)
                return (r[0] + seed + 1, best, pack, acc), None

            init = (s0, jnp.full(W, INF, DTYPE), jnp.full(W, -1, jnp.int32),
                    jnp.zeros((), DTYPE))
            c, _ = jax.lax.scan(body, init, None, length=K)
            return c[-1]

        for name, fn in (("gather-only", gather_only), ("descent-step", descent_step),
                         ("test-round", test_round)):
            t = timed(fn, jnp.uint32(12345))
            print(f"W={W:6d} {name:13s}: {t/K*1e3:6.3f} ms/step "
                  f"({t/K/W*1e9:6.1f} ns/lane)", flush=True)


if __name__ == "__main__":
    main()
