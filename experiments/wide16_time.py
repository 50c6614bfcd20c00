"""Time the deferred traversal (current tree width) on the real L1
bounce wavefront, closest + any-hit."""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import jax
import jax.numpy as jnp
import numpy as np

from batch_scaling import get_l1, timed
from rpt_tpu.dtypes import DTYPE, INF
from rpt_tpu.ray import Ray
from rpt_tpu.vec import Vec3
import rpt_tpu.deferred as dmod
import bench


def main():
    scene = bench.build_scene().compile()
    tables = scene.tables
    print("tree rows:", tables["clusters"].tree.shape,
          "depth:", tables["clusters"].tree_depth, flush=True)
    o, d, ok = get_l1(scene, tables, 0)
    n = o.shape[0]
    ray = Ray(
        Vec3(jnp.asarray(o[:, 0]), jnp.asarray(o[:, 1]), jnp.asarray(o[:, 2])),
        Vec3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2])),
    )

    for any_hit in (False, True):

        @jax.jit
        def f(tables, ray, any_hit=any_hit):
            t, tri, u, v, w = dmod.deferred_traverse(
                tables["clusters"], ray, scene.t_min,
                jnp.full(n, 3.0, DTYPE) if any_hit else INF,
                jnp.full(n, INF, DTYPE), any_hit=any_hit,
            )
            return t

        t = timed(f, tables, ray)
        print(("any-hit" if any_hit else "closest"), f"{t*1e3:7.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
