"""Isolate the deferred-traversal LADDER MACHINERY cost: run
deferred_traverse with active=all-False (zero work — every lane is done
at entry) and compare against a null dispatch. Whatever remains is
argsort/compaction-gather/scatter-back overhead paid by every call.

    python experiments/ladder_overhead.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import jax
import jax.numpy as jnp
import numpy as np

from batch_scaling import get_l1
from rpt_tpu.deferred import deferred_traverse
from rpt_tpu.dtypes import DTYPE, INF
from rpt_tpu.ray import Ray
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
    best0 = jnp.full((n,), INF, DTYPE)

    @jax.jit
    def f_null(tables):
        return tables["clusters"].tree[0, 0] * 1.0

    t = timed(f_null, tables)
    print(f"null dispatch:             {t*1e3:7.1f} ms")

    for frac, label in [(0.0, "0"), (1 / 256, "1/256"), (1 / 16, "1/16")]:
        k = int(n * frac)
        active = jnp.arange(n) < k

        @jax.jit
        def f(tables, active=active):
            return deferred_traverse(
                tables["clusters"], ray, scene.t_min, INF, best0,
                any_hit=False, active=active,
            )[0]

        t = timed(f, tables)
        print(f"deferred closest active={label:>6}: {t*1e3:7.1f} ms")

        @jax.jit
        def fa(tables, active=active):
            return deferred_traverse(
                tables["clusters"], ray, scene.t_min,
                jnp.full((n,), 3.0, DTYPE), best0,
                any_hit=True, active=active,
            )[0]

        t = timed(fa, tables)
        print(f"deferred any-hit active={label:>6}: {t*1e3:7.1f} ms")


if __name__ == "__main__":
    main()


def probe_min_stage():
    """Re-run the zero-active probe with the ladder collapsed to a single
    full-width stage (MIN_STAGE = n): isolates rung-boundary cost from
    everything else (while_loop fixed cost, prune/finish, cleanup)."""
    import rpt_tpu.deferred as D

    scene = bench.build_scene().compile()
    tables = scene.tables
    o, d, ok = get_l1(scene, tables, 0)
    n = len(o)
    ray = Ray(
        Vec3(jnp.asarray(o[:, 0]), jnp.asarray(o[:, 1]), jnp.asarray(o[:, 2])),
        Vec3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2])),
    )
    best0 = jnp.full((n,), INF, DTYPE)
    for ms, label in [(4096, "full ladder"), (65536, "2-rung"), (n, "1-stage")]:
        D.MIN_STAGE = ms
        active = jnp.zeros(n, bool)

        @jax.jit
        def f(tables, active=active, ms=ms):
            return deferred_traverse(
                tables["clusters"], ray, scene.t_min, INF, best0,
                any_hit=False, active=active,
            )[0]

        t = timed(f, tables)
        print(f"zero-active closest MIN_STAGE={label:>12}: {t*1e3:7.1f} ms")
        act = jnp.arange(n) < (n // 256)

        @jax.jit
        def g(tables, act=act, ms=ms):
            return deferred_traverse(
                tables["clusters"], ray, scene.t_min, INF, best0,
                any_hit=False, active=act,
            )[0]

        t = timed(g, tables)
        print(f"1/256-active closest MIN_STAGE={label:>9}: {t*1e3:7.1f} ms")
    D.MIN_STAGE = 4096


if __name__ == "__main__" and "--min-stage" in sys.argv:
    probe_min_stage()
    sys.exit(0)
