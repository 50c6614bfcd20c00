"""Capture an xprof trace of ONE warmed bench sample-launch and print the
top self-time ops — real in-launch attribution, free of the ~30 ms
dispatch noise that skewed the piecemeal experiments.

    python experiments/xprof_launch.py [trace_dir]
"""

import glob
import math
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import jax
import jax.numpy as jnp
import numpy as np

import rpt_tpu as rpt
from rpt_tpu import sampling
from rpt_tpu.dtypes import DTYPE
from rpt_tpu.integrators.path import trace_surface
from rpt_tpu.renderer import _pixel_grid
import bench


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xprof_launch"
    scene = bench.build_scene().compile()
    tables = scene.tables
    camera = rpt.Camera.look_at((-2.5, 4.0, 6.5), (0, 0, 0), (0, 1, 0),
                                math.pi / 6)
    W = H = 512
    n = W * H
    xn_np, yn_np, pixel_ids, _ = _pixel_grid(W, H)
    key = jax.random.key(0)
    pix_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
        jnp.asarray(pixel_ids, jnp.int32)
    )
    keys = sampling.fold(pix_keys, 0)
    ray = camera.cast_ray(
        jnp.asarray(xn_np, DTYPE), jnp.asarray(yn_np, DTYPE),
        sampling.fold(keys, 3),
    )

    @jax.jit
    def one_sample(tables):
        return trace_surface(scene, tables, ray, sampling.fold(keys, 4), 2)

    out = one_sample(tables)
    out.x.block_until_ready()
    t0 = time.perf_counter()
    out = one_sample(tables)
    out.x.block_until_ready()
    print(f"warm sample wall: {(time.perf_counter()-t0)*1e3:.1f} ms")

    with jax.profiler.trace(trace_dir):
        out = one_sample(tables)
        out.x.block_until_ready()

    xplanes = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", xplanes)
    if not xplanes:
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data(xplanes, "hlo_stats", {})
    import gzip, json

    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode("utf-8", "replace")
    # hlo_stats returns a JSON table; aggregate self-time by category+name
    try:
        tbl = json.loads(data)
    except json.JSONDecodeError:
        print(data[:2000])
        return
    rows = tbl[0]["data"] if isinstance(tbl, list) else tbl["data"]
    cols = [c["label"] if isinstance(c, dict) else c
            for c in (tbl[0]["cols"] if isinstance(tbl, list) else tbl["cols"])]
    print(cols)
    idx_name = next(i for i, c in enumerate(cols) if "HLO" in c or "name" in c.lower())
    idx_time = next(i for i, c in enumerate(cols)
                    if "self" in c.lower() and "time" in c.lower())
    idx_cat = next((i for i, c in enumerate(cols) if "ategory" in c), None)
    agg = {}
    for r in rows:
        vals = [c.get("v") if isinstance(c, dict) else c for c in r["c"]]
        cat = vals[idx_cat] if idx_cat is not None else "?"
        key_ = cat
        agg[key_] = agg.get(key_, 0.0) + float(vals[idx_time] or 0.0)
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{v:12.1f} us  {k}")


if __name__ == "__main__":
    main()
