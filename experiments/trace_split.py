"""Attribute the lampshade photonphoton TRACE phase (camera estimate pass)
by ablation: occlusion rechecks vs surface k-NN width vs volume k-NN
width. Real 1M-photon map, 128^2, ONE sample per variant (the real
render scans 10 — multiply the warm walls by 10).

    python experiments/trace_split.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/examples")

import jax
import numpy as np

from _lampshade import build_scene, camera
import rpt_tpu as rpt
from rpt_tpu.integrators import photon as ph
from rpt_tpu.renderer import _photon_launch


def timed(fn, *args, reps=2):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    watts = 200_000.0 / (130.0 * 105.0)
    scene_b = build_scene(rpt.Material.light(rpt.hex_color(0xFFFEFA), watts))
    scene_b.add(rpt.Medium.homogeneous_isotropic(1e-4, 1e-3))
    scene = scene_b.compile()
    tables = scene.tables
    key = jax.random.key(1)
    photons = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    t0 = time.perf_counter()
    surface, volume = ph.shoot_photons_device(
        scene, tables, jax.random.fold_in(key, 1), photons,
        watts * photons, "photon_map",
    )
    jax.block_until_ready((surface, volume))
    print(f"shoot: {time.perf_counter()-t0:6.1f} s "
          f"(s={len(surface)}, v={len(volume)})", flush=True)

    t0 = time.perf_counter()
    rng = np.random.default_rng(18)
    pmap = ph.build_photon_map(scene, tables, surface, volume, "photon_map",
                               100, 30, rng)
    jax.block_until_ready(pmap)
    print(f"build: {time.perf_counter()-t0:6.1f} s", flush=True)

    cam = camera()
    variants = [
        ("full (g=100, gv=30, occ)", 100, 30, True),
        ("no-occlusion rechecks    ", 100, 30, False),
        ("surface k=1              ", 1, 30, True),
        ("volume  k=1              ", 100, 1, True),
    ]
    for name, g, gv, occ in variants:
        # gather sizes affect k-NN window config only through the map's
        # static calibration (built once above for 100/30); the launch's
        # g/gv control how many neighbors are PROCESSED + rechecked.
        fn = _photon_launch(scene, cam, 128, 128, "photon_map", g, gv, 1, occ)
        t0 = time.perf_counter()
        wall, out = timed(fn, tables, pmap, jax.random.fold_in(key, 2))
        print(f"{name}: warm {wall:6.2f} s/sample "
              f"(first incl. compile {time.perf_counter()-t0:6.1f} s, "
              f"mean {float(np.asarray(out).mean()):.3g})", flush=True)


if __name__ == "__main__":
    main()
