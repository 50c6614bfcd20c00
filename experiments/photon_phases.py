"""Fine-grained attribution of the lampshade photon pipeline phases:
shoot = compute vs device->host pulls; build = grid sorts vs calibration
vs radius; trace = k-NN vs occlusion rechecks (monomial-heavy scene!).

    python experiments/photon_phases.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")
sys.path.insert(0, "/root/repo/examples")

import jax
import jax.numpy as jnp
import numpy as np

from _lampshade import build_scene, camera
import rpt_tpu as rpt
from rpt_tpu.dtypes import DTYPE, INF
from rpt_tpu.integrators import photon as ph
from rpt_tpu.ray import Ray
from rpt_tpu.vec import Vec3


def main():
    watts_m2 = 200_000.0 / (130.0 * 105.0)
    scene_b = build_scene(rpt.Material.light(rpt.hex_color(0xFFFEFA), watts_m2))
    scene_b.add(rpt.Medium.homogeneous_isotropic(1e-4, 1e-3))
    scene = scene_b.compile()
    tables = scene.tables
    key = jax.random.key(1)
    n = 1 << 19
    watts = 1.0

    # ---- shoot: compute vs pull ---------------------------------------
    launch = ph._shoot_launch(scene, 0 if scene.lights[0].kind != "ambient" else 1,
                              watts / n, "surface", 48, n)
    # find the object light the real path uses
    li, _ = ph._find_object_light(scene)
    launch = ph._shoot_launch(scene, li, watts / (2 * n), "surface", 48, n)
    k = jax.random.fold_in(key, 0)
    out = launch.fn(tables, k)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = launch.fn(tables, jax.random.fold_in(key, 7))
    jax.block_until_ready(out)
    t_compute = time.perf_counter() - t0
    s_rows, s_count, v_rows, v_count = out
    sc, vc = int(s_count), int(v_count)
    print(f"shoot chunk compute ({n} photons): {t_compute:6.2f} s "
          f"(s={sc}, v={vc}, caps {launch.s_cap}/{launch.v_cap})")
    t0 = time.perf_counter()
    a = np.asarray(s_rows[: min(sc, launch.s_cap)])
    b = np.asarray(v_rows[: min(vc, launch.v_cap)])
    t_pull = time.perf_counter() - t0
    mb = (a.nbytes + b.nbytes) / 1e6
    print(f"shoot chunk pull:                 {t_pull:6.2f} s ({mb:.0f} MB "
          f"= {mb/max(t_pull,1e-9):.0f} MB/s)")

    # ---- build: grid sort pieces --------------------------------------
    surface = np.concatenate([a, a])  # ~2 chunks worth
    t0 = time.perf_counter()
    static, tabs = ph.build_photon_grid(surface[:, 0:3], k=100)
    t_grid = time.perf_counter() - t0
    print(f"build_photon_grid ({len(surface)} rows): {t_grid:6.2f} s")

    t0 = time.perf_counter()
    order = np.asarray(tabs["order"])
    t_pull2 = time.perf_counter() - t0
    print(f"  order pull: {t_pull2:6.2f} s")

    # ---- trace: one occlusion-recheck wavefront -----------------------
    nw = 16384 * 32
    rng = np.random.default_rng(0)
    o = rng.uniform(-1.0, 1.0, (nw, 3)).astype(np.float32)
    o[:, 1] = np.abs(o[:, 1])
    d = rng.normal(size=(nw, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ray = Ray(Vec3.from_array(o), Vec3.from_array(d))
    limit = jnp.full(nw, 1.5, DTYPE)

    from rpt_tpu.intersect import occluded

    @jax.jit
    def f_occ(tables):
        return occluded(scene, tables, ray, limit, coherent=False)

    r = f_occ(tables); r.block_until_ready()
    t0 = time.perf_counter()
    r = f_occ(tables); r.block_until_ready()
    print(f"occlusion recheck wavefront ({nw} lanes): {time.perf_counter()-t0:6.2f} s")
    print(f"  (x4 chunks x 10 samples = x40 per render)")

    # monomial cost isolated
    from rpt_tpu.intersect import intersect_monomials, Hit

    @jax.jit
    def f_mono(tables):
        return intersect_monomials(tables["monomials"], ray, scene.t_min,
                                   Hit.none((nw,))).time

    if scene.n_monomials:
        r = f_mono(tables); r.block_until_ready()
        t0 = time.perf_counter()
        r = f_mono(tables); r.block_until_ready()
        print(f"  monomial intersect alone: {time.perf_counter()-t0:6.2f} s")


if __name__ == "__main__":
    main()
