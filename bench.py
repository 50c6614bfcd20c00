"""Benchmark: Mrays/sec/chip on the dragon-scale mesh scene at 512x512.

Mirrors the workload of the reference's `examples/dragon.rs:25-74`
(specular ~871k-triangle mesh + plane + ambient + two spherical area
lights, 2 bounces). The Stanford dragon OBJ is downloaded at run time by
the reference; with no network access we use a deterministic procedural
mesh of the same triangle count (`rpt_tpu.meshes.displaced_blob`), or the
real OBJ from ``data/dragon.obj`` if present.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is relative to the 100 Mrays/sec/chip north-star target
(BASELINE.md).
"""

import json
import math
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import rpt_tpu as rpt
from rpt_tpu import sampling
from rpt_tpu.dtypes import DTYPE
from rpt_tpu.integrators.path import trace_surface
from rpt_tpu.meshes import displaced_blob

WIDTH = HEIGHT = 512
SPP = 8
MAX_BOUNCES = 2
TARGET_MRAYS = 100.0


def check_backend(timeout_s: float | None = None, op=None) -> float:
    """Watchdog the first device op against a hung backend init.

    The axon TPU plugin's initialization can hang indefinitely during
    tunnel outages (BENCH_r03 sat 880+ s with zero output). Run a tiny
    device op in a worker thread with a deadline; on timeout or error,
    emit ONE machine-readable JSON line and exit rc=2 fast so a driver
    capture is a diagnosable "backend unavailable" record instead of an
    rc=124 mystery. Returns the probe's elapsed seconds on success.

    ``timeout_s``/``op`` are injection points for the outage-simulation
    test (tests/test_graft_entry.py / test_bench_watchdog).
    """
    import threading

    if timeout_s is None:
        # 240 s: the healthy backend's first dispatch measured 31-45 s
        # today but exceeded 120 s once right after another TPU process
        # exited (the tunnel re-initializes); a real outage still fails
        # in well under the driver's patience (BENCH_r03 sat 880+ s).
        timeout_s = float(os.environ.get("RPT_TPU_BACKEND_TIMEOUT", "240"))
    done = threading.Event()
    errors: list[BaseException] = []

    def _probe():
        try:
            if op is None:
                x = jax.device_put(np.ones((8,), np.float32))
                np.asarray(x)  # full host->device->host round trip
            else:
                op()
        except BaseException as e:  # noqa: BLE001 - reported, not swallowed
            errors.append(e)
        finally:
            done.set()

    t0 = time.perf_counter()
    threading.Thread(target=_probe, daemon=True).start()
    ok = done.wait(timeout_s)
    if not ok or errors:
        detail = repr(errors[0]) if errors else f"device probe hung >{timeout_s:.0f}s"
        print(json.dumps({"error": "backend_unavailable", "detail": detail}))
        sys.stderr.write(f"# backend watchdog tripped: {detail}\n")
        sys.exit(2)
    return time.perf_counter() - t0


def load_dragon_mesh():
    path = os.path.join(os.path.dirname(__file__), "data", "dragon.obj")
    if os.path.exists(path):
        from rpt_tpu.io import load_obj

        return load_obj(path)
    # 660 x 661 grid -> ~871k triangles, matching the dragon's scale
    return displaced_blob(660, 661)


def build_scene() -> rpt.Scene:
    dragon = load_dragon_mesh()
    scene = rpt.Scene()
    scene.add(
        rpt.Object(
            dragon.scale((3.4, 3.4, 3.4)).rotate_y(math.pi / 2)
        ).material(rpt.Material.specular(rpt.hex_color(0xB7CA79), 0.1))
    )
    scene.add(
        rpt.Object(rpt.plane((0.0, 1.0, 0.0), -1.0)).material(
            rpt.Material.diffuse(rpt.hex_color(0xAAAAAA))
        )
    )
    scene.add(rpt.Light.Ambient((0.01, 0.01, 0.01)))
    scene.add(
        rpt.Light.Object(
            rpt.Object(rpt.sphere().scale((2.0, 2.0, 2.0)).translate((0.0, 20.0, 3.0))).material(
                rpt.Material.light((1.0, 1.0, 1.0), 160.0)
            )
        )
    )
    scene.add(
        rpt.Light.Object(
            rpt.Object(
                rpt.sphere().scale((0.05, 0.05, 0.05)).translate((-1.0, 0.71, 0.0))
            ).material(rpt.Material.light(rpt.hex_color(0xFFAAAA), 400.0))
        )
    )
    return scene


def run_extra_metrics(budget_s: float) -> None:
    """Append the secondary workload metrics (sphere analytic path,
    cornell dense-tri path) to the driver artifact, AFTER the dragon
    headline is already printed+flushed.

    Parse safety: the driver extracts ONE JSON object from bench.py's
    output (BENCH_rN.json "parsed"), and its selection rule among
    multiple stdout JSON lines is unknown — so extras go to STDERR as
    `# extra {json}` lines. The driver's "tail" capture merges stderr,
    so a green artifact still shows the whole profile (VERDICT r4 #6).

    Budget safety: a hard SIGALRM backstop exits 0 after ``budget_s``
    (the headline is already out); each metric is also try/excepted so
    one failure can't mask the others.
    """
    import signal

    def _give_up(signum, frame):
        sys.stderr.write(f"# extra metrics hit the {budget_s:.0f}s budget; exiting\n")
        sys.stderr.flush()
        os._exit(0)

    signal.signal(signal.SIGALRM, _give_up)
    signal.alarm(int(budget_s))
    try:
        import bench_extra

        metrics = [bench_extra.sphere_metric, bench_extra.cornell_metric]
        # photon wall: 50.9 s warm / ~3 min cold since the round-5 fused
        # build + count-independent shoot shapes — fits the default 900 s
        # budget (the SIGALRM backstop still bounds a cold-compile storm)
        if os.environ.get("RPT_TPU_BENCH_PHOTON", "1") == "1":
            metrics.append(bench_extra.photon_metric)
        for fn in metrics:
            try:
                sys.stderr.write(f"# extra {json.dumps(fn())}\n")
            except Exception as e:  # noqa: BLE001 - recorded, not fatal
                sys.stderr.write(
                    f"# extra {json.dumps({'metric': fn.__name__, 'error': repr(e)})}\n"
                )
            sys.stderr.flush()
    finally:
        signal.alarm(0)


def main():
    probe_s = check_backend()
    sys.stderr.write(f"# backend probe ok in {probe_s:.1f}s\n")
    t_setup = time.time()
    scene = build_scene().compile()
    camera = rpt.Camera.look_at(
        (-2.5, 4.0, 6.5), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0), math.pi / 6
    )
    n_pix = WIDTH * HEIGHT
    dim = float(max(WIDTH, HEIGHT))
    # Morton pixel order: consecutive wavefront lanes are spatially
    # coherent, which the tile-binned traversal converts into shared
    # cluster fetches (rpt_tpu.tiled)
    from rpt_tpu.renderer import _pixel_grid

    xn_np, yn_np, pixel_ids, _ = _pixel_grid(WIDTH, HEIGHT)
    xn = jnp.asarray(xn_np, DTYPE)
    yn = jnp.asarray(yn_np, DTYPE)

    @jax.jit
    def launch(tables, key, s0):
        pix_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
            jnp.asarray(pixel_ids, jnp.int32)
        )

        def one(acc, s):
            acc_img, acc_segs = acc
            keys = sampling.fold(pix_keys, s0 + s)
            jx = sampling.uniform(sampling.fold(keys, 1), -1.0 / dim, 1.0 / dim)
            jy = sampling.uniform(sampling.fold(keys, 2), -1.0 / dim, 1.0 / dim)
            ray = camera.cast_ray(xn + jx, yn + jy, sampling.fold(keys, 3))
            color, segs = trace_surface(
                scene, tables, ray, sampling.fold(keys, 4), MAX_BOUNCES, return_stats=True
            )
            return (acc_img + color.to_array(), acc_segs + segs), None

        (img, segs), _ = jax.lax.scan(
            one, (jnp.zeros((n_pix, 3), DTYPE), jnp.zeros((), jnp.int32)), jnp.arange(SPP)
        )
        return img, segs

    key = jax.random.key(0)
    # warmup/compile (int() forces a real device->host sync; under the axon
    # tunnel block_until_ready can resolve before the work is done)
    img, segs = launch(scene.tables, key, jnp.asarray(0, jnp.int32))
    int(segs)
    setup_s = time.time() - t_setup

    best = float("inf")
    reps = 3
    for r in range(reps):
        t0 = time.perf_counter()
        img, segs = launch(scene.tables, key, jnp.asarray((r + 1) * SPP, jnp.int32))
        int(segs)
        best = min(best, time.perf_counter() - t0)

    total_rays = int(segs)
    mrays = total_rays / best / 1e6
    print(
        json.dumps(
            {
                "metric": "dragon_512_mrays_per_sec_per_chip",
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / TARGET_MRAYS, 3),
            }
        )
    )
    print(
        f"# {total_rays} ray segments in {best:.3f}s best-of-{reps}; "
        f"setup+compile {setup_s:.1f}s; mean radiance {float(np.asarray(img).mean()):.4f}",
        file=sys.stderr,
    )
    sys.stdout.flush()
    sys.stderr.flush()
    extra_budget = float(os.environ.get("RPT_TPU_BENCH_EXTRA_BUDGET", "900"))
    if extra_budget > 0:
        run_extra_metrics(extra_budget)


if __name__ == "__main__":
    main()
