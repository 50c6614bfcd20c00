"""Port of `examples/marbles.rs`: RK4 marble physics in a glass
(monomial surface), rendered per frame and muxed with ffmpeg."""

import math
import os
import subprocess

import numpy as np

from _assets import get_hdri, save

import rpt_tpu as rpt
from rpt_tpu.ode import MarblesSystem, ParticleState, monomial_closest_point_precise
from rpt_tpu.vec import Vec3

TEST = False
N = 25
R = 0.15
FRAMES = 180


def main():
    os.makedirs("video", exist_ok=True)
    rng = np.random.default_rng(123)
    pos = np.array(
        [[(i // 5) / 5.0 - 0.375, rng.uniform(4.0, 6.0), (i % 5) / 5.0 - 0.375] for i in range(N)]
    )
    state = ParticleState.of(pos, np.zeros((N, 3)))
    system = MarblesSystem(radius=R)

    hdri = get_hdri("ballroom_8k")
    colors = [0x264653, 0x2A9D8F, 0xE9C46A, 0xF4A261, 0xE76F51]

    frames = int(os.environ.get("RPT_TPU_FRAMES", str(FRAMES)))  # smoke-test cap
    for frame in range(frames):
        scene = rpt.Scene()
        if not TEST:
            scene.add(hdri)
            scene.add(
                rpt.Light.Object(
                    rpt.Object(
                        rpt.sphere().scale((1.5, 1.5, 1.5)).translate((0.0, 5.0, 0.0))
                    ).material(rpt.Material.light(rpt.hex_color(0xFFFFFF), 15.0))
                )
            )
        else:
            scene.add(rpt.Light.Ambient((0.01, 0.01, 0.01)))

        glass = rpt.Material.clear(1.5, 0.0001)
        # the reference loads examples/monomial.obj; the analytic surface is
        # the same shape (marbles.rs:94 uses monomial_surface(2., 4.))
        scene.add(rpt.Object(rpt.monomial_surface(2.0)).material(glass))

        cur = state.pos.to_numpy()
        closest = monomial_closest_point_precise(2.0, Vec3.from_array(cur)).to_numpy()
        vec = cur - closest
        length = np.linalg.norm(vec, axis=1, keepdims=True)
        clamped = np.where(
            length < R * 1.05, closest + vec / np.maximum(length, 1e-12) * R * 1.05, cur
        )
        clamped[:, 1] = np.maximum(clamped[:, 1], R - 0.06)
        for i in range(N):
            scene.add(
                rpt.Object(
                    rpt.sphere().scale((R, R, R)).translate(tuple(clamped[i]))
                ).material(rpt.Material.specular(rpt.hex_color(colors[i % len(colors)]), 0.1))
            )
        scene.add(
            rpt.Object(
                rpt.polygon(
                    [(20.0, -0.06, 20.0), (20.0, -0.06, -20.0), (-20.0, -0.06, -20.0),
                     (-20.0, -0.06, 20.0)]
                )
            ).material(rpt.Material.diffuse(rpt.hex_color(0xAAAAAA)))
        )

        camera = rpt.Camera.look_at(
            (0.0, 1.0, 6.0), (0.0, 1.0, 0.0), (0.0, 1.0, 0.0), math.pi / 4
        ).focus((0.0, 1.0, 0.0), 0.02)

        if TEST:
            img = (
                rpt.Renderer(scene, camera).width(200).height(150).max_bounces(7).num_samples(1)
                .render()
            )
        else:
            img = (
                rpt.Renderer(scene, camera).width(800).height(600).max_bounces(9)
                .num_samples(2000).render()
            )
        save(img, f"video/image_{frame}.png")
        state = system.rk4_integrate(state, 1.0 / 16.0, 1.0 / 10000.0)
        print(f"Frame {frame} finished")

    try:
        subprocess.run(
            ["ffmpeg", "-y", "-i", "video/image_%d.png", "-vcodec", "libx264",
             "-s", "800x600", "-pix_fmt", "yuv420p", "video.mp4"],
            check=False,
        )
    except FileNotFoundError:
        print("ffmpeg not installed; frames left in video/")


if __name__ == "__main__":
    main()
