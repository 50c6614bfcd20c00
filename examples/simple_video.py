"""Port of `examples/simple_video.rs`: per-frame scene rebuild + ffmpeg."""

import math
import os
import subprocess

from _assets import save

import rpt_tpu as rpt


def main():
    os.makedirs("video", exist_ok=True)
    frames = int(os.environ.get("RPT_TPU_FRAMES", "60"))  # smoke-test cap
    for i in range(frames):
        scene = rpt.Scene()
        scene.add(rpt.Object(rpt.sphere()))
        scene.add(
            rpt.Object(
                rpt.cube()
                .rotate_y(math.pi / 6.0)
                .scale((0.5, 0.3, 0.4))
                .translate((0.4, -0.8, 4.0 + 0.01 * i))
            ).material(rpt.Material.specular(rpt.hex_color(0xFF00FF), 0.5))
        )
        scene.add(
            rpt.Object(rpt.sphere().scale((0.5, 0.5, 0.5)).translate((1.5, -0.5, 1.0))).material(
                rpt.Material.specular(rpt.hex_color(0x0000FF), 0.1)
            )
        )
        scene.add(
            rpt.Object(rpt.sphere().scale((0.5, 0.5, 0.5)).translate((-1.5, -0.5, 1.0))).material(
                rpt.Material.specular(rpt.hex_color(0x00FF00), 0.1)
            )
        )
        scene.add(
            rpt.Object(rpt.plane((0.0, 1.0, 0.0), -1.0)).material(
                rpt.Material.specular(rpt.hex_color(0xAAAAAA), 0.5)
            )
        )
        scene.add(rpt.Light.Ambient((0.01, 0.01, 0.01)))
        scene.add(rpt.Light.Point((100.0, 100.0, 100.0), (0.0, 5.0, 5.0)))
        img = (
            rpt.Renderer(scene, rpt.Camera())
            .width(800)
            .height(600)
            .num_samples(100)
            .max_bounces(1)
            .render()
        )
        save(img, f"video/image_{i}.png")

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
