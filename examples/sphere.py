"""Port of the reference driver `examples/sphere.rs`: a default-material
sphere on a grey plane under a spherical area light."""

import math

from PIL import Image

import rpt_tpu as rpt


def build_scene() -> rpt.Scene:
    scene = rpt.Scene()
    scene.add(rpt.Object(rpt.sphere()))  # default grey material
    scene.add(
        rpt.Object(rpt.plane((0.0, 1.0, 0.0), -1.0)).material(
            rpt.Material.diffuse(rpt.hex_color(0xAAAAAA))
        )
    )
    scene.add(
        rpt.Light.Object(
            rpt.Object(
                rpt.sphere().scale((2.0, 2.0, 2.0)).translate((0.0, 12.0, 0.0))
            ).material(rpt.Material.light(rpt.hex_color(0xFFFFFF), 40.0))
        )
    )
    return scene


def main():
    scene = build_scene()
    camera = rpt.Camera.look_at(
        (-2.5, 4.0, 6.5), (0.0, -0.25, 0.0), (0.0, 1.0, 0.0), math.pi / 4
    )
    img = (
        rpt.Renderer(scene, camera)
        .width(960)
        .height(540)
        .max_bounces(2)
        .num_samples(100)
        .render()
    )
    Image.fromarray(img).save("output.png")
    print("saved output.png")


if __name__ == "__main__":
    main()
