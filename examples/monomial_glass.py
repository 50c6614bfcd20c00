"""Port of `examples/monomial_glass.rs`: HDRI environment + a metallic
monomial surface among the basic.rs primitives (monomial_glass.rs:28-86)."""

import math

from _assets import get_hdri, save

import rpt_tpu as rpt


def main():
    scene = rpt.Scene()
    scene.add(get_hdri("ballroom_2k"))

    scene.add(
        rpt.Object(rpt.monomial_surface(2.0, 4.0).translate((0.0, -1.0, 0.0))).material(
            rpt.Material.metallic(rpt.hex_color(0xFFFFFF), 0.0001)
        )
    )
    scene.add(
        rpt.Object(
            rpt.cube()
            .rotate_y(math.pi / 6.0)
            .scale((0.5, 0.3, 0.4))
            .translate((0.4, -0.8, 4.0))
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
        .max_bounces(1)
        .num_samples(100)
        .render()
    )
    save(img, "output.png")


if __name__ == "__main__":
    main()
