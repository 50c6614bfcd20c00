"""Port of `examples/basic.rs`: primitive scene with point + ambient lights."""

import math

from _assets import save

import rpt_tpu as rpt


def main():
    scene = rpt.Scene()
    scene.add(rpt.Object(rpt.sphere()))
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

    img = rpt.Renderer(scene, rpt.Camera()).width(800).height(600).render()
    save(img, "output.png")


if __name__ == "__main__":
    main()
