"""Port of `examples/teapot.rs`: a red metallic teapot on a plane."""

from _assets import get_mesh, save

import rpt_tpu as rpt


def main():
    scene = rpt.Scene()
    scene.add(
        rpt.Object(
            get_mesh("teapot").scale((0.5, 0.5, 0.5)).translate((0.0, -1.0, 0.0))
        ).material(rpt.Material.metallic(rpt.hex_color(0xFF0000), 0.4))
    )
    scene.add(
        rpt.Object(rpt.plane((0.0, 1.0, 0.0), -1.0)).material(
            rpt.Material.diffuse(rpt.hex_color(0xAAAAAA))
        )
    )
    scene.add(rpt.Light.Ambient((0.02, 0.02, 0.02)))
    scene.add(rpt.Light.Point((60.0, 60.0, 60.0), (0.0, 5.0, 5.0)))
    img = rpt.Renderer(scene, rpt.Camera()).width(800).height(800).render()
    save(img, "output.png")


if __name__ == "__main__":
    main()
