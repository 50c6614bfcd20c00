"""Port of `examples/metal.rs`: two metal teapots under an HDRI."""

from _assets import get_hdri, get_mesh, save

import rpt_tpu as rpt


def main():
    teapot = get_mesh("teapot")
    scene = rpt.Scene()
    scene.add(get_hdri("ballroom_2k"))
    scene.add(
        rpt.Object(teapot.scale((0.5, 0.5, 0.5)).translate((0.0, -1.7, 0.0))).material(
            rpt.Material.metallic(rpt.hex_color(0xFFFFFF), 0.1)
        )
    )
    scene.add(
        rpt.Object(teapot.scale((0.5, 0.5, 0.5)).translate((0.0, 0.2, 0.0))).material(
            rpt.Material.metallic(rpt.hex_color(0xFFFFFF), 0.0001)
        )
    )
    img = (
        rpt.Renderer(scene, rpt.Camera())
        .width(1200)
        .height(900)
        .max_bounces(5)
        .num_samples(20)
        .render()
    )
    save(img, "output.png")


if __name__ == "__main__":
    main()
