"""Port of `examples/glass.rs`: metal and glass balls under an HDRI."""

from _assets import get_hdri, save

import rpt_tpu as rpt


def main():
    scene = rpt.Scene()
    scene.add(get_hdri("ballroom_2k"))
    scene.add(
        rpt.Object(rpt.sphere().translate((1.1, 0.0, 0.0))).material(
            rpt.Material.metallic(rpt.hex_color(0xFFFFFF), 0.0001)
        )
    )
    scene.add(
        rpt.Object(rpt.sphere().translate((-1.1, 0.0, 0.0))).material(
            rpt.Material.clear(1.5, 0.0001)
        )
    )
    img = (
        rpt.Renderer(scene, rpt.Camera())
        .width(1200)
        .height(900)
        .max_bounces(5)
        .num_samples(200)
        .render()
    )
    save(img, "output.png")


if __name__ == "__main__":
    main()
