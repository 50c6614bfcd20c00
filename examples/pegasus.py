"""Port of `examples/pegasus.rs`: an ice pegasus under a birchwood HDRI."""

from _assets import get_hdri, get_mesh, save

import rpt_tpu as rpt


def main():
    scene = rpt.Scene()
    scene.add(get_hdri("birchwood_8k"))
    ice = rpt.Material.transparent(rpt.hex_color(0xF8F8FF), 1.31, 0.2)
    scene.add(rpt.Object(get_mesh("pegasus").scale((1.4, 1.4, 1.4))).material(ice))
    scene.add(
        rpt.Object(rpt.plane((0.0, 1.0, 0.0), -1.0)).material(
            rpt.Material.diffuse(rpt.hex_color(0xDDDDDD))
        )
    )
    camera = rpt.Camera.look_at((-3.0, 2.0, 6.0), (0.0, 0.2, 0.0), (0.0, 1.0, 0.0), 0.6)
    img = (
        rpt.Renderer(scene, camera)
        .width(1200)
        .height(1200)
        .max_bounces(8)
        .num_samples(10)
        .render()
    )
    save(img, "output.png")


if __name__ == "__main__":
    main()
