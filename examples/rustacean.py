"""Port of `examples/rustacean.rs`: the Rust crab with bubble eyes."""

from _assets import get_mesh, save

import rpt_tpu as rpt


def main():
    scene = rpt.Scene()
    crab_scale = (2.0, 2.4, 2.0)
    scene.add(
        rpt.Object(
            get_mesh("rustacean").translate((0.0, 0.134649, 0.0)).scale(crab_scale)
        ).material(rpt.Material.specular(rpt.hex_color(0xF84C00), 0.2))
    )
    scene.add(
        rpt.Object(rpt.plane((0.0, 1.0, 0.0), 0.0)).material(
            rpt.Material.diffuse(rpt.hex_color(0xAAAA77))
        )
    )
    bubbles = [
        (True, 0.2, (-0.81, 1.02, 0.47)),
        (True, 0.3, (-0.86, 1.10, 0.36)),
        (True, 0.4, (-0.75, 1.12, 0.34)),
        (False, 0.2, (0.87, 1.03, 0.41)),
        (False, 0.3, (0.75, 1.09, 0.36)),
        (False, 0.4, (0.85, 1.15, 0.45)),
    ]
    for clear, roughness, pos in bubbles:
        p = tuple(c * s for c, s in zip(pos, crab_scale))
        mtl = (
            rpt.Material.clear(1.5, roughness)
            if clear
            else rpt.Material.metallic(rpt.hex_color(0xFFFFFF), roughness)
        )
        scene.add(rpt.Object(rpt.sphere().scale((0.1, 0.1, 0.1)).translate(p)).material(mtl))
    scene.add(
        rpt.Light.Object(
            rpt.Object(rpt.sphere().scale((2.0, 2.0, 2.0)).translate((0.0, 20.0, 3.0))).material(
                rpt.Material.light((1.0, 1.0, 1.0), 160.0)
            )
        )
    )
    camera = rpt.Camera.look_at((-2.5, 4.0, 8.5), (0.0, 0.9, 0.0), (0.0, 1.0, 0.0), 0.5)
    img = rpt.Renderer(scene, camera).width(800).height(600).max_bounces(3).num_samples(100).render()
    save(img, "output.png")


if __name__ == "__main__":
    main()
