"""Port of `examples/compound.rs`: compound of five cubes."""

import math

from _assets import save

import rpt_tpu as rpt


def lamp(x, y, z, r, e):
    return rpt.Light.Object(
        rpt.Object(rpt.sphere().scale((r, r, r)).translate((x, y, z))).material(
            rpt.Material.light((1.0, 1.0, 1.0), e)
        )
    )


def main():
    scene = rpt.Scene()
    magic_angle = math.acos((3.0 * math.sqrt(5.0) - 1.0) / 8.0)

    c_central = rpt.cube()
    c_green = c_central.rotate(-magic_angle, (1.0, 1.0, 1.0))
    c_red = c_green.scale((-1.0, 1.0, 1.0))
    c_blue = c_green.scale((1.0, -1.0, 1.0))
    c_orange = c_red.scale((1.0, -1.0, 1.0))

    scene.add(rpt.Object(c_central).material(rpt.Material.specular(rpt.hex_color(0xC144EB), 0.4)))
    scene.add(rpt.Object(c_green).material(rpt.Material.specular(rpt.hex_color(0x45E542), 0.4)))
    scene.add(rpt.Object(c_red).material(rpt.Material.specular(rpt.hex_color(0xF55142), 0.4)))
    scene.add(rpt.Object(c_blue).material(rpt.Material.specular(rpt.hex_color(0x4275F5), 0.4)))
    scene.add(rpt.Object(c_orange).material(rpt.Material.specular(rpt.hex_color(0xF5BF42), 0.4)))
    scene.add(
        rpt.Object(rpt.plane((0.0, 1.0, 0.0), -0.80902)).material(
            rpt.Material.diffuse(rpt.hex_color(0xFFFFFF))
        )
    )
    scene.add(lamp(-2.0, 3.5, 0.5, 0.5, 60.0))
    scene.add(lamp(0.0, 0.5, 5.0, 1.0, 2.0))
    scene.add(lamp(2.0, 1.0, -5.0, 0.6, 10.0))

    camera = rpt.Camera.look_at((-0.9, 1.2, 2.4), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0), math.pi / 4)
    img = (
        rpt.Renderer(scene, camera)
        .width(1024)
        .height(1024)
        .max_bounces(5)
        .num_samples(50)
        .render()
    )
    save(img, "output.png")


if __name__ == "__main__":
    main()
