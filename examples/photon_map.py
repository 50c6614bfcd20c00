"""Port of `examples/photon_map.rs`: Cornell variant with a transmissive
sphere, surface photon mapping with 10M photons."""

import math

from _assets import save

import rpt_tpu as rpt


def main():
    scene = rpt.Scene()
    camera = rpt.Camera(
        eye=(278.0, 273.0, -800.0), direction=(0.0, 0.0, 1.0), up=(0.0, 1.0, 0.0), fov=0.686
    )
    white = rpt.Material.diffuse(rpt.hex_color(0xAAAAAA))
    transmissive = rpt.Material.transmissive(1.5)
    red = rpt.Material.diffuse(rpt.hex_color(0xBC0000))
    green = rpt.Material.diffuse(rpt.hex_color(0x00BC00))
    light_mtl = rpt.Material.light(rpt.hex_color(0xFFFEFA), 100.0)

    floor = rpt.polygon([(0, 0, 0), (0, 0, 559.2), (556, 0, 559.2), (556, 0, 0)])
    ceiling = rpt.polygon([(0, 548.9, 0), (556, 548.9, 0), (556, 548.9, 559.2), (0, 548.9, 559.2)])
    light_rect = rpt.polygon(
        [(343.0, 548.8, 227.0), (343.0, 548.8, 332.0), (213.0, 548.8, 332.0), (213.0, 548.8, 227.0)]
    )
    back_wall = rpt.polygon(
        [(0, 0, 559.2), (0, 548.9, 559.2), (556, 548.9, 559.2), (556, 0, 559.2)]
    )
    right_wall = rpt.polygon([(0, 0, 0), (0, 548.9, 0), (0, 548.9, 559.2), (0, 0, 559.2)])
    left_wall = rpt.polygon(
        [(556, 0, 0), (556, 0, 559.2), (556, 548.9, 559.2), (556, 548.9, 0)]
    )
    mirror_sphere = rpt.sphere().scale((100.0, 100.0, 100.0)).translate((185.0, 82.5, 169.0))
    small_box = (
        rpt.cube()
        .scale((165.0, 165.0, 165.0))
        .rotate_y(2 * math.pi * (-197.0 / 360.0))
        .translate((400.0, 82.0, 300.0))
    )

    scene.add(rpt.Object(floor).material(white))
    scene.add(rpt.Object(ceiling).material(white))
    scene.add(rpt.Object(back_wall).material(white))
    scene.add(rpt.Object(left_wall).material(red))
    scene.add(rpt.Object(right_wall).material(green))
    scene.add(rpt.Object(mirror_sphere).material(transmissive))
    scene.add(rpt.Object(small_box).material(white))
    scene.add(rpt.Light.Object(rpt.Object(light_rect).material(light_mtl)))

    img = (
        rpt.Renderer(scene, camera)
        .width(512)
        .height(512)
        .filter(rpt.Filter.Box(1))
        .max_bounces(5)
        .num_samples(10)
        .photon_map_render(10_000_000)
    )
    save(img, "output7.png")


if __name__ == "__main__":
    main()
