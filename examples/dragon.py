"""Port of `examples/dragon.rs`: the Stanford dragon (871k triangles)
through BVH build + traversal at scale.

The reference downloads the OBJ (dragon.rs:10-23); place it at
``data/dragon.obj`` or a procedural stand-in of the same scale is used.
"""

import math

from _assets import get_mesh, save

import rpt_tpu as rpt


def main():
    print("Loading dragon...")
    dragon = get_mesh("dragon", fallback_tris=871_000)
    print("Finished loading dragon!")

    scene = rpt.Scene()
    scene.add(
        rpt.Object(dragon.scale((3.4, 3.4, 3.4)).rotate_y(math.pi / 2)).material(
            rpt.Material.specular(rpt.hex_color(0xB7CA79), 0.1)
        )
    )
    scene.add(
        rpt.Object(rpt.plane((0.0, 1.0, 0.0), -1.0)).material(
            rpt.Material.diffuse(rpt.hex_color(0xAAAAAA))
        )
    )
    scene.add(rpt.Light.Ambient((0.01, 0.01, 0.01)))
    scene.add(
        rpt.Light.Object(
            rpt.Object(rpt.sphere().scale((2.0, 2.0, 2.0)).translate((0.0, 20.0, 3.0))).material(
                rpt.Material.light((1.0, 1.0, 1.0), 160.0)
            )
        )
    )
    scene.add(
        rpt.Light.Object(
            rpt.Object(
                rpt.sphere().scale((0.05, 0.05, 0.05)).translate((-1.0, 0.71, 0.0))
            ).material(rpt.Material.light(rpt.hex_color(0xFFAAAA), 400.0))
        )
    )

    camera = rpt.Camera.look_at((-2.5, 4.0, 6.5), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0), math.pi / 6)
    img = rpt.Renderer(scene, camera).max_bounces(2).num_samples(1).render()
    save(img, "output.png")


if __name__ == "__main__":
    main()
