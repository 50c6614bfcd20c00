"""Port of `examples/spheres.rs`: depth of field demo (Z-up scene)."""

import time

from _assets import save

import rpt_tpu as rpt


def main():
    scene = rpt.Scene()
    red = rpt.Material.specular(rpt.hex_color(0xE78999), 0.1)
    yellow = rpt.Material.specular(rpt.hex_color(0xE7A94D), 0.1)
    green = rpt.Material.specular(rpt.hex_color(0xB3E7AA), 0.1)
    blue = rpt.Material.specular(rpt.hex_color(0x7CA3E7), 0.1)
    grey = rpt.Material.specular(rpt.hex_color(0xAAAAAA), 0.1)
    light_mtl = rpt.Material.light(rpt.hex_color(0xFFFFFF), 8.0)

    spheres = [
        ((0.5, 4.0, 1.0), red),
        ((3.15, -0.7, 1.5), yellow),
        ((0.1, -2.0, 0.6), green),
        ((-1.7, -0.2, 1.1), blue),
        ((1.2, 0.4, 0.5), grey),
    ]
    scene.add(
        rpt.Object(rpt.plane((0.0, 0.0, 1.0), 0.0)).material(
            rpt.Material.diffuse(rpt.hex_color(0xE7E7E7))
        )
    )
    for pos, mtl in spheres:
        r = pos[2]
        scene.add(rpt.Object(rpt.sphere().scale((r, r, r)).translate(pos)).material(mtl))
    scene.add(
        rpt.Light.Object(
            rpt.Object(rpt.sphere().scale((2.0, 2.0, 2.0)).translate((1.2, -1.5, 8.0))).material(
                light_mtl
            )
        )
    )

    camera = rpt.Camera.look_at(
        (0.7166, -9.2992, 2.8803), (0.8673, 0.2095, 0.9557), (0.0, 0.0, 1.0), 0.6911
    ).focus((0.1, -2.0, 0.6), 0.15)

    state = {"t": time.time()}

    def cb(iteration, buffer):
        millis = int((time.time() - state["t"]) * 1000)
        print(f"Finished iteration {iteration}, took {millis} ms, variance: {buffer.variance()}")
        save(buffer.image(), f"output_{iteration - 1:03d}.png")
        state["t"] = time.time()

    (
        rpt.Renderer(scene, camera)
        .width(800)
        .height(600)
        .max_bounces(6)
        .num_samples(1000)
        .iterative_render(10, cb)
    )


if __name__ == "__main__":
    main()
