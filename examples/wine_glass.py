"""Port of `examples/wine_glass.rs`: a glass mesh under an 8k HDRI."""

import time

from _assets import get_hdri, get_mesh, save

import rpt_tpu as rpt


def main():
    scene = rpt.Scene()
    scene.add(get_hdri("ballroom_8k"))
    scene.add(rpt.Object(get_mesh("wine_glass")).material(rpt.Material.clear(1.5, 0.0001)))
    scene.add(
        rpt.Object(
            rpt.polygon(
                [(-5.0, 0.0, -5.0), (-5.0, 0.0, 5.0), (5.0, 0.0, 5.0), (5.0, 0.0, -5.0)]
            )
        ).material(rpt.Material.diffuse(rpt.hex_color(0x6F5D48)))
    )
    scene.add(
        rpt.Light.Object(
            rpt.Object(
                rpt.sphere().scale((3.0, 3.0, 3.0)).translate((11.15, 13.739, -4.9325))
            ).material(rpt.Material.light(rpt.hex_color(0xFFFFFF), 200.0))
        )
    )

    eye = (5.530, 4.375, 5.384)
    camera = rpt.Camera.look_at(
        eye,
        (eye[0] - 0.6962, eye[1] - 0.3754, eye[2] - 0.6119),
        (0.0, 1.0, 0.0),
        0.6911,
    )
    state = {"t": time.time()}

    def cb(iteration, buffer):
        millis = int((time.time() - state["t"]) * 1000)
        print(f"Finished iteration {iteration}, took {millis} ms, variance: {buffer.variance()}")
        save(buffer.image(), f"output_{iteration - 1:03d}.png")
        state["t"] = time.time()

    (
        rpt.Renderer(scene, camera)
        .width(1920)
        .height(1080)
        .max_bounces(6)
        .num_samples(1000)
        .iterative_render(10, cb)
    )


if __name__ == "__main__":
    main()
