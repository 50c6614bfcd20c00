"""Port of `examples/volumetric_pathtrace_lampshade.rs`: pure volumetric
path tracing of the lampshade scene."""

import os
import time

from _assets import save
from _lampshade import build_scene, camera

import rpt_tpu as rpt

absorb, scat = 0.00005, 0.003
size, bounce, sample = 128, 10, 1000
every_x = 100
watts = 150.0


def main():
    light_mtl = rpt.Material.light(rpt.hex_color(0xFFFEFA), watts)
    scene = build_scene(light_mtl)
    scene.add(rpt.Medium.homogeneous_isotropic(absorb, scat))
    os.makedirs("lampshade/pathtrace", exist_ok=True)
    state = {"t": time.time()}

    def cb(iteration, buffer):
        millis = int((time.time() - state["t"]) * 1000)
        print(f"Finished iteration {iteration}, took {millis} ms, variance: {buffer.variance()}")
        save(buffer.image(), f"lampshade/pathtrace/output_{iteration - 1:03d}.png")
        state["t"] = time.time()

    (
        rpt.Renderer(scene, camera())
        .width(size)
        .height(size)
        .max_bounces(bounce)
        .num_samples(sample)
        .iterative_render(every_x, cb)
    )


if __name__ == "__main__":
    main()
