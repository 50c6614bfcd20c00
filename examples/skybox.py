"""Port of `examples/skybox.rs`: open-ceiling foggy Cornell box under a sky
environment, path traced."""

import os
import time

from _assets import save
from _skybox import build_scene, camera

import rpt_tpu as rpt


def main():
    scene = build_scene()
    os.makedirs("skybox", exist_ok=True)
    state = {"t": time.time()}

    def cb(iteration, buffer):
        millis = int((time.time() - state["t"]) * 1000)
        print(f"Finished iteration {iteration}, took {millis} ms, variance: {buffer.variance()}")
        save(buffer.image(), f"skybox/output_{iteration - 1:03d}.png")
        state["t"] = time.time()

    (
        rpt.Renderer(scene, camera())
        .width(512)
        .height(512)
        .max_bounces(4)
        .num_samples(5000)
        .iterative_render(1000, cb)
    )


if __name__ == "__main__":
    main()
