"""Port of `examples/skybox_photons.rs`: photon mapping in the open foggy
Cornell scene, 10M photons."""

import os

from _assets import save
from _skybox import build_scene, camera

import rpt_tpu as rpt


def main():
    scene = build_scene()
    os.makedirs("skybox", exist_ok=True)
    img = (
        rpt.Renderer(scene, camera())
        .width(256)
        .height(256)
        .filter(rpt.Filter.Box(1))
        .max_bounces(10)
        .num_samples(100)
        .photon_map_render(10_000_000)
    )
    save(img, "skybox/photon.png")


if __name__ == "__main__":
    main()
