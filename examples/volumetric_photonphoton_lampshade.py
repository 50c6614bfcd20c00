"""Port of `examples/volumetric_photonphoton_lampshade.rs`: point-photon x
point-query volumetric photon mapping."""

import os

from _assets import save
from _lampshade import build_scene, camera

import rpt_tpu as rpt

absorb, scat = 0.0008, 0.0008
size, bounce, sample = 128, 10, 100
watts = 10_000_000.0
photons = 1_000_000
gather_size, gather_size_volume = 100, 30


def main():
    light_mtl = rpt.Material.light(rpt.hex_color(0xFFFEFA), 120.0)
    scene = build_scene(light_mtl)
    scene.add(rpt.Medium.homogeneous_isotropic(absorb, scat))
    os.makedirs("lampshade/photonphoton", exist_ok=True)
    img = (
        rpt.Renderer(scene, camera())
        .width(size)
        .height(size)
        .max_bounces(bounce)
        .num_samples(sample)
        .gather_size(gather_size)
        .watts(watts)
        .gather_size_volume(gather_size_volume)
        .photon_map_render(photons)
    )
    save(
        img,
        f"lampshade/photonphoton/{size}_{bounce}_{sample}_{photons}_{watts}_"
        f"{gather_size}_{gather_size_volume}_{absorb}_{scat}.png",
    )


if __name__ == "__main__":
    main()
