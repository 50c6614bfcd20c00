"""Port of `examples/volumetric_beambeam_lampshade.rs`: beam-photon x
beam-query volumetric photon mapping."""

import os

from _assets import save
from _lampshade import build_scene, camera

import rpt_tpu as rpt

absorb, scat = 0.0001, 0.001
size, bounce, sample = 128, 10, 50
watts = 200_000.0 / (130.0 * 105.0)
photons = 1_000_000
gather_size, gather_size_volume = 20, 3


def main():
    light_mtl = rpt.Material.light(rpt.hex_color(0xFFFEFA), watts)
    scene = build_scene(light_mtl)
    scene.add(rpt.Medium.homogeneous_isotropic(absorb, scat))
    os.makedirs("lampshade/beambeam", exist_ok=True)
    img = (
        rpt.Renderer(scene, camera())
        .width(size)
        .height(size)
        .max_bounces(bounce)
        .num_samples(sample)
        .gather_size(gather_size)
        .watts(watts * photons)
        .gather_size_volume(gather_size_volume)
        .photon_beam_query_beam_render(photons)
    )
    save(
        img,
        f"lampshade/beambeam/{size}_{bounce}_{sample}_{photons}_{watts}_"
        f"{gather_size}_{gather_size_volume}_{absorb}_{scat}.png",
    )


if __name__ == "__main__":
    main()
