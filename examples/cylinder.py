"""Port of `examples/cylinder.rs`: STL loading with point + directional +
ambient lights."""

import math
import os

import numpy as np

from _assets import DATA, save

import rpt_tpu as rpt
from rpt_tpu.io import load_stl


def _cylinder_mesh():
    path = os.path.join(DATA, "cylinder.stl")
    if os.path.exists(path):
        return load_stl(path)
    # procedural stand-in: a 30x50-unit cylinder (matching the asset's
    # normalization below)
    import sys

    print("note: data/cylinder.stl not found; using procedural cylinder", file=sys.stderr)
    n = 64
    a = np.linspace(0, 2 * np.pi, n + 1)
    tris = []
    for i in range(n):
        x0, z0 = 15 + 15 * np.cos(a[i]), 15 + 15 * np.sin(a[i])
        x1, z1 = 15 + 15 * np.cos(a[i + 1]), 15 + 15 * np.sin(a[i + 1])
        tris.append([[x0, z0, 0], [x1, z1, 0], [x0, z0, 50]])
        tris.append([[x1, z1, 0], [x1, z1, 50], [x0, z0, 50]])
        tris.append([[15, 15, 50], [x0, z0, 50], [x1, z1, 50]])
        tris.append([[15, 15, 0], [x1, z1, 0], [x0, z0, 0]])
    return rpt.Mesh(np.asarray(tris, np.float64))


def main():
    scene = rpt.Scene()
    scene.add(
        rpt.Object(
            _cylinder_mesh()
            .translate((-15.0, -15.0, -25.0))
            .scale((1.0 / 15.0, 1.0 / 15.0, 1.0 / 25.0))
            .rotate_y(math.pi / 4.0)
        )
    )
    scene.add(
        rpt.Object(rpt.plane((0.0, 1.0, 0.0), -1.0)).material(
            rpt.Material.diffuse(rpt.hex_color(0xAAAAAA))
        )
    )
    scene.add(rpt.Light.Ambient((0.02, 0.02, 0.02)))
    scene.add(rpt.Light.Point((80.0, 80.0, 80.0), (0.0, 5.0, 5.0)))
    d = np.array([1.0, -1.0, 0.0])
    scene.add(rpt.Light.Directional((2.0, 2.0, 2.0), tuple(d / np.linalg.norm(d))))

    img = rpt.Renderer(scene, rpt.Camera()).width(512).height(512).render()
    save(img, "output.png")


if __name__ == "__main__":
    main()
