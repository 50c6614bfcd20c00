"""Port of `examples/fractal_spheres.rs`: recursive sphere fractal with
per-level shape groups (the reference uses KdTree::new per level)."""

import math

import numpy as np

from _assets import save

import rpt_tpu as rpt


def gen(spheres, p, rad, depth, last_dir):
    spheres[depth].append(rpt.sphere().scale((rad, rad, rad)).translate(tuple(p)))
    if depth == len(spheres) - 1:
        return
    disp = rad * 7.0 / 5.0
    dirs = [
        (disp, 0, 0), (-disp, 0, 0), (0, disp, 0), (0, -disp, 0), (0, 0, disp), (0, 0, -disp),
    ]
    for i, d in enumerate(dirs):
        if last_dir is None or i != (last_dir ^ 1):
            gen(spheres, p + np.asarray(d), rad * 2.0 / 5.0, depth + 1, i)


def main():
    colors = [0x264653, 0x2A9D8F, 0xE9C46A, 0xF4A261, 0xE76F51]
    spheres = [[] for _ in colors]
    gen(spheres, np.zeros(3), 1.0, 0, None)

    scene = rpt.Scene()
    for i, group in enumerate(spheres):
        print(f"Level {i}: {len(group)} spheres")
        scene.add(
            rpt.Object(rpt.KdTree(group)).material(
                rpt.Material.specular(rpt.hex_color(colors[i]), 0.25)
            )
        )
    scene.add(
        rpt.Object(rpt.plane((0.0, 0.0, 1.0), -6.0)).material(
            rpt.Material.diffuse(rpt.hex_color(0xFFCCCC))
        )
    )
    scene.add(rpt.Light.Ambient((0.02, 0.02, 0.02)))
    d = np.array([0.0, -0.65, -1.0])
    scene.add(rpt.Light.Directional((0.6, 0.6, 0.6), tuple(d / np.linalg.norm(d))))
    scene.add(rpt.Light.Point((100.0, 100.0, 100.0), (0.0, 5.0, 5.0)))

    dirv = np.array([-0.285714, -0.5, -1.0])
    upv = np.array([0.0, 1.0, -0.5])
    camera = rpt.Camera(
        eye=(2.0, 3.5, 7.0),
        direction=tuple(dirv / np.linalg.norm(dirv)),
        up=tuple(upv / np.linalg.norm(upv)),
        fov=math.pi / 6,
    )
    img = rpt.Renderer(scene, camera).width(800).height(600).render()
    save(img, "output.png")


if __name__ == "__main__":
    main()
