"""Port of `examples/lego.rs`: OBJ + MTL multi-object loading.

NB: the reference's asset zip is missing from its own checkout
(`.MISSING_LARGE_BLOBS`), and its MTL parser panics on any material
property (io.rs:225) — so this driver requires a data/lego.obj +
data/lego.mtl pair with newmtl-only materials, or falls back to a plate of
colored cubes."""

import os
import sys

from _assets import DATA, save

import rpt_tpu as rpt
from rpt_tpu.io import load_obj_with_mtl


def lego_objects():
    obj = os.path.join(DATA, "lego.obj")
    mtl = os.path.join(DATA, "lego.mtl")
    if os.path.exists(obj) and os.path.exists(mtl):
        return load_obj_with_mtl(obj, mtl), True
    print("note: data/lego.obj(.mtl) not found; building a brick-plate stand-in", file=sys.stderr)
    colors = [0xC91A09, 0x0055BF, 0x237841, 0xF2CD37]
    objs = []
    for i in range(8):
        for j in range(8):
            c = colors[(i + j) % 4]
            objs.append(
                rpt.Object(
                    rpt.cube().scale((90.0, 40.0, 90.0)).translate((i * 100.0, 20.0, j * 100.0))
                ).material(rpt.Material.diffuse(rpt.hex_color(c)))
            )
    return objs, False


def main():
    print("Loading lego plane...")
    objects, from_file = lego_objects()
    print("Finished loading lego plane!")
    scene = rpt.Scene()
    for obj in objects:
        shape = obj.shape.scale((0.002, 0.002, 0.002)).translate((-0.720, -0.243, -0.770))
        scene.add(rpt.Object(shape, obj._material))
    scene.add(
        rpt.Light.Object(
            rpt.Object(rpt.sphere().scale((6.0, 6.0, 6.0)).translate((0.0, 20.0, 30.0))).material(
                rpt.Material.light((1.0, 1.0, 1.0), 25.0)
            )
        )
    )
    camera = rpt.Camera.look_at((-1.5, 1.2, 2.5), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0), 0.6)
    img = (
        rpt.Renderer(scene, camera)
        .width(960)
        .height(540)
        .max_bounces(5)
        .num_samples(20)
        .render()
    )
    save(img, "output.png")


if __name__ == "__main__":
    main()
