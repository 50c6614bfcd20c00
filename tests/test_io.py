"""Asset I/O tests (io.rs semantics)."""

import io as _io

import numpy as np
import pytest

from rpt_tpu.io import load_mtl, load_obj, load_obj_with_mtl, load_stl

OBJ_SIMPLE = """
# comment
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
f 1 2 3 4
"""

OBJ_NORMALS = """
v 0 0 0
v 1 0 0
v 0 1 0
vn 0 0 1
f 1//1 2//1 3//1
"""

OBJ_NEGATIVE = """
v 0 0 0
v 1 0 0
v 0 1 0
f -3 -2 -1
"""


def test_load_obj_fan_triangulation():
    mesh = load_obj(_io.StringIO(OBJ_SIMPLE))
    assert len(mesh) == 2  # quad -> 2 triangles
    assert np.allclose(mesh.vertices[0][0], [0, 0, 0])


def test_load_obj_normals():
    mesh = load_obj(_io.StringIO(OBJ_NORMALS))
    assert len(mesh) == 1
    assert np.allclose(mesh.normals[0], [[0, 0, 1]] * 3)


def test_load_obj_negative_indices():
    mesh = load_obj(_io.StringIO(OBJ_NEGATIVE))
    assert len(mesh) == 1
    assert np.allclose(mesh.vertices[0][1], [1, 0, 0])


def test_load_mtl_newmtl_only():
    mats = load_mtl(_io.StringIO("newmtl a\nnewmtl b\n"))
    assert set(mats) == {"a", "b"}
    # properties raise, as the reference panics (io.rs:225)
    with pytest.raises(NotImplementedError):
        load_mtl(_io.StringIO("newmtl a\nKd 1 0 0\n"))


def test_load_obj_with_mtl_splits_objects():
    obj = "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\nusemtl a\nf 1 2 3\nusemtl b\nf 2 4 3\n"
    objs = load_obj_with_mtl(_io.StringIO(obj), _io.StringIO("newmtl a\nnewmtl b\n"))
    assert len(objs) == 2


def _stl_binary_bytes():
    import struct

    tri = struct.pack(
        "<12fH",
        0, 0, 1,  # normal
        0, 0, 0,
        1, 0, 0,
        0, 1, 0,
        0,
    )
    return b"\0" * 80 + struct.pack("<I", 1) + tri


def test_load_stl_binary():
    mesh = load_stl(_io.BytesIO(_stl_binary_bytes()))
    assert len(mesh) == 1
    assert np.allclose(mesh.normals[0], [[0, 0, 1]] * 3)


STL_ASCII = """solid cube
facet normal 0 0 1
 outer loop
  vertex 0 0 0
  vertex 1 0 0
  vertex 0 1 0
 endloop
endfacet
endsolid cube
"""


def test_load_stl_ascii():
    mesh = load_stl(_io.BytesIO(STL_ASCII.encode()))
    assert len(mesh) == 1
    assert np.allclose(mesh.vertices[0][1], [1, 0, 0])
