"""Asset I/O: Wavefront OBJ (+MTL) and STL mesh loading.

Parity: `/root/reference/src/io.rs` — including negative indices
(io.rs:11-19), polygon fan triangulation with optional smooth normals
(io.rs:164-201), the warn-and-skip handling of `vt`/`mtllib`/`usemtl`
(io.rs:47-67), per-`usemtl` object splitting (io.rs:84-150), binary STL
auto-detection by size = 84 + 50n (io.rs:264-291), and — faithfully — the
reference's refusal to parse MTL *properties* (io.rs:225 panics
"MTL loading not implemented"; only `newmtl`-only files work).

Text parsing is Python (startup cost only); binary STL decodes through one
numpy view. HDR (Radiance .hdr) decode for HDRIs lives here too — the
reference does it ad hoc in examples via the `image` crate.
"""

from __future__ import annotations

import sys

import numpy as np

from .materials import Material
from .shapes import Mesh, flat_normals


def _parse_index(value: str, length: int):
    """1-based or negative OBJ index -> 0-based (io.rs:11-19)."""
    if not value:
        return None
    try:
        idx = int(value)
    except ValueError:
        return None
    return idx - 1 if idx > 0 else length + idx


def _parse_point(tokens):
    return np.array([float(tokens[1]), float(tokens[2]), float(tokens[3])])


def _face_triangles(tokens, vertices, normals):
    """Fan triangulation of an `f` line (io.rs:164-201)."""
    vi, vni = [], []
    for vertex in tokens[1:]:
        args = (vertex.split("/") + ["", ""])[:3]
        idx = _parse_index(args[0], len(vertices))
        if idx is None:
            raise ValueError("Invalid vertex index")
        vi.append(idx)
        vni.append(_parse_index(args[2], len(normals)))
    tris, tri_normals = [], []
    for i in range(1, len(vi) - 1):
        a, b, c = 0, i, i + 1
        v = [vertices[vi[a]], vertices[vi[b]], vertices[vi[c]]]
        tris.append(v)
        if vni[a] is None or vni[b] is None or vni[c] is None:
            tri_normals.append(None)
        else:
            tri_normals.append([normals[vni[a]], normals[vni[b]], normals[vni[c]]])
    return tris, tri_normals


def _mesh_from(tris, tri_normals) -> Mesh:
    if not tris:
        return Mesh(np.zeros((0, 3, 3)))
    v = np.asarray(tris, np.float64)
    flat = flat_normals(v)
    n = np.array(
        [tn if tn is not None else flat[i] for i, tn in enumerate(tri_normals)], np.float64
    )
    return Mesh(v, n)


def load_obj(path_or_file) -> Mesh:
    """Load mesh geometry from a Wavefront .OBJ file (io.rs:28-74)."""
    lines = _read_lines(path_or_file)
    vertices, normals = [], []
    tris, tri_normals = [], []
    for line in lines:
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        tokens = line.split()
        if tokens[0] == "v":
            vertices.append(_parse_point(tokens))
        elif tokens[0] == "vt":
            print("Warning: Found 'vt' in .OBJ file, unimplemented, skipping...", file=sys.stderr)
        elif tokens[0] == "vn":
            normals.append(_parse_point(tokens))
        elif tokens[0] == "f":
            t, tn = _face_triangles(tokens, vertices, normals)
            tris.extend(t)
            tri_normals.extend(tn)
        elif tokens[0] == "mtllib":
            print("Warning: Found 'mtllib' in .OBJ file, unimplemented, skipping...", file=sys.stderr)
        elif tokens[0] == "usemtl":
            print("Warning: Found 'usemtl' in .OBJ file, unimplemented, skipping...", file=sys.stderr)
    return _mesh_from(tris, tri_normals)


def load_obj_with_mtl(obj_path, mtl_path) -> list:
    """Load objects with materials, splitting on `usemtl` changes
    (io.rs:84-150). Returns a list of `rpt_tpu.Object`."""
    from .scene import Object

    materials = load_mtl(mtl_path)
    lines = _read_lines(obj_path)
    vertices, normals = [], []
    objects = []
    cur_tris, cur_normals = [], []
    cur_material = Material()
    last_usemtl = None

    def flush():
        nonlocal cur_tris, cur_normals
        if cur_tris:
            objects.append(Object(_mesh_from(cur_tris, cur_normals), cur_material))
            cur_tris, cur_normals = [], []

    for line in lines:
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        tokens = line.split()
        if tokens[0] == "v":
            vertices.append(_parse_point(tokens))
        elif tokens[0] == "vt":
            print("Warning: Found 'vt' in .OBJ file, unimplemented, skipping...", file=sys.stderr)
        elif tokens[0] == "vn":
            normals.append(_parse_point(tokens))
        elif tokens[0] == "f":
            t, tn = _face_triangles(tokens, vertices, normals)
            cur_tris.extend(t)
            cur_normals.extend(tn)
        elif tokens[0] == "usemtl":
            if last_usemtl is None or last_usemtl != tokens[1]:
                flush()
                if tokens[1] not in materials:
                    raise ValueError(f"Could not found `usemtl {tokens[1]}` in library")
                cur_material = materials[tokens[1]]
                last_usemtl = tokens[1]
    flush()
    return objects


def load_mtl(path_or_file) -> dict:
    """Parse a .MTL library (io.rs:203-258). As in the reference, only
    `newmtl` declarations are supported; any material property raises
    (io.rs:225: `panic!("MTL loading not implemented")`)."""
    materials: dict[str, Material] = {}
    current = None
    for line in _read_lines(path_or_file):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        tokens = line.split()
        if tokens[0] == "newmtl":
            current = tokens[1]
            materials.setdefault(current, Material())
        else:
            if current is None:
                raise ValueError(
                    "Material was not specified with `newmtl` before properties were added"
                )
            raise NotImplementedError("MTL loading not implemented")
    return materials


def load_stl(path_or_file) -> Mesh:
    """Load a mesh from .STL, auto-detecting binary vs ASCII
    (io.rs:264-291)."""
    if hasattr(path_or_file, "read"):
        data = path_or_file.read()
    else:
        with open(path_or_file, "rb") as f:
            data = f.read()
    size = len(data)
    if size < 15:
        raise ValueError("Loaded .STL file is too short")
    if size >= 84:
        num_triangles = int(np.frombuffer(data[80:84], "<u4")[0])
        if size == 84 + num_triangles * 50:
            return _load_stl_binary(data, num_triangles)
    if data[:6] == b"solid ":
        return _load_stl_ascii(data)
    raise ValueError("Loaded .STL file, but could not determine format")


def _load_stl_binary(data: bytes, num_triangles: int) -> Mesh:
    """50-byte records: normal + 3 verts (f32) + u16 attr (io.rs:335-364)."""
    rec = np.frombuffer(data[84:], np.uint8).reshape(num_triangles, 50)
    floats = rec[:, :48].copy().view("<f4").reshape(num_triangles, 4, 3).astype(np.float64)
    vn = floats[:, 0]
    verts = floats[:, 1:4]
    normals = np.repeat(vn[:, None, :], 3, axis=1)
    return Mesh(verts, normals)


def _load_stl_ascii(data: bytes) -> Mesh:
    lines = data.decode("utf-8", errors="replace").splitlines()[1:]
    tris, norms = [], []
    i = 0
    while i < len(lines):
        line = lines[i].strip()
        if not line.startswith("facet normal "):
            if line.startswith("endsolid") or not line:
                break
            raise ValueError("Malformed STL file: expected `facet normal`")
        vn = [float(t) for t in line[len("facet normal ") :].split()]
        vs = []
        for j in range(2, 5):
            vline = lines[i + j].strip()
            if not vline.startswith("vertex "):
                raise ValueError("Malformed STL file: expected `vertex`")
            vs.append([float(t) for t in vline[len("vertex ") :].split()])
        tris.append(vs)
        norms.append([vn, vn, vn])
        i += 7  # facet normal / outer loop / 3 vertices / endloop / endfacet
    return Mesh(np.asarray(tris, np.float64), np.asarray(norms, np.float64))


def load_hdr(path_or_file) -> np.ndarray:
    """Decode a Radiance .hdr image to linear (H, W, 3) float64.

    The reference decodes HDRIs via the `image` crate in examples
    (`examples/glass.rs:13-23`); here imageio/Pillow handle it, with a
    minimal RGBE fallback decoder."""
    try:
        import imageio.v3 as iio

        return np.asarray(iio.imread(path_or_file), np.float64)[..., :3]
    except Exception:
        pass
    return _decode_rgbe(path_or_file)


def _decode_rgbe(path_or_file) -> np.ndarray:
    if hasattr(path_or_file, "read"):
        data = path_or_file.read()
    else:
        with open(path_or_file, "rb") as f:
            data = f.read()
    # header
    pos = data.index(b"\n\n") + 2 if b"\n\n" in data else 0
    header, rest = data[:pos], data[pos:]
    if not (data.startswith(b"#?RADIANCE") or data.startswith(b"#?RGBE")):
        raise ValueError("Not a Radiance HDR file")
    dims_end = rest.index(b"\n")
    dims = rest[:dims_end].split()
    height, width = int(dims[1]), int(dims[3])
    buf = rest[dims_end + 1 :]
    out = np.zeros((height, width, 4), np.uint8)
    off = 0
    for y in range(height):
        if buf[off] == 2 and buf[off + 1] == 2:  # adaptive RLE
            off += 4
            for c in range(4):
                x = 0
                while x < width:
                    count = buf[off]
                    off += 1
                    if count > 128:
                        out[y, x : x + count - 128, c] = buf[off]
                        off += 1
                        x += count - 128
                    else:
                        out[y, x : x + count, c] = np.frombuffer(
                            buf[off : off + count], np.uint8
                        )
                        off += count
                        x += count
        else:  # flat RGBE
            row = np.frombuffer(buf[off : off + width * 4], np.uint8).reshape(width, 4)
            out[y] = row
            off += width * 4
    rgbe = out.astype(np.float64)
    exp = np.ldexp(1.0, out[..., 3].astype(np.int32) - 136)
    rgb = rgbe[..., :3] * exp[..., None]
    rgb[out[..., 3] == 0] = 0.0
    return rgb


def _read_lines(path_or_file) -> list[str]:
    if hasattr(path_or_file, "read"):
        content = path_or_file.read()
        if isinstance(content, bytes):
            content = content.decode("utf-8", errors="replace")
        return content.splitlines()
    with open(path_or_file, "r", errors="replace") as f:
        return f.read().splitlines()
