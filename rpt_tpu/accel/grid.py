"""Uniform hash-grid k-nearest-neighbor queries for photon maps.

Replaces the reference's `kd_tree::KdTree::nearests` photon lookups
(`/root/reference/src/photon.rs:329-342,401-413`): recursive kd descent per
query cannot map to a vector machine. Instead photons are counting-sorted
into a uniform grid on the host; a device query gathers the candidates of
the 27 neighboring cells (as contiguous index ranges with a static per-cell
cap) and selects the k nearest with ``lax.top_k``.

The cell size is auto-calibrated so the 3x3x3 neighborhood almost always
contains >= k photons (host refinement loop over a query sample); capacity
misses are counted and reported, never silently dropped.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..dtypes import DTYPE
from ..vec import Vec3

MAX_CELLS = 4_000_000


@dataclass(frozen=True)
class PhotonGridStatic:
    """Host-side grid metadata (static for jit)."""

    origin: tuple
    inv_h: float
    dims: tuple  # (nx, ny, nz)
    cap: int  # per-cell candidate cap
    n_photons: int
    truncation_rate: float  # fraction of sample queries with < k in 27 cells


def _cell_coords(pos: np.ndarray, origin, inv_h, dims):
    c = np.floor((pos - origin) * inv_h).astype(np.int64)
    return np.clip(c, 0, np.asarray(dims) - 1)


def build_photon_grid(positions: np.ndarray, k: int, cap: int = 24,
                      sample_queries: np.ndarray | None = None):
    """Build a uniform grid over photon positions, calibrated for k-NN.

    Returns (static, tables) where tables = {"starts": (C+1,), "order":
    (P,)} device arrays; photon payload arrays should be sorted by
    ``order`` by the caller.
    """
    positions = np.asarray(positions, np.float64).reshape(-1, 3)
    n = len(positions)
    if n == 0:
        static = PhotonGridStatic((0, 0, 0), 1.0, (1, 1, 1), cap, 0, 0.0)
        return static, {
            "starts": jnp.zeros(2, jnp.int32),
            "order": jnp.zeros(0, jnp.int32),
        }

    lo = positions.min(0)
    hi = positions.max(0)
    span = np.maximum(hi - lo, 1e-9)
    vol = float(np.prod(span))
    # initial guess: ~2.5k photons in a 3x3x3 neighborhood (uniform density)
    h = (vol * 2.5 * k / (27.0 * n)) ** (1.0 / 3.0)
    h = max(h, 1e-9)

    if sample_queries is None:
        sample_queries = positions[:: max(1, n // 512)][:512]

    best = None
    for _ in range(8):
        dims = np.minimum(np.maximum((span / h).astype(np.int64) + 1, 1), 512)
        while int(np.prod(dims)) > MAX_CELLS:
            h *= 1.5
            dims = np.minimum(np.maximum((span / h).astype(np.int64) + 1, 1), 512)
        inv_h = 1.0 / h
        cc = _cell_coords(positions, lo, inv_h, dims)
        cell_id = (cc[:, 0] * dims[1] + cc[:, 1]) * dims[2] + cc[:, 2]
        counts = np.bincount(cell_id, minlength=int(np.prod(dims)))
        # candidate cap: 99th percentile of occupied cells (bounded)
        occupied = counts[counts > 0]
        cap_eff = int(np.clip(np.percentile(occupied, 99.0), 4, 32)) if occupied.size else cap
        # sample-based truncation check: photons found in 27 cells per query
        qc = _cell_coords(np.asarray(sample_queries, np.float64), lo, inv_h, dims)
        capped = np.zeros(len(qc), np.int64)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    nb = qc + [dx, dy, dz]
                    ok = ((nb >= 0) & (nb < dims)).all(1)
                    ids = (nb[:, 0] * dims[1] + nb[:, 1]) * dims[2] + nb[:, 2]
                    c = np.where(ok, counts[np.clip(ids, 0, counts.size - 1)], 0)
                    capped += np.minimum(c, cap_eff)
        trunc = float(np.mean(capped < min(k, n)))
        if best is None or trunc < best[4]:
            best = (h, dims, inv_h, cell_id, trunc, cap_eff)
        if trunc <= 0.005:  # target: <0.5% of queries see fewer than k
            break
        h *= 1.4

    h, dims, inv_h, cell_id, trunc, cap = best
    if trunc > 0.01:
        import sys

        print(
            f"rpt_tpu: photon grid truncates k-NN for {trunc:.1%} of sample queries "
            f"(cap {cap}, cell {h:.3g})",
            file=sys.stderr,
        )
    order = np.argsort(cell_id, kind="stable")
    sorted_ids = cell_id[order]
    n_cells = int(np.prod(dims))
    starts = np.searchsorted(sorted_ids, np.arange(n_cells + 1))

    static = PhotonGridStatic(
        tuple(lo), float(inv_h), tuple(int(d) for d in dims), int(cap), n, trunc
    )
    tables = {
        "starts": jnp.asarray(starts, jnp.int32),
        "order": jnp.asarray(order, jnp.int32),
    }
    return static, tables


def knn_query(static: PhotonGridStatic, tables, pos_rows, query: Vec3, k: int):
    """k-NN per query lane.

    ``pos_rows``: (P, 4) f32 rows [x, y, z, pad] ALREADY sorted in grid
    order — packed so each candidate costs ONE row gather.
    Returns (idx (n, k) into the sorted arrays, d2 (n, k), valid (n, k)).
    """
    n = query.x.shape[0]
    if static.n_photons == 0:
        return (
            jnp.zeros((n, k), jnp.int32),
            jnp.full((n, k), jnp.inf, DTYPE),
            jnp.zeros((n, k), bool),
        )
    nx, ny, nz = static.dims
    cap = static.cap
    ox, oy, oz = static.origin
    inv_h = static.inv_h

    def coord(v, o, d):
        return jnp.clip(jnp.floor((v - o) * inv_h).astype(jnp.int32), 0, d - 1)

    cx = coord(query.x, ox, nx)
    cy = coord(query.y, oy, ny)
    cz = coord(query.z, oz, nz)

    starts = tables["starts"]
    cand_idx = []
    cand_ok = []
    # 9 (dx, dy) neighbor columns; each covers a contiguous run of 3 cells
    # in z (cells are sorted by (x, y, z)), so one (start, end) range each.
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            x = cx + dx
            y = cy + dy
            in_bounds = (x >= 0) & (x < nx) & (y >= 0) & (y < ny)
            z0 = jnp.maximum(cz - 1, 0)
            z1 = jnp.minimum(cz + 1, nz - 1)
            base = (x * ny + y) * nz
            s = jnp.take(starts, jnp.clip(base + z0, 0, starts.shape[0] - 1))
            e = jnp.take(starts, jnp.clip(base + z1 + 1, 0, starts.shape[0] - 1))
            run_cap = 3 * cap
            offs = jax.lax.broadcasted_iota(jnp.int32, (n, run_cap), 1)
            idx = s[:, None] + offs
            ok = in_bounds[:, None] & (idx < e[:, None])
            cand_idx.append(jnp.where(ok, idx, 0))
            cand_ok.append(ok)
    idx = jnp.concatenate(cand_idx, axis=1)  # (n, 9*run_cap)
    ok = jnp.concatenate(cand_ok, axis=1)

    flat = idx.reshape(-1)
    rows = jnp.take(pos_rows, flat, axis=0).reshape(idx.shape[0], idx.shape[1], 4)
    d2 = (
        (rows[:, :, 0] - query.x[:, None]) ** 2
        + (rows[:, :, 1] - query.y[:, None]) ** 2
        + (rows[:, :, 2] - query.z[:, None]) ** 2
    )
    d2 = jnp.where(ok, d2, jnp.inf)
    neg_d2, top_pos = jax.lax.top_k(-d2, k)
    top_idx = jnp.take_along_axis(idx, top_pos, axis=1)
    top_d2 = -neg_d2
    valid = jnp.isfinite(top_d2)
    return top_idx, top_d2, valid
