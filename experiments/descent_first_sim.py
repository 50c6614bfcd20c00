"""Decide the round-3 deferred redesign: does DESCENT-FIRST (collect all
candidate groups with box-only pruning, then drain ordered with best-hit
pruning) cost materially more node visits / fat tests than the current
alternating schedule (test feedback tightens the descent cutoff)?

Host numpy simulation on the real L1 bounce wavefront, W-wide tree
(W inferred). Reports per-ray:
  A) alternating (immediate ordered testing, best feeds descent cutoff):
     visits_A, tests_A  — the current algorithm's arithmetic content.
  B) descent-first: visits_B (box-only pruning), groups_B (candidate
     buffer occupancy), then ordered drain: tests_B.
"""

import math
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import numpy as np
import jax

from batch_scaling import get_l1
import bench


def tri_test(f3, cids, o, d, best):
    """best time of each (lane, cluster) pair against the fat row."""
    v1 = f3[cids, 0:3].transpose(0, 2, 1)
    e1 = f3[cids, 3:6].transpose(0, 2, 1)
    e2 = f3[cids, 6:9].transpose(0, 2, 1)
    oo = o[:, None, :]
    dd = d[:, None, :]
    pn = np.cross(e1, e2)
    nrm = np.linalg.norm(pn, axis=2, keepdims=True)
    pn = pn / np.maximum(nrm, 1e-30)
    cosine = (pn * dd).sum(2)
    t = (pn * (v1 - oo)).sum(2) / np.where(np.abs(cosine) < 1e-12, 1e-12, cosine)
    ok = (np.abs(cosine) >= 1e-8) & (t >= 1e-4) & (t < best[:, None])
    p = oo + dd * t[:, :, None]
    d2 = p - v1
    d00 = (e1 * e1).sum(2); d01 = (e1 * e2).sum(2); d11 = (e2 * e2).sum(2)
    d20 = (d2 * e1).sum(2); d21 = (d2 * e2).sum(2)
    den = d00 * d11 - d01 * d01
    den = np.where(np.abs(den) < 1e-30, 1e-30, den)
    v = (d11 * d20 - d01 * d21) / den
    w = (d00 * d21 - d01 * d20) / den
    ok &= (v >= 0) & (w >= 0) & (1.0 - v - w >= 0)
    return np.where(ok, t, np.inf).min(1)


def run(tree, f3, o, d, mode):
    """Scalar-ish per-ray traversal. mode in {'alternating','descent_first'}."""
    W = tree.shape[1] // 8
    w3 = 3 * W
    n = len(o)
    inv = 1.0 / np.where(np.abs(d) > 1e-20, d, 1e-20)
    visits = np.zeros(n, np.int64)
    tests = np.zeros(n, np.int64)
    max_groups = np.zeros(n, np.int64)

    for i in range(n):
        best = np.inf
        stack = [(0, (1 << W) - 1)]
        groups = []  # (enter_t, row, mask-of-leaf-children)
        while stack or groups:
            # in alternating mode: drain any group whose bound beats best
            # IMMEDIATELY (nearest first) before descending further;
            # in descent-first: only drain once the stack is empty.
            if groups and (not stack or mode == "alternating"):
                groups.sort()
                g_t, row, lmask = groups.pop(0)
                if g_t >= best:
                    groups = [g for g in groups if g[0] < best]
                    continue
                # test the nearest child of this group, push back the rest
                rw = tree[row]
                t1 = (rw[0:w3].reshape(3, W) - o[i][:, None]) * inv[i][:, None]
                t2 = (rw[w3:2*w3].reshape(3, W) - o[i][:, None]) * inv[i][:, None]
                lo = np.minimum(t1, t2); hi = np.maximum(t1, t2)
                enter = np.nan_to_num(lo, nan=-np.inf).max(0)
                exit_ = np.nan_to_num(hi, nan=np.inf).min(0)
                ptr = rw[6*W:7*W].astype(np.int64)
                in_mask = ((lmask >> np.arange(W)) & 1) == 1
                ok = (enter <= exit_) & (exit_ >= 1e-4) & (enter < best) & in_mask
                if not ok.any():
                    continue
                order = np.argsort(np.where(ok, enter, np.inf))
                c = order[0]
                tests[i] += 1
                tt = tri_test(f3, ptr[c:c+1], o[i:i+1], d[i:i+1], np.array([best]))
                best = min(best, tt[0])
                rest = ok.copy(); rest[c] = False
                if rest.any():
                    groups.append((enter[rest].min(), row, int((rest * (1 << np.arange(W))).sum())))
                continue
            if not stack:
                break
            row, mask = stack.pop()
            visits[i] += 1
            rw = tree[row]
            t1 = (rw[0:w3].reshape(3, W) - o[i][:, None]) * inv[i][:, None]
            t2 = (rw[w3:2*w3].reshape(3, W) - o[i][:, None]) * inv[i][:, None]
            lo = np.minimum(t1, t2); hi = np.maximum(t1, t2)
            enter = np.nan_to_num(lo, nan=-np.inf).max(0)
            exit_ = np.nan_to_num(hi, nan=np.inf).min(0)
            ptr = rw[6*W:7*W].astype(np.int64)
            meta = rw[7*W:8*W]
            in_mask = ((mask >> np.arange(W)) & 1) == 1
            hit = (enter <= exit_) & (exit_ >= 1e-4) & (enter < best) & (meta >= 0) & in_mask
            leaf = hit & (meta > 0)
            internal = hit & (meta == 0)
            if leaf.any():
                groups.append((enter[leaf].min(), row, int((leaf * (1 << np.arange(W))).sum())))
                max_groups[i] = max(max_groups[i], len(groups))
            # descend near-first: push internals far-to-near
            order = np.argsort(-np.where(internal, enter, -np.inf))
            for c in order:
                if internal[c]:
                    stack.append((int(ptr[c]), (1 << W) - 1))
        # drain leftovers in descent_first handled by loop above
    return visits, tests, max_groups


def main():
    scene = bench.build_scene().compile()
    tables = scene.tables
    ct = tables["clusters"]
    tree = np.asarray(ct.tree, np.float64)
    fat = np.asarray(ct.fat, np.float64)
    f3 = fat.reshape(fat.shape[0], 10, -1)
    o, d, ok = get_l1(scene, tables, 0)
    rng = np.random.default_rng(0)
    live = np.nonzero(ok)[0]
    sel = rng.choice(live, 2000, replace=False)
    o = o[sel].astype(np.float64)
    d = d[sel].astype(np.float64)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    for mode in ("alternating", "descent_first"):
        t0 = time.time()
        visits, tests, mg = run(tree, f3, o, d, mode)
        print(f"{mode:14s}: visits mean {visits.mean():.1f} p99 "
              f"{np.percentile(visits, 99):.0f} max {visits.max()}; "
              f"tests mean {tests.mean():.2f} p99 {np.percentile(tests, 99):.0f} "
              f"max {tests.max()}; groups max-occupancy mean {mg.mean():.1f} "
              f"p99 {np.percentile(mg, 99):.0f} max {mg.max()}  [{time.time()-t0:.0f}s]")


if __name__ == "__main__":
    main()
