"""Count UNPRUNED Phase-A candidates per ray on the real dragon L1
bounce wavefront, to decide the 'one-shot sorted pair drain' idea:

Phase B today drains candidates ITERATIVELY (test nearest, tighten
best, prune the rest): 2.83 fat tests/ray mean, but each test round
also refetches a wide row (12 ns) and pays a ~0.4 ms per-round fixed
cost. The alternative: emit ALL candidate (ray, cluster) pairs from
Phase A, sort by cluster id, and test every pair in ONE pass (fat rows
fetched in sorted order, no rounds, no refetches, no pruning).

Cost model (PERF.md): one-shot = cands * 50 ns/pair; iterative =
tests * (50 + 12) ns + rounds * fixed. One-shot wins only if the
unpruned candidate count is within ~1.3x of the pruned test count —
this script measures that ratio. Box-only pruning during descent means
candidates = every leaf child whose slab test passes with best = inf.
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import bench
from batch_scaling import get_l1
from descent_first_sim import run


def count_candidates(tree, o, d):
    """Per-ray count of leaf children passing the slab test under
    box-only descent (best = inf), i.e. the one-shot pair count."""
    W = tree.shape[1] // 8
    w3 = 3 * W
    n = len(o)
    inv = 1.0 / np.where(np.abs(d) > 1e-20, d, 1e-20)
    cands = np.zeros(n, np.int64)
    for i in range(n):
        stack = [0]
        while stack:
            row = stack.pop()
            rw = tree[row]
            t1 = (rw[0:w3].reshape(3, W) - o[i][:, None]) * inv[i][:, None]
            t2 = (rw[w3:2*w3].reshape(3, W) - o[i][:, None]) * inv[i][:, None]
            lo = np.minimum(t1, t2)
            hi = np.maximum(t1, t2)
            enter = np.nan_to_num(lo, nan=-np.inf).max(0)
            exit_ = np.nan_to_num(hi, nan=np.inf).min(0)
            ptr = rw[6*W:7*W].astype(np.int64)
            meta = rw[7*W:8*W]
            hit = (enter <= exit_) & (exit_ >= 1e-4) & (meta >= 0)
            cands[i] += int((hit & (meta > 0)).sum())
            for c in np.nonzero(hit & (meta == 0))[0]:
                stack.append(int(ptr[c]))
    return cands


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

    t0 = time.time()
    cands = count_candidates(tree, o, d)
    _, tests, _ = run(tree, f3, o, d, "descent_first")
    one_shot = cands * 50.0
    iterative = tests * 62.0  # + per-round fixed costs not modelled
    print(
        f"cands/ray mean {cands.mean():.2f} p99 {np.percentile(cands, 99):.0f} "
        f"max {cands.max()}; pruned tests mean {tests.mean():.2f}; "
        f"ratio {cands.mean() / max(tests.mean(), 1e-9):.2f}; modelled "
        f"one-shot {one_shot.mean():.0f} ns/ray vs iterative "
        f"{iterative.mean():.0f} ns/ray (+fixed)  [{time.time()-t0:.0f}s]",
        flush=True,
    )


if __name__ == "__main__":
    main()
