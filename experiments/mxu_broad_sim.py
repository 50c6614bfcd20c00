"""Decide the round-4 MXU broad-phase lever (PERF.md "paths forward"):
replace the deferred traversal's Phase A (wide-tree descent — ~5-10
dependent <=512 B gather rounds per lane) with ONE dense ray x
quarter-sphere cull on the MXU (free FLOPs, no gathers), seeding the
candidate buffer directly with hit quarters (16 consecutive clusters
each, entry-ordered), then draining phase-B style: per round gather the
quarter's 16 cluster spheres (256 B supq row), fat-test the nearest
surviving cluster, clear its bit.

Host numpy simulation on the REAL dragon L1 bounce wavefront. Reports,
per ray, for the same rays:

  tree (descent-first, current engine's arithmetic):
    visits  = wide-row gathers in Phase A
    tests   = fat-row gathers in Phase B (each round also refetches a
              wide row -> 2 gathers/round)
  mxu (dense quarter cull + sphere drain):
    qhits   = quarter spheres hit at seed time (cand-buffer / top-K
              selection pressure; K=CAND_SLOTS=16)
    rounds  = drain rounds (1 supq gather each)
    tests   = fat-row gathers (subset of rounds with a surviving cluster)
    resolved(K) = would the lane finish with only the K nearest quarters
              kept (final best <= K+1-th quarter entry)? Unresolved lanes
              must fall back to the tree in cleanup.

Decision rule (gather-issue cost model, PERF.md: every <=2.5 KB row
fetch costs ~the same ~12 ns/lane; dense MXU pass ~free): the MXU path
wins if  rounds + tests  <  visits + 2*tests_tree  by enough to cover
the dense pass + top-K selection (~2-6 ms/wavefront), and resolved(16)
is ~1 (fallback lanes pay both paths).
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import numpy as np

from descent_first_sim import run as tree_run, tri_test


QUARTER = int(__import__("os").environ.get("MXU_SIM_QUARTER", "16"))
# clusters per dense-cull column (one supq row); sweepable via env


def quarter_spheres(sph, n_clusters):
    """Bounding spheres of groups of 16 consecutive cluster spheres
    (tree order = spatially coherent). Padding quarters never hit."""
    c = n_clusters
    q = -(-c // QUARTER)
    qs = np.full((q, 4), 0.0)
    qs[:, 0:3] = 1e30
    for qi in range(q):
        seg = sph[qi * QUARTER : min((qi + 1) * QUARTER, c)].astype(np.float64)
        lo = (seg[:, 0:3] - seg[:, 3:4]).min(0)
        hi = (seg[:, 0:3] + seg[:, 3:4]).max(0)
        center = 0.5 * (lo + hi)
        rad = (np.linalg.norm(seg[:, 0:3] - center, axis=1) + seg[:, 3]).max()
        qs[qi, 0:3] = center
        qs[qi, 3] = rad
    return qs


def sphere_entry(o, d, sph, t_min=1e-4):
    """Per-sphere entry distance of ray (o, unit d); inf if missed.
    Vector over spheres for ONE ray."""
    m = sph[:, 0:3] - o[None, :]
    tca = m @ d
    d2 = (m * m).sum(1) - tca * tca
    r2 = sph[:, 3] ** 2
    ok = d2 <= r2
    thc = np.sqrt(np.maximum(r2 - d2, 0.0))
    enter = tca - thc
    exit_ = tca + thc
    ok &= exit_ >= t_min
    return np.where(ok, np.maximum(enter, t_min), np.inf)


def mxu_run(f3, sph, qsph, o, d, n_clusters, k_keep=16):
    n = len(o)
    qhits = np.zeros(n, np.int64)
    rounds = np.zeros(n, np.int64)
    tests = np.zeros(n, np.int64)
    resolved = np.zeros(n, bool)
    best_out = np.full(n, np.inf)
    nq = len(qsph)
    for i in range(n):
        qe = sphere_entry(o[i], d[i], qsph)
        hit_q = np.isfinite(qe)
        qhits[i] = hit_q.sum()
        order = np.argsort(qe)
        best = np.inf
        # drain ALL hit quarters nearest-first (exact-path behavior);
        # resolved(K) is evaluated afterwards against the K+1-th entry
        for qi in order:
            if not np.isfinite(qe[qi]) or qe[qi] >= best:
                break
            rounds[i] += 1
            lo = qi * QUARTER
            hi_c = min(lo + QUARTER, n_clusters)
            ce = sphere_entry(o[i], d[i], sph[lo:hi_c].astype(np.float64))
            # drain this quarter's clusters nearest-first with pruning
            for ci in np.argsort(ce):
                if not np.isfinite(ce[ci]) or ce[ci] >= best:
                    break
                tests[i] += 1
                tt = tri_test(
                    f3, np.array([lo + ci]), o[i : i + 1], d[i : i + 1],
                    np.array([best]),
                )
                best = min(best, tt[0])
        best_out[i] = best
        e_rest = np.sort(qe)[k_keep] if nq > k_keep else np.inf
        resolved[i] = (qhits[i] <= k_keep) or (best <= e_rest)
    return qhits, rounds, tests, resolved, best_out


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import bench
    from batch_scaling import get_l1

    scene = bench.build_scene().compile()
    tables = scene.tables
    ct = tables["clusters"]
    tree = np.asarray(ct.tree, np.float64)
    fat = np.asarray(ct.fat, np.float64)
    f3 = fat.reshape(fat.shape[0], 10, -1)
    sph = np.asarray(ct.sph)
    n_clusters = ct.n_clusters
    qsph = quarter_spheres(sph, n_clusters)
    nq_real = -(-n_clusters // QUARTER)
    print(f"clusters {n_clusters}, quarters {nq_real}, "
          f"supers {len(np.asarray(ct.sup))}", flush=True)

    o, dmat, ok = get_l1(scene, tables, 0)
    rng = np.random.default_rng(0)
    live = np.nonzero(ok)[0]
    sel = rng.choice(live, 2000, replace=False)
    o = o[sel].astype(np.float64)
    d = dmat[sel].astype(np.float64)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    print("wavefront derived", flush=True)

    t0 = time.time()
    visits, tests_t, mg = tree_run(tree, f3, o, d, "descent_first")
    print(
        f"tree : visits mean {visits.mean():.1f} p99 {np.percentile(visits, 99):.0f} "
        f"max {visits.max()}; fat tests mean {tests_t.mean():.2f} p99 "
        f"{np.percentile(tests_t, 99):.0f} max {tests_t.max()}; "
        f"gathers/ray mean {(visits + 2 * tests_t).mean():.1f}  "
        f"[{time.time() - t0:.0f}s]",
        flush=True,
    )

    t0 = time.time()
    qhits, rounds, tests_m, resolved, best_m = mxu_run(
        f3, sph, qsph, o, d, n_clusters
    )
    print(
        f"mxu  : qhits mean {qhits.mean():.1f} p99 {np.percentile(qhits, 99):.0f} "
        f"max {qhits.max()}; rounds mean {rounds.mean():.2f} p99 "
        f"{np.percentile(rounds, 99):.0f} max {rounds.max()}; fat tests mean "
        f"{tests_m.mean():.2f} p99 {np.percentile(tests_m, 99):.0f} max "
        f"{tests_m.max()}; gathers/ray mean {(rounds + tests_m).mean():.1f}; "
        f"resolved(16) {resolved.mean() * 100:.1f}%  [{time.time() - t0:.0f}s]",
        flush=True,
    )

    # sanity: sphere-path best must equal a brute all-cluster sweep
    sub = rng.choice(len(o), 100, replace=False)
    mism = 0
    for i in sub:
        bb = np.inf
        for c0 in range(0, n_clusters, 256):
            cids = np.arange(c0, min(c0 + 256, n_clusters))
            tt = tri_test(f3, cids, o[i : i + 1].repeat(len(cids), 0),
                          d[i : i + 1].repeat(len(cids), 0),
                          np.full(len(cids), np.inf))
            bb = min(bb, tt.min())
        if not (np.isclose(bb, best_m[i], rtol=1e-9) or (bb == best_m[i])):
            mism += 1
    hit_m = np.isfinite(best_m)
    print(f"mxu hit-rate {hit_m.mean() * 100:.1f}%; brute mismatches "
          f"{mism}/100", flush=True)


if __name__ == "__main__":
    main()
