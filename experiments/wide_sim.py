"""Predict deferred-traversal cost for wide-tree widths 8/16/32 on the
real L1 bounce wavefront, by host simulation.

Counts per-ray node visits (fetch lower bound) AND per-ray PHASES needed
under the burst semantics (DESCENT_STEPS node steps per phase, buffer of
CAND_SLOTS groups, TEST_ROUNDS fat tests per phase). Total device cost ~
sum(lane_phases) / W  *  per-phase ms, so mean lane-phases is the number
to minimize.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")


def simulate_wide(tree, wide, o, d, t_min, fat, D, T, SLOTS, n_sub=8192,
                  seed=0):
    rng = np.random.default_rng(seed)
    sel = rng.choice(len(o), n_sub, replace=False)
    o = o[sel].astype(np.float64)
    d = d[sel].astype(np.float64)
    d /= np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-20)
    inv = 1.0 / np.where(np.abs(d) > 1e-20, d, 1e-20)
    n = n_sub
    W3 = 3 * wide

    f3 = fat.reshape(fat.shape[0], 10, -1).astype(np.float64)

    full = (1 << wide) - 1
    cur = np.full(n, full, np.int64)  # row 0, full mask
    sp = np.zeros(n, np.int64)
    stack = np.zeros((n, 64), np.int64)
    best = np.full(n, np.inf)
    visits = np.zeros(n, np.int64)
    tests = np.zeros(n, np.int64)
    phases = np.zeros(n, np.int64)
    cand_t = np.full((n, SLOTS), np.inf)
    cand_id = np.zeros((n, SLOTS), np.int64)

    def row_test(act, cur_act, cutoff):
        row = tree[cur_act >> wide]
        mask = cur_act & full
        oW = np.repeat(o[act], wide, axis=1)
        ivW = np.repeat(inv[act], wide, axis=1)
        t1 = (row[:, 0:W3] - oW) * ivW
        t2 = (row[:, W3 : 2 * W3] - oW) * ivW
        lo = np.minimum(t1, t2)
        hi = np.maximum(t1, t2)
        enter = np.nan_to_num(lo, nan=-np.inf).reshape(-1, 3, wide).max(1)
        exit_ = np.nan_to_num(hi, nan=np.inf).reshape(-1, 3, wide).min(1)
        ptr = row[:, 6 * wide : 7 * wide].astype(np.int64)
        meta = row[:, 7 * wide : 8 * wide]
        in_mask = ((mask[:, None] >> np.arange(wide)[None, :]) & 1) == 1
        hit = (
            (enter <= exit_) & (exit_ >= t_min)
            & (enter <= cutoff[:, None]) & (meta >= 0) & in_mask
        )
        return enter, ptr, meta, hit

    def test_cluster(lanes, cids):
        nonlocal best
        tests[lanes] += 1
        v1 = f3[cids, 0:3].transpose(0, 2, 1)
        e1 = f3[cids, 3:6].transpose(0, 2, 1)
        e2 = f3[cids, 6:9].transpose(0, 2, 1)
        oo = o[lanes][:, None, :]
        dd = d[lanes][:, None, :]
        pn = np.cross(e1, e2)
        pn /= np.maximum(np.linalg.norm(pn, axis=2, keepdims=True), 1e-30)
        cosine = (pn * dd).sum(2)
        t = (pn * (v1 - oo)).sum(2) / np.where(np.abs(cosine) < 1e-12, 1e-12, cosine)
        ok = (np.abs(cosine) >= 1e-8) & (t >= t_min) & (t < best[lanes][:, None])
        p = oo + dd * t[:, :, None]
        d2 = p - v1
        d00 = (e1 * e1).sum(2)
        d01 = (e1 * e2).sum(2)
        d11 = (e2 * e2).sum(2)
        d20 = (d2 * e1).sum(2)
        d21 = (d2 * e2).sum(2)
        den = d00 * d11 - d01 * d01
        den = np.where(np.abs(den) < 1e-30, 1e-30, den)
        v = (d11 * d20 - d01 * d21) / den
        w = (d00 * d21 - d01 * d20) / den
        ok &= (v >= 0) & (w >= 0) & (1.0 - v - w >= 0)
        tt = np.where(ok, t, np.inf).min(1)
        best[lanes] = np.minimum(best[lanes], tt)

    outer = 0
    while True:
        outer += 1
        if outer > 10000:
            raise RuntimeError("no convergence")
        pend = (cur >= 0) | (cand_t < np.inf).any(1)
        if not pend.any():
            break
        phases[pend] += 1

        # ---- descent burst: D steps ---------------------------------
        for _ in range(D):
            n_cand = (cand_t < np.inf).sum(1)
            act_m = (cur >= 0) & (n_cand < SLOTS) & pend
            act = np.nonzero(act_m)[0]
            if len(act) == 0:
                break
            visits[act] += 1
            enter, ptr, meta, hit = row_test(act, cur[act], best[act])
            is_leaf = hit & (meta > 0)
            any_leaf = is_leaf.any(1)
            g_t = np.where(is_leaf, enter, np.inf).min(1)
            g_bits = (is_leaf * (1 << np.arange(wide))[None, :]).sum(1)
            g_id = ((cur[act] >> wide) << wide) | g_bits
            slot = n_cand[act]
            put = any_leaf
            cand_t[act[put], slot[put]] = np.maximum(g_t[put], t_min)
            cand_id[act[put], slot[put]] = g_id[put]

            int_hit = hit & (meta == 0)
            ei = np.where(int_hit, enter, np.inf)
            ni = np.argmin(ei, axis=1)
            has_int = int_hit.any(1)
            rows_i = np.arange(len(act))
            nxt = ptr[rows_i, ni]
            rest = (int_hit * (1 << np.arange(wide))[None, :]).sum(1)
            rest = np.where(has_int, rest & ~(1 << ni), rest)
            entry = ((cur[act] >> wide) << wide) | rest
            do_push = rest != 0
            stack[act[do_push], sp[act[do_push]]] = entry[do_push]
            sp[act] += do_push
            newcur = np.where(has_int, (nxt << wide) | full, -1)
            popping = ~has_int & (sp[act] > 0)
            sp_idx = sp[act] - 1
            newcur[popping] = stack[act[popping], sp_idx[popping]]
            sp[act[popping]] -= 1
            cur[act] = newcur

        # ---- test burst: T rounds -----------------------------------
        for _ in range(T):
            keep = cand_t < np.minimum(best, np.inf)[:, None]
            cand_t[~keep] = np.inf
            has = (cand_t < np.inf).any(1) & pend
            act = np.nonzero(has)[0]
            if len(act) == 0:
                break
            si = np.argmin(cand_t[act], axis=1)
            entry = cand_id[act, si]
            enter, ptr, meta, hit = row_test(act, entry, best[act])
            leaf = hit & (meta > 0)
            ei = np.where(leaf, enter, np.inf)
            ci = np.argmin(ei, axis=1)
            rows_i = np.arange(len(act))
            got = leaf[rows_i, ci]
            cid = ptr[rows_i, ci]
            if got.any():
                test_cluster(act[got], cid[got])
            rest = (leaf * (1 << np.arange(wide))[None, :]).sum(1)
            rest = np.where(got, rest & ~(1 << ci), rest)
            rest_t = np.where(
                leaf & (np.arange(wide)[None, :] != ci[:, None]), enter, np.inf
            ).min(1)
            cand_t[act, si] = np.where(rest != 0, np.maximum(rest_t, t_min), np.inf)
            cand_id[act, si] = ((entry >> wide) << wide) | rest

    return visits, tests, phases, best


def main():
    import jax.numpy as jnp

    from batch_scaling import get_l1
    from rpt_tpu.accel.clusters import pack_wide_cluster_tree
    import bench

    scene = bench.build_scene().compile()
    tables = scene.tables
    ct = tables["clusters"]
    o, d, ok = get_l1(scene, tables, 0)
    oL, dL = o[ok], d[ok]
    fat = np.asarray(ct.fat)

    # rebuild cluster AABBs from the fat rows (exact enough for packing)
    f3 = fat.reshape(fat.shape[0], 10, -1)
    nc = ct.n_clusters
    v1 = f3[:nc, 0:3].transpose(0, 2, 1)
    ids = f3[:nc, 9]
    p2 = v1 + f3[:nc, 3:6].transpose(0, 2, 1)
    p3 = v1 + f3[:nc, 6:9].transpose(0, 2, 1)
    pts = np.concatenate([v1, p2, p3], axis=1)
    mask = np.repeat(ids >= 0, 3, axis=0).reshape(nc, -1)
    pts = np.where(mask[:, :, None], pts, np.nan)
    bb_lo = np.nanmin(pts, axis=1)
    bb_hi = np.nanmax(pts, axis=1)
    tri_counts = (ids >= 0).sum(1)

    t_min = scene.t_min
    gold = None
    for wide, D, T, SLOTS in [
        (8, 12, 4, 6),
        (16, 12, 4, 6),
        (16, 8, 4, 6),
        (16, 8, 6, 10),
        (32, 8, 6, 10),
        (8, 12, 8, 10),
    ]:
        t0 = time.time()
        tree, depth, _top = pack_wide_cluster_tree(bb_lo, bb_hi, tri_counts, wide=wide)
        visits, tests, phases, best = simulate_wide(
            tree.astype(np.float64), wide, oL, dL, t_min, fat, D, T, SLOTS
        )
        if gold is None:
            gold = best
        agree = np.isclose(best, gold, rtol=1e-5, atol=1e-9) | (
            np.isinf(best) & np.isinf(gold)
        )
        print(
            f"wide={wide:2d} D={D:2d} T={T} SLOTS={SLOTS:2d} rows={len(tree):5d} "
            f"depth={depth:2d} | visits mean {visits.mean():5.1f} p99 "
            f"{np.percentile(visits, 99):4.0f} | tests mean {tests.mean():4.1f} "
            f"| phases mean {phases.mean():5.2f} p99 {np.percentile(phases, 99):3.0f} "
            f"max {phases.max():3d} | agree {agree.mean()*100:.2f}% "
            f"({time.time()-t0:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
