"""Deferred-leaf wide-tree traversal — the INCOHERENT-wavefront path.

Replaces the tri-level short-stack fallback (``intersect._traverse``) for
big meshes. Rationale (measured, PERF.md "incoherent-wavefront wall"):

* XLA's random row gather issues at ~90 Mrows/s for ANY row width up to
  512 B, so traversal cost is the NUMBER of fetches, not bytes. The
  tri-leaf tree fetches one 64 B node row + up to TWO 320 B leaf rows per
  step at full wavefront width (682 ms bounce wavefront), and a binary
  cluster tree still averages ~25 node visits per bounce ray (measured,
  experiments/deferred_diag.py — fat cluster boxes prune weakly).
* An 8-ary cluster tree (``accel.clusters.pack_wide_cluster_tree``)
  collapses 3 binary levels into one 256 B row that costs the SAME to
  fetch — cutting node fetches and the slow-lane tail ~2-3x.

Design:

1. **Descent bursts** walk the 8-ary tree. The cursor and every stack /
   candidate entry is ONE packed int32 ``row_id << 8 | child_mask``, so
   a step does exactly one 256 B gather, at most one one-hot stack push
   (the non-nearest internal hits, as a mask), and at most one one-hot
   candidate append (ALL leaf hits of the row, as a group). Leaf rows
   are never fetched during descent.
2. **Test bursts** drain the buffers: each round a pending lane re-derives
   its nearest candidate group's child bounds (256 B refetch), tests the
   nearest surviving cluster's fat 2.5 KB row densely, and clears that
   child bit. Groups whose entry bound can no longer beat the lane's
   best are dropped unexamined; any-hit lanes stop at the first hit.

Bursts alternate over compacted batches (masked gathers cost full width,
so phases run on the first W pending-sorted lanes — adapting from the
2%-pending post-tile finisher to fully-incoherent wavefronts). Exact:
every reachable cluster is tested or provably pruned.

Reference analog: the ordered kd descent with t-pruning
(`/root/reference/src/kdtree.rs:154-226`); the wide-node deferral/burst
structure is TPU-specific.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .accel.clusters import ClusterTables
from .dtypes import DTYPE, INF
from .ray import Ray
from .tiled import _recover_hit, _tile_tri_test
from .vec import Vec3

# measured on the 262k-lane dragon bounce wavefront (experiments/
# step_cost.py): a traversal step costs ~0.43 ms FIXED + ~2.6 ns/lane,
# while a fat test round costs ~50 ns/lane — so descent phases run at
# FULL wavefront width (in place, no state swap) and test bursts run on
# narrow compacted batches of candidate-holding lanes
import os

CAND_SLOTS = int(os.environ.get("RPT_TPU_CAND_SLOTS", "6"))  # per-lane candidate buffer
DESCENT_STEPS = int(os.environ.get("RPT_TPU_DESCENT_STEPS", "6"))  # steps per descent burst
TEST_ROUNDS = int(os.environ.get("RPT_TPU_TEST_ROUNDS", "3"))  # fat rounds per test burst
LADDER_DIV = 8  # stage compaction ratio once the pending tail fits
TEST_DIV = 4  # test-batch width = stage width / TEST_DIV


def _tree_wide(tree) -> int:
    """Children per wide-tree row, inferred from the static row width
    (rows are [mins 3W][maxs 3W][ptr W][meta W] = 8W floats)."""
    return tree.shape[1] // 8


def _wide_row_test(tree, row_id, mask_bits, o3w, inv3w, t_min, cutoff, live):
    """Fetch one wide row per lane and slab-test its W children.

    Returns (enter, ptr, meta, hit) as (n, W) arrays; ``hit`` respects
    ``mask_bits`` (packed child subset) and the per-lane ``cutoff``."""
    n = row_id.shape[0]
    wide = _tree_wide(tree)
    w3 = 3 * wide
    row = jnp.take(tree, jnp.maximum(row_id, 0), axis=0)
    t1 = (row[:, 0:w3] - o3w) * inv3w
    t2 = (row[:, w3 : 2 * w3] - o3w) * inv3w
    lo = jnp.minimum(t1, t2)
    hi = jnp.maximum(t1, t2)
    lo = jnp.where(jnp.isnan(lo), -INF, lo)
    hi = jnp.where(jnp.isnan(hi), INF, hi)
    enter = lo.reshape(n, 3, wide).max(1)  # (n, W)
    exit_ = hi.reshape(n, 3, wide).min(1)
    ptr = row[:, 6 * wide : 7 * wide].astype(jnp.int32)
    meta = row[:, 7 * wide : 8 * wide].astype(jnp.int32)
    slot8 = jax.lax.broadcasted_iota(jnp.int32, (n, wide), 1)
    in_mask = ((mask_bits[:, None] >> slot8) & 1) == 1
    hit = (
        (enter <= exit_)
        & (exit_ >= t_min)
        & (enter <= cutoff[:, None])
        & (meta >= 0)
        & in_mask
        & live[:, None]
    )
    return enter, ptr, meta, hit, slot8


def _descent_burst(tree, ray, inv_dir, t_min, limit_u, state, max_steps):
    """Up to ``max_steps`` wide-node steps; lanes with full buffers or
    finished descent idle. One <=512 B gather per step, no leaf reads."""
    n = ray.origin.shape[0]
    wide = _tree_wide(tree)
    full = (1 << wide) - 1
    depth = state[2].shape[1]
    depth_iota = jax.lax.broadcasted_iota(jnp.int32, (n, depth), 1)
    cslot_iota = jax.lax.broadcasted_iota(jnp.int32, (n, CAND_SLOTS), 1)
    # slab blocks are [x*W][y*W][z*W] — build o3w/inv3w the same way
    o3w = jnp.concatenate(
        [jnp.repeat(ray.origin.to_array()[:, i : i + 1], wide, axis=1) for i in range(3)],
        axis=1,
    )
    inv3w = jnp.concatenate(
        [jnp.repeat(inv_dir.to_array()[:, i : i + 1], wide, axis=1) for i in range(3)],
        axis=1,
    )

    def step(carry):
        state, i = carry
        cur, sp, stack, best_u, pack, cand_t, cand_id, done = state
        n_cand = jnp.sum(cand_t < INF, axis=1)
        active = (cur >= 0) & (n_cand < CAND_SLOTS) & ~done
        row_id = cur >> wide
        mask = cur & full
        cutoff = jnp.minimum(best_u, limit_u)
        enter, ptr, meta, hit, slot8 = _wide_row_test(
            tree, row_id, mask, o3w, inv3w, t_min, cutoff, active
        )

        # ---- candidate group append (all leaf hits, one slot) ----------
        # Append at the FIRST FREE slot, not at index n_cand: test-burst
        # prune/drain INF-out slots mid-buffer, so finite entries need not
        # form a prefix — appending at the count would overwrite a live
        # group and silently drop its clusters. The active gate
        # (n_cand < CAND_SLOTS) guarantees a free slot exists.
        leaf_hit = hit & (meta > 0)
        any_leaf = jnp.any(leaf_hit, axis=1)
        g_t = jnp.maximum(jnp.min(jnp.where(leaf_hit, enter, INF), axis=1), t_min)
        g_bits = jnp.sum(jnp.where(leaf_hit, 1 << slot8, 0), axis=1)
        g_id = (row_id << wide) | g_bits
        free = jnp.argmax(cand_t >= INF, axis=1).astype(jnp.int32)
        at = (cslot_iota == free[:, None]) & any_leaf[:, None]
        cand_t = jnp.where(at, g_t[:, None], cand_t)
        cand_id = jnp.where(at, g_id[:, None], cand_id)

        # ---- internal children: descend nearest, push the rest --------
        int_hit = hit & (meta == 0)
        ei = jnp.where(int_hit, enter, INF)
        ni = jnp.argmin(ei, axis=1).astype(jnp.int32)
        has_int = jnp.any(int_hit, axis=1)
        next_ptr = jnp.sum(jnp.where(slot8 == ni[:, None], ptr, 0), axis=1)
        rest_bits = jnp.sum(jnp.where(int_hit, 1 << slot8, 0), axis=1) & ~(
            jnp.where(has_int, 1 << ni, 0)
        )
        push_entry = (row_id << wide) | rest_bits
        do_push = active & (rest_bits != 0) & (sp < depth)
        at_sp = depth_iota == jnp.minimum(sp, depth - 1)[:, None]
        stack = jnp.where(at_sp & do_push[:, None], push_entry[:, None], stack)
        sp_after = sp + do_push

        do_pop = active & ~has_int
        at_top = depth_iota == (sp_after - 1)[:, None]
        popped = jnp.sum(jnp.where(at_top, stack, 0), axis=1)
        pop_ok = (sp_after > 0) & (sp_after <= depth)
        new_cur = jnp.where(
            ~active, cur,
            jnp.where(
                has_int, (next_ptr << wide) | full,
                jnp.where(pop_ok, popped, -1),
            ),
        )
        new_sp = jnp.where(do_pop, jnp.maximum(sp_after - 1, 0), sp_after)
        return (new_cur, new_sp, stack, best_u, pack, cand_t, cand_id, done), i + 1

    def cond(carry):
        state, i = carry
        cur, _, _, _, _, cand_t, _, done = state
        n_cand = jnp.sum(cand_t < INF, axis=1)
        can = (cur >= 0) & (n_cand < CAND_SLOTS) & ~done
        return jnp.any(can) & (i < max_steps)

    (state, _) = jax.lax.while_loop(cond, step, (state, jnp.int32(0)))
    return state


def _test_burst(ct: ClusterTables, ray, dn, inv_dir, t_min, limit_u, state,
                any_hit: bool, rounds: int | None = None):
    """Drain candidate-group buffers: per round each pending lane
    re-derives its nearest group's child bounds, tests the nearest
    surviving cluster's fat row, and clears that child bit."""
    rounds = TEST_ROUNDS if rounds is None else rounds
    n = ray.origin.shape[0]
    wide = _tree_wide(ct.tree)
    full = (1 << wide) - 1
    o1 = Vec3(ray.origin.x[:, None], ray.origin.y[:, None], ray.origin.z[:, None])
    d1 = Vec3(dn.x[:, None], dn.y[:, None], dn.z[:, None])
    cslot_iota = jax.lax.broadcasted_iota(jnp.int32, (n, CAND_SLOTS), 1)
    o3w = jnp.concatenate(
        [jnp.repeat(ray.origin.to_array()[:, i : i + 1], wide, axis=1) for i in range(3)],
        axis=1,
    )
    inv3w = jnp.concatenate(
        [jnp.repeat(inv_dir.to_array()[:, i : i + 1], wide, axis=1) for i in range(3)],
        axis=1,
    )

    def prune(state):
        cur, sp, stack, best_u, pack, cand_t, cand_id, done = state
        cutoff = jnp.minimum(best_u, limit_u)
        keep = cand_t < cutoff[:, None]
        if any_hit:
            keep &= ~(best_u < limit_u)[:, None]
        cand_t = jnp.where(keep, cand_t, INF)
        return (cur, sp, stack, best_u, pack, cand_t, cand_id, done)

    def step(state):
        state = prune(state)
        cur, sp, stack, best_u, pack, cand_t, cand_id, done = state
        sel_t = jnp.min(cand_t, axis=1)
        sel_i = jnp.argmin(cand_t, axis=1).astype(jnp.int32)
        at_sel = cslot_iota == sel_i[:, None]
        test = (sel_t < INF) & ~done
        entry = jnp.sum(jnp.where(at_sel, cand_id, 0), axis=1)
        row_id = entry >> wide
        lmask = entry & full
        cutoff = jnp.minimum(best_u, limit_u)
        enter, ptr, meta, hit, slot8 = _wide_row_test(
            ct.tree, row_id, lmask, o3w, inv3w, t_min, cutoff, test
        )
        ei = jnp.where(hit, enter, INF)
        ci = jnp.argmin(ei, axis=1).astype(jnp.int32)
        has = jnp.any(hit, axis=1)
        cid = jnp.sum(jnp.where(slot8 == ci[:, None], ptr, 0), axis=1)

        fat_rows = jnp.take(ct.fat, jnp.where(has, cid, 0), axis=0)
        best1, pack1 = _tile_tri_test(
            fat_rows, o1, d1, t_min, limit_u[:, None], best_u[:, None],
            pack[:, None], cid, has[:, None],
        )
        best_u = best1[:, 0]
        pack = pack1[:, 0]

        # clear the tested child; group bound = min enter of the rest
        rest = jnp.sum(jnp.where(hit, 1 << slot8, 0), axis=1) & ~(
            jnp.where(has, 1 << ci, 0)
        )
        rest_t = jnp.min(
            jnp.where(hit & (slot8 != ci[:, None]), enter, INF), axis=1
        )
        new_t = jnp.where(rest != 0, jnp.maximum(rest_t, t_min), INF)
        new_id = (row_id << wide) | rest
        upd = test[:, None] & at_sel
        cand_t = jnp.where(upd, new_t[:, None], cand_t)
        cand_id = jnp.where(upd, new_id[:, None], cand_id)
        return (cur, sp, stack, best_u, pack, cand_t, cand_id, done)

    def cond(carry):
        state, i = carry
        cand_t = state[5]
        best_u, done = state[3], state[7]
        cutoff = jnp.minimum(best_u, limit_u)
        pend = jnp.any(cand_t < cutoff[:, None], axis=1) & ~done
        if any_hit:
            pend &= ~(best_u < limit_u)
        return jnp.any(pend) & (i < rounds)

    state, _ = jax.lax.while_loop(
        cond, lambda c: (step(c[0]), c[1] + 1), (state, jnp.int32(0))
    )
    return prune(state)


def deferred_traverse(ct: ClusterTables, ray: Ray, t_min, limit, best_time,
                      any_hit: bool, active=None):
    """Exact closest-hit / any-hit over the fat-cluster tables via the
    8-ary cluster tree. Returns (time, tri, u, v, w) in the caller's raw
    parametrization; lanes outside ``active`` (or that can't improve)
    return their input ``best_time`` untouched."""
    n = ray.origin.shape[0]
    dlen = ray.dir.length()
    safe = dlen > 0.0
    unit = jnp.abs(dlen - 1.0) < 1e-6
    inv = jnp.where(unit, 1.0, 1.0 / jnp.where(safe, dlen, 1.0))
    dn = ray.dir * inv
    dlen = jnp.where(unit, 1.0, dlen)
    scale = jnp.where(safe, dlen, 1.0)
    best_u0 = jnp.broadcast_to(best_time, (n,)) * scale
    limit_u = jnp.broadcast_to(limit, (n,)).astype(DTYPE) * scale
    if active is None:
        active = jnp.ones(n, bool)
    active = active & safe & (limit_u > t_min)

    uray = Ray(ray.origin, dn)
    inv_dir = Vec3.ones(dn.shape) / dn
    depth = ct.tree_depth

    state = (
        jnp.where(active, (1 << _tree_wide(ct.tree)) - 1, -1).astype(jnp.int32),  # cur = root | full mask
        jnp.zeros(n, jnp.int32),                          # sp
        jnp.zeros((n, depth), jnp.int32),                 # stack
        best_u0,                                          # best_u
        jnp.full(n, -1, jnp.int32),                       # pack
        jnp.full((n, CAND_SLOTS), INF, DTYPE),            # cand_t
        jnp.zeros((n, CAND_SLOTS), jnp.int32),            # cand_id
        ~active,                                          # done
    )

    def phase(state, uray, inv_dir, limit_u):
        state = _descent_burst(
            ct.tree, uray, inv_dir, t_min, limit_u, state, DESCENT_STEPS
        )
        state = _test_burst(
            ct, uray, uray.dir, inv_dir, t_min, limit_u, state, any_hit
        )
        # a lane is finished when descent is done and its buffer drained
        cur, sp, stack, best_u, pack, cand_t, cand_id, done = state
        done = done | ((cur < 0) & ~jnp.any(cand_t < INF, axis=1))
        if any_hit:
            done = done | (best_u < limit_u)
        return (cur, sp, stack, best_u, pack, cand_t, cand_id, done)

    def pending(state):
        return jnp.any(~state[7])

    # every phase makes progress on some pending lane (a lane either
    # descends >= 1 node step or drains >= 1 candidate; lanes with the
    # fullest buffers are tested first), so the fixpoint loops below
    # terminate without caps
    if n < 4096:
        state = jax.lax.while_loop(
            pending, lambda s: phase(s, uray, inv_dir, limit_u), state
        )
        best_u, pack = state[3], state[4]
    else:
        # ASYMMETRIC phase widths (measured, experiments/step_cost.py):
        # a descent step costs ~0.43 ms FIXED + only ~2.6 ns/lane, so
        # descent runs on the WHOLE wavefront in place — no per-phase
        # state swap, no round-robin sweep; a fat test round costs
        # ~50 ns/lane (2.5 KB row, bandwidth-bound), so tests run on a
        # NARROW compacted batch of candidate-holding lanes (fullest
        # buffers first, relieving descent stalls). Once the pending
        # tail fits, the whole problem compacts to a narrower stage so
        # the tail stops paying full-width marginal costs.
        best_full = best_u0
        pack_full = jnp.full(n, -1, jnp.int32)
        idx = None  # stage lanes -> original lanes (None = identity)
        w = n
        sray, sinv, slim = uray, inv_dir, limit_u

        while True:
            next_w = max(4096, w // LADDER_DIV)
            last = next_w >= w
            thresh = 0 if last else next_w
            wide_w = max(2048, min(w, w // TEST_DIV))
            narrow_w = max(2048, min(w, w // (TEST_DIV * 4)))

            def make_test(test_w, rounds, sray=sray, sinv=sinv, slim=slim):
                def run(state):
                    n_cand = jnp.sum(state[5] < INF, axis=1)
                    prio = jnp.where(
                        ~state[7] & (n_cand > 0), -n_cand, jnp.int32(1)
                    )
                    sel = jnp.argsort(prio)[:test_w]
                    sub = tuple(a[sel] for a in state)
                    sub_ray = Ray(
                        Vec3(sray.origin.x[sel], sray.origin.y[sel],
                             sray.origin.z[sel]),
                        Vec3(sray.dir.x[sel], sray.dir.y[sel], sray.dir.z[sel]),
                    )
                    sub_inv = Vec3(sinv.x[sel], sinv.y[sel], sinv.z[sel])
                    sub = _test_burst(
                        ct, sub_ray, sub_ray.dir, sub_inv, t_min, slim[sel],
                        sub, any_hit, rounds=rounds,
                    )
                    return tuple(a.at[sel].set(b) for a, b in zip(state, sub))

                return run

            def stage_phase(c, sray=sray, sinv=sinv, slim=slim,
                            wide_w=wide_w, narrow_w=narrow_w):
                state = c
                state = _descent_burst(
                    ct.tree, sray, sinv, t_min, slim, state, DESCENT_STEPS
                )
                # tiered test width: a static batch sized for the busy
                # early phases wastes ~3x fat-row bandwidth in the tail
                # (PERF.md), so pick the tier by the live tester count
                # (lax.cond executes only the chosen branch)
                if narrow_w >= wide_w:
                    state = make_test(wide_w, TEST_ROUNDS)(state)
                else:
                    testers = jnp.sum(
                        ~state[7] & jnp.any(state[5] < INF, axis=1)
                    )
                    state = jax.lax.cond(
                        testers > narrow_w,
                        make_test(wide_w, TEST_ROUNDS),
                        make_test(narrow_w, TEST_ROUNDS * 4),
                        state,
                    )
                cur, sp, stack, best_u, pack, cand_t, cand_id, done = state
                done = done | ((cur < 0) & ~jnp.any(cand_t < INF, axis=1))
                if any_hit:
                    done = done | (best_u < slim)
                return (cur, sp, stack, best_u, pack, cand_t, cand_id, done)

            def stage_cond(state, thresh=thresh):
                return jnp.sum(~state[7]) > thresh

            state = jax.lax.while_loop(stage_cond, stage_phase, state)

            # record this stage's results for every lane it owned
            if idx is None:
                best_full, pack_full = state[3], state[4]
            else:
                best_full = best_full.at[idx].set(state[3])
                pack_full = pack_full.at[idx].set(state[4])
            if last:
                break

            # compact the (<= next_w) pending lanes into the next stage
            order = jnp.argsort(state[7])
            sel = order[:next_w]
            idx = sel if idx is None else idx[sel]
            state = tuple(a[sel] for a in state)
            sray = Ray(
                Vec3(sray.origin.x[sel], sray.origin.y[sel], sray.origin.z[sel]),
                Vec3(sray.dir.x[sel], sray.dir.y[sel], sray.dir.z[sel]),
            )
            sinv = Vec3(sinv.x[sel], sinv.y[sel], sinv.z[sel])
            slim = slim[sel]
            w = next_w

        best_u, pack = best_full, pack_full
    if any_hit:
        tri = jnp.where(pack >= 0, 0, -1)
        u = v = w = jnp.zeros((n,), DTYPE)
    else:
        tri, u, v, w = _recover_hit(ct.rec, best_u, pack, ray.origin, dn, t_min)
    time = jnp.where(
        pack >= 0,
        best_u / jnp.where(safe, dlen, 1.0),
        jnp.broadcast_to(best_time, (n,)).astype(DTYPE),
    )
    return time, tri, u, v, w
