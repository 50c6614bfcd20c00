"""Count sequential iterations per ladder stage (Phase A descent and
Phase B drain) and time single full-width steps in isolation, on the
real L1 bounce wavefront. Explains where the two-phase traversal's time
goes (two_phase_split.py measured A=96 ms, B=69 ms)."""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import jax
import jax.numpy as jnp
import numpy as np

from batch_scaling import get_l1
import rpt_tpu.deferred as D
from rpt_tpu.dtypes import DTYPE, INF
from rpt_tpu.ray import Ray
from rpt_tpu.vec import Vec3
import bench


def sync(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).reshape(-1)[0])


def timed(fn, *args, reps=3):
    sync(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    scene = bench.build_scene().compile()
    tables = scene.tables
    ct = tables["clusters"]
    o, d, ok = get_l1(scene, tables, 0)
    n = o.shape[0]
    ray = Ray(
        Vec3(jnp.asarray(o[:, 0]), jnp.asarray(o[:, 1]), jnp.asarray(o[:, 2])),
        Vec3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2])),
    )
    t_min = scene.t_min
    dnorm = ray.dir.length()
    dn = ray.dir / jnp.where(dnorm > 0, dnorm, 1.0)
    uray = Ray(ray.origin, dn)
    inv_dir = Vec3.ones(dn.shape) / dn
    limit_u = jnp.full((n,), INF, DTYPE)
    active = jnp.ones(n, bool)

    state0 = (
        jnp.where(active, (1 << D._tree_wide(ct.tree)) - 1, -1).astype(jnp.int32),
        jnp.zeros(n, jnp.int32),
        jnp.zeros((n, ct.tree_depth), jnp.int32),
        jnp.full((n,), INF, DTYPE),
        jnp.full(n, -1, jnp.int32),
        jnp.full((n, D.CAND_SLOTS), INF, DTYPE),
        jnp.zeros((n, D.CAND_SLOTS), jnp.int32),
        ~active,
    )

    # --- instrumented ladder: same staging, carry an iteration counter --
    def ladder_counts(state, mask_fn, make_runner):
        counts = []
        sel_abs = None
        sray, sinv, slim = uray, inv_dir, limit_u
        st = state
        full_state = state
        w = n
        while True:
            next_w = max(D.MIN_STAGE, w // D.LADDER_DIV)
            last = next_w >= w
            thresh = 0 if last else next_w
            step = make_runner(sray, sinv, slim)

            @jax.jit
            def run(st, slim=slim, step=step, thresh=thresh):
                def cond(c):
                    return jnp.sum(mask_fn(c[0], slim)) > thresh

                return jax.lax.while_loop(
                    cond, lambda c: (step(c[0]), c[1] + 1), (st, jnp.int32(0))
                )

            st, iters = run(st)
            counts.append((w, int(iters)))
            if sel_abs is None:
                full_state = st
            else:
                full_state = tuple(f.at[sel_abs].set(s) for f, s in zip(full_state, st))
            if last:
                break
            prio = jnp.argsort(~mask_fn(st, slim))[:next_w]
            sel_abs = prio if sel_abs is None else sel_abs[prio]
            st = tuple(a[prio] for a in st)
            sray = Ray(
                Vec3(sray.origin.x[prio], sray.origin.y[prio], sray.origin.z[prio]),
                Vec3(sray.dir.x[prio], sray.dir.y[prio], sray.dir.z[prio]),
            )
            sinv = Vec3(sinv.x[prio], sinv.y[prio], sinv.z[prio])
            slim = slim[prio]
            w = next_w
        return full_state, counts

    def mk_desc(sray, sinv, slim):
        return D._make_descent_step(ct.tree, sray, sinv, t_min, slim)

    stateA, ca = ladder_counts(state0, lambda s, lim: D._descend_mask(s), mk_desc)
    print("Phase A stage (width, iters):", ca)

    def mk_drain(sray, sinv, slim):
        return D._make_test_round(ct, sray, sray.dir, sinv, t_min, slim, False)

    stateB, cb = ladder_counts(
        stateA, lambda s, lim: D._pending_mask(s, lim, False), mk_drain
    )
    print("Phase B stage (width, iters):", cb)

    # --- single-step costs at full width (K steps per dispatch) ---------
    K = 16
    step = D._make_descent_step(ct.tree, uray, inv_dir, t_min, limit_u)

    @jax.jit
    def k_desc(st):
        return jax.lax.fori_loop(0, K, lambda i, s: step(s), st)

    t = timed(k_desc, state0)
    print(f"descent step at {n} lanes: {t/K*1e3:.2f} ms/step")

    round_ = D._make_test_round(ct, uray, uray.dir, inv_dir, t_min, limit_u, False)

    @jax.jit
    def k_drain(st):
        return jax.lax.fori_loop(0, K, lambda i, s: round_(s), st)

    t = timed(k_drain, stateA)
    print(f"drain round at {n} lanes: {t/K*1e3:.2f} ms/round")


if __name__ == "__main__":
    main()
