"""Wavefront path tracing.

Ports ``Renderer::trace_ray`` (`/root/reference/src/renderer.rs:187-322`)
from a per-ray recursion to whole-wavefront iteration:

* **Surface branch** (no media, renderer.rs:286-321): bounded by
  ``max_bounces``; emission only at bounce 0; NEE at every hit; per-level
  per-channel firefly clamp of 100 applied to the *sub-path* result
  (renderer.rs:311-313). Because the clamp wraps the recursive return
  value, a forward throughput product cannot express it — we run a forward
  ``lax.scan`` collecting per-level (contribution, factor) pairs and fold
  them *backwards*: ``L_b = contrib_b + min(factor_b * L_{b+1}, 100)``.
  This reproduces the recursion exactly.

* **Media branch** (renderer.rs:188-285): Russian roulette p=0.8 at every
  level, *ignoring* ``max_bounces`` and with no clamp — so plain forward
  throughput accumulation in a fixed-cap scan (cap = ``media_max_depth``;
  truncation error ~0.8^cap, far below Monte Carlo noise). Exactly one of
  {medium event, surface event, miss} happens per level, selected by the
  sampled free-flight distance vs the closest hit (miss uses
  background_dist = 400, renderer.rs:199).

Shadow-ray semantics: the reference accepts a light sample only when the
closest hit lies *exactly* at the light distance within 1e-12
(renderer.rs:396) — which requires the light's geometry to be a scene
object (the dual-add pattern) and f64 exactness. We use the standard
occlusion test (no occluder strictly closer than the light), which is
equivalent for dual-added lights, matches upstream rpt for light-only
geometry, and is robust in f32.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from .. import sampling
from ..dtypes import DTYPE
from ..intersect import closest_hit, occluded
from ..materials import bsdf, sample_f
from ..ray import Ray
from ..vec import Vec3, where

FIREFLY_CLAMP = 100.0  # renderer.rs:18
BACKGROUND_DIST = 400.0  # renderer.rs:199
RR_P = 0.8  # renderer.rs:193
# Concatenate all lights' shadow rays into one occlusion wavefront.
# Was net-negative in round 2 (1.70 -> 1.61 Mrays/s), but two later
# changes flipped it: zero-contribution gating retires ~a third of the
# pooled lanes at entry, and the per-traversal-call machinery (~35-40 ms
# in-graph, experiments/ladder_overhead.py) is shared instead of paid
# per light. Measured 2.15 -> 2.72 Mrays/s on the dragon bench.
SHADOW_BATCH = os.environ.get("RPT_TPU_SHADOW_BATCH", "1") == "1"


def _sanitize(pos: Vec3, mask) -> Vec3:
    zero = Vec3.zeros(jnp.shape(mask))
    return where(mask, pos, zero)


# dead lanes trace this ray instead of garbage from sanitized origins:
# far outside every scene, pointing away — every traversal path (analytic,
# tiled culling, tree root box) rejects it in O(1). Results of dead lanes
# are discarded anyway; only their COST matters (a dead lane carrying a
# stale/zeroed origin inside the mesh was measured to re-traverse the
# whole BVH every level).
_DEAD_POS = 1e7


def _dead_ray_fields(n):
    far = jnp.full(n, jnp.asarray(_DEAD_POS, DTYPE))
    up = jnp.ones(n, DTYPE)
    return Vec3(far, far, far), Vec3(jnp.zeros(n, DTYPE), up, jnp.zeros(n, DTYPE))


def sample_lights(scene, tables, mat, pos: Vec3, n: Vec3, wo: Vec3, keys,
                  mask=None, coherent: bool = True) -> Vec3:
    """renderer.rs:362-409 — NEE for a surface point. ``mask`` marks lanes
    whose result is consumed; shadow queries are disabled on the rest.
    All lights' shadow rays run as ONE batched occlusion query (shared
    traversal fixed costs + pooled ladder compaction); the RNG stream is
    per-light as before."""
    from ..lights import illuminate

    color = Vec3.zeros(jnp.shape(pos.x))
    pending = []  # (wi, contrib, dist) per non-ambient light
    for li, (lstat, ltab) in enumerate(zip(scene.lights, tables["lights"])):
        if lstat.kind == "ambient":
            color = color + ltab["color"].broadcast_to(pos.shape) * mat.color_query()
            continue
        lkeys = sampling.fold(keys, 0x1100 + li)
        intensity, wi, dist = illuminate(lstat, ltab, pos, lkeys)
        f = bsdf(mat, n, wo, wi)
        pending.append((wi, f * intensity * wi.dot(n), dist))
    for visible, (_, contrib, _) in zip(
        _shadow_visible_batch(scene, tables, pos, pending, mask, coherent),
        pending,
    ):
        color = color + where(visible, contrib, Vec3.zeros(jnp.shape(pos.x)))
    return color


def _nonzero_contrib(contrib: Vec3):
    """Shadow lanes whose NEE contribution is already zero (light below
    the horizon, black BSDF lobe, backfacing area-light sample) have a
    visibility result that is multiplied by zero — skip their occlusion
    traversal entirely. Pure cost optimization: where(visible, 0, 0) == 0
    either way, so the radiance estimate is bit-identical."""
    return (contrib.x != 0.0) | (contrib.y != 0.0) | (contrib.z != 0.0)


def sample_lights_for_media(scene, tables, medium, pos: Vec3, wo: Vec3, keys,
                            mask=None, coherent: bool = True) -> Vec3:
    """renderer.rs:325-359 — NEE for a medium scattering point."""
    from ..lights import illuminate

    scat = medium.scattering(pos)
    ext = medium.extinction(pos)
    medium_color = medium.color(pos)
    color = Vec3.zeros(jnp.shape(pos.x))
    pending = []
    for li, (lstat, ltab) in enumerate(zip(scene.lights, tables["lights"])):
        if lstat.kind == "ambient":
            color = color + ltab["color"].broadcast_to(pos.shape) * medium_color
            continue
        lkeys = sampling.fold(keys, 0x1100 + li)
        intensity, wi, dist = illuminate(lstat, ltab, pos, lkeys)
        ph = medium.phase(wo, wi)
        pending.append((wi, intensity * medium_color * ((scat / ext) * ph), dist))
    for visible, (_, contrib, _) in zip(
        _shadow_visible_batch(scene, tables, pos, pending, mask, coherent),
        pending,
    ):
        color = color + where(visible, contrib, Vec3.zeros(jnp.shape(pos.x)))
    return color


def _shadow_visible(scene, tables, pos: Vec3, wi: Vec3, dist, mask=None,
                    coherent: bool = True):
    """True where no occluder lies strictly between ``pos`` and the light.
    Lanes with ``mask`` False get limit -1: every traversal path rejects
    them in O(1) (their visibility result is discarded by the caller).

    ``scene.nee_mode == "exact"`` instead reproduces renderer.rs:395-396
    literally: accept only when the CLOSEST hit lies at the light distance
    (which rejects every sample of a light whose geometry is not also in
    scene.objects) — used to quantify the deviation, see PARITY.md."""
    if scene.nee_mode == "exact":
        hit = closest_hit(scene, tables, Ray(pos, wi))
        ok = hit.valid & (jnp.abs(hit.time - dist) < scene.shadow_eps * dist)
        if mask is not None:
            ok &= mask
        return ok
    limit = dist * (1.0 - scene.shadow_eps)
    if mask is not None:
        limit = jnp.where(mask, limit, -1.0)
    return ~occluded(scene, tables, Ray(pos, wi), limit, coherent=coherent)


def _shadow_visible_batch(scene, tables, pos: Vec3, pending, mask,
                          coherent: bool):
    """Visibility for every light's shadow ray from the same surface
    points, CONCATENATED into one occlusion wavefront: per-light passes
    each paid the traversal's sequential fixed costs (~0.4 ms x dozens of
    rounds) and compacted their survivor ladders separately; one n*L-lane
    query shares both (experiments/shadow_components.py). Falls back to
    per-light queries for the exact-NEE parity mode."""
    if not pending:
        return []
    if scene.nee_mode == "exact":
        return [
            _shadow_visible(scene, tables, pos, wi, dist, mask, coherent)
            for wi, _, dist in pending
        ]
    if not SHADOW_BATCH or len(pending) == 1:
        return [
            _shadow_visible(
                scene, tables, pos, wi, dist,
                _nonzero_contrib(contrib) if mask is None
                else mask & _nonzero_contrib(contrib),
                coherent,
            )
            for wi, contrib, dist in pending
        ]
    n = jnp.shape(pos.x)[0]
    L = len(pending)

    def cat(parts):
        return jnp.concatenate(parts)

    bpos = Vec3(*(cat([getattr(pos, c)] * L) for c in "xyz"))
    bwi = Vec3(*(cat([getattr(wi, c) for wi, _, _ in pending]) for c in "xyz"))
    limits = []
    for _, contrib, dist in pending:
        lmask = _nonzero_contrib(contrib)
        if mask is not None:
            lmask &= mask
        limits.append(jnp.where(lmask, dist * (1.0 - scene.shadow_eps), -1.0))
    occ = occluded(scene, tables, Ray(bpos, bwi), cat(limits),
                   coherent=coherent)
    return [~occ[i * n : (i + 1) * n] for i in range(L)]


# ---------------------------------------------------------------------------
# Surface-only branch (renderer.rs:286-321)


def trace_surface(scene, tables, ray: Ray, keys, max_bounces: int,
                  return_stats: bool = False):
    """Radiance for a wavefront of camera rays, no participating media.

    With ``return_stats``, also returns the number of traced ray segments
    (camera/bounce + shadow) for Mrays/sec accounting.
    """
    n = ray.origin.shape[0]
    materials = tables["materials"]
    n_shadow = sum(1 for l in scene.lights if l.kind != "ambient")

    def level(carry, b, coherent: bool, is_b0: bool):
        ray, keys_state, alive = carry
        kb = sampling.fold(keys_state, jnp.asarray(b))
        # ``coherent`` is static: camera rays (level 0) take the coherent
        # tile path, bounce wavefronts skip it
        hit = closest_hit(scene, tables, ray, coherent=coherent)
        hitmask = alive & hit.valid
        missmask = alive & ~hit.valid

        mat = materials.lookup(hit.material)
        pos = _sanitize(ray.at(hit.time), hitmask)
        wo = -ray.dir.normalize()

        zero = Vec3.zeros(n)
        if is_b0:  # emission only at bounce 0 (renderer.rs:295-299)
            emit = mat.color_query() * mat.emittance_query()
            emit = where(hitmask, emit, zero)
        else:
            emit = zero
        nee = sample_lights(scene, tables, mat, pos, hit.normal, wo,
                            sampling.fold(kb, 2), mask=hitmask,
                            coherent=coherent)
        env = scene.env_color(tables, ray.dir)
        contrib = emit + where(hitmask, nee, zero) + where(missmask, env, zero)

        wi, pdf, valid = sample_f(mat, hit.normal, wo, sampling.fold(kb, 3))
        f = bsdf(mat, hit.normal, wo, wi)
        bounce_ok = hitmask & valid & (b < max_bounces)
        safe_pdf = jnp.maximum(pdf, 1e-20)
        factor = f * (jnp.abs(wi.dot(hit.normal)) / safe_pdf)
        factor = where(bounce_ok, factor, zero)

        dead_pos, dead_dir = _dead_ray_fields(n)
        new_ray = Ray(where(bounce_ok, pos, dead_pos), where(bounce_ok, wi, dead_dir))
        segments = jnp.sum(alive) + jnp.sum(hitmask) * n_shadow
        return (new_ray, keys_state, bounce_ok), (contrib, factor, segments)

    # Level 0 is unrolled (it alone takes the coherent tile path and emits);
    # levels 1..max_bounces all trace the SAME incoherent graph, so they
    # run as ONE lax.scan over the level index — the traversal subgraph
    # (tiled+deferred, by far the largest part of the program) compiles
    # once instead of once per bounce (round-2 compile time grew ~60%
    # per bounce from full unrolling; VERDICT r2 Weak #5).
    carry, out0 = level((ray, keys, jnp.ones(n, bool)), 0, True, True)
    if max_bounces >= 1:
        carry, outs = jax.lax.scan(
            lambda c, b: level(c, b, False, False),
            carry,
            jnp.arange(1, max_bounces + 1),
        )
        contribs, factors, segments = jax.tree_util.tree_map(
            lambda x0, xs: jnp.concatenate([x0[None], xs]), out0, outs
        )
    else:
        contribs, factors, segments = jax.tree_util.tree_map(
            lambda x0: x0[None], out0
        )

    # backward clamp fold: L_b = contrib_b + min(factor_b * L_{b+1}, 100)
    def back(L, level_data):
        contrib, factor = level_data
        indirect = (factor * L).minimum(FIREFLY_CLAMP)
        return contrib + indirect, None

    L0, _ = jax.lax.scan(back, Vec3.zeros(n), (contribs, factors), reverse=True)
    if return_stats:
        return L0, jnp.sum(segments)
    return L0


# ---------------------------------------------------------------------------
# Media branch (renderer.rs:188-285)


def trace_volumetric(scene, tables, ray: Ray, keys, max_depth: int = 32,
                     return_stats: bool = False):
    """Radiance with a participating medium (scene.media[0] only, matching
    the reference's TODO at renderer.rs:189)."""
    n = ray.origin.shape[0]
    materials = tables["materials"]
    medium = scene.media[0]
    zero = Vec3.zeros(n)
    n_shadow = sum(1 for l in scene.lights if l.kind != "ambient")

    def level(carry, b):
        ray, keys_state, throughput, L, alive = carry
        kb = sampling.fold(keys_state, jnp.asarray(b))

        d, _d_pdf, _d_cdf = medium.sample_d(ray, sampling.fold(kb, 1))
        hit = closest_hit(scene, tables, ray)
        has_hit = hit.valid
        max_dist = jnp.where(has_hit, hit.time, BACKGROUND_DIST)
        medium_event = alive & (d < max_dist)
        surface_event = alive & ~medium_event & has_hit
        escape_event = alive & ~medium_event & ~has_hit

        wo = -ray.dir.normalize()
        collision = _sanitize(ray.at(d), medium_event)
        surf_pos = _sanitize(ray.at(hit.time), surface_event)
        mat = materials.lookup(hit.material)

        # --- per-level emitted/NEE contribution -------------------------
        emit_surf = where((b == 0) & surface_event, mat.color_query() * mat.emittance_query(), zero)
        emm = medium.emission(collision)
        med_color_c = medium.color(collision)
        emit_med = where((b == 0) & medium_event, med_color_c * emm, zero)
        # miss contributes env only when the flight distance reached past
        # the background (renderer.rs:198-205)
        env = where(
            escape_event & (d >= BACKGROUND_DIST), scene.env_color(tables, ray.dir), zero
        )

        # shared shadow ray: position depends on the event kind
        nee_pos = where(medium_event, collision, surf_pos)
        nee_surf = sample_lights(scene, tables, mat, nee_pos, hit.normal, wo,
                                 sampling.fold(kb, 2), mask=surface_event)
        nee_med = sample_lights_for_media(
            scene, tables, medium, nee_pos, wo, sampling.fold(kb, 3),
            mask=medium_event,
        )

        contrib = (
            emit_surf
            + emit_med
            + env
            + where(surface_event, nee_surf, zero)
            + where(medium_event, nee_med, zero)
        )
        L = L + throughput * contrib

        # --- Russian roulette continuation (p = 0.8) --------------------
        u = sampling.uniform(sampling.fold(kb, 4))
        survive = u < RR_P

        # surface continuation (renderer.rs:222-234)
        wi_s, pdf_s, valid_s = sample_f(mat, hit.normal, wo, sampling.fold(kb, 5))
        f = bsdf(mat, hit.normal, wo, wi_s)
        surf_factor = f * (jnp.abs(wi_s.dot(hit.normal)) / (jnp.maximum(pdf_s, 1e-20) * RR_P))

        # medium continuation (renderer.rs:262-281)
        abs_c = medium.absorption(collision)
        scat_c = medium.scattering(collision)
        ext_c = abs_c + scat_c
        wi_m, ph_p = medium.sample_ph(wo, sampling.fold(kb, 6))
        ph = medium.phase(wo, wi_m)
        med_factor = med_color_c * ((scat_c / ext_c) * ph / (jnp.maximum(ph_p, 1e-20) * RR_P))

        cont = survive & (medium_event | (surface_event & valid_s))
        throughput = throughput * where(medium_event, med_factor, surf_factor)
        throughput = where(cont, throughput, zero)
        dead_pos, dead_dir = _dead_ray_fields(n)
        new_ray = Ray(
            where(cont, where(medium_event, collision, surf_pos), dead_pos),
            where(cont, where(medium_event, wi_m, wi_s), dead_dir),
        )
        segments = jnp.sum(alive) + jnp.sum(medium_event | surface_event) * n_shadow
        return (new_ray, keys_state, throughput, L, cont), segments

    init = (ray, keys, Vec3.ones(n), zero, jnp.ones(n, bool))
    (_, _, _, L, _), segments = jax.lax.scan(level, init, jnp.arange(max_depth))
    if return_stats:
        return L, jnp.sum(segments)
    return L
