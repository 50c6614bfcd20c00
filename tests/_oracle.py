"""Independent f64 oracle renderer — shares NO code with rpt_tpu.

A direct numpy transcription of the reference's recursive integrator
(`/root/reference/src/renderer.rs:187-322` surface branch,
`camera.rs:65-82`, `light.rs:34-45`, `material.rs:173-197/266-289`,
closed-form shapes from `shape/*.rs`) used to anchor the wavefront
integrator against an implementation that cannot share its bugs
(VERDICT r2 "Missing #4"). f64 throughout, own RNG, recursive bounce
structure (vectorized over rays only — no wavefront machinery, no
compaction, no masking framework).

One deliberate, documented deviation shared with rpt_tpu (PARITY.md /
integrators/path.py docstring): NEE visibility is the standard
"no occluder strictly before the light" test instead of the reference's
|closest_hit - dist| < 1e-12 equality, which only admits dual-added
light geometry under f64 exactness.
"""

from __future__ import annotations

import numpy as np

FIREFLY_CLAMP = 100.0  # renderer.rs:18
SHADOW_EPS = 1e-3  # fractional back-off like rpt_tpu's scene.shadow_eps
T_MIN = 1e-4


def _dot(a, b):
    return (a * b).sum(-1)


def _norm(a):
    return a / np.linalg.norm(a, axis=-1, keepdims=True)


# --- shapes (closed-form, f64) --------------------------------------------


class OSphere:
    """Sphere of radius r at center c (sphere.rs:14-46 in local frame)."""

    def __init__(self, center, radius, mat):
        self.c = np.asarray(center, np.float64)
        self.r = float(radius)
        self.mat = mat

    def intersect(self, o, d, t_min, t_best):
        oc = (o - self.c) / self.r
        dn = d / self.r
        a = _dot(dn, dn)
        b = _dot(dn, oc)
        c = _dot(oc, oc) - 1.0
        disc = b * b - a * c
        ok = disc >= 0.0
        sq = np.sqrt(np.maximum(disc, 0.0))
        t_minus = (-b - sq) / a
        t_plus = (-b + sq) / a
        t = np.where(t_minus < t_min, t_plus, t_minus)
        ok &= (t >= t_min) & (t < t_best)
        t = np.where(ok, t, np.inf)
        p = o + t[:, None] * d
        nrm = _norm(np.where(ok[:, None], p - self.c, [[1.0, 0, 0]]))
        return t, nrm

    def sample(self, target, rng):
        """Transformed sphere light sample (sphere.rs:53-65 through
        shape.rs:140-151 with uniform scale r + translate c)."""
        m = target.shape[0]
        # UnitDisc
        ang = rng.uniform(0, 2 * np.pi, m)
        rad = np.sqrt(rng.uniform(0, 1, m))
        x, y = rad * np.cos(ang), rad * np.sin(ang)
        z = np.sqrt(np.maximum(1.0 - x * x - y * y, 0.0))
        tl = (target - self.c) / self.r  # local target
        n = _norm(tl)
        use_a = np.abs(n[:, 0]) > 1e-300  # is_normal surrogate
        n1 = np.where(
            use_a[:, None],
            np.stack([n[:, 1], -n[:, 0], np.zeros(m)], 1),
            np.stack([np.zeros(m), -n[:, 2], n[:, 1]], 1),
        )
        n1 = _norm(n1)
        n2 = np.cross(n1, n)
        p_local = x[:, None] * n1 + y[:, None] * n2 + z[:, None] * n
        pdf_local = z / np.pi
        # world: point scaled+translated; normal unchanged (uniform scale);
        # pdf divided by area scale r^2 (parallelepiped base, shape.rs:148)
        v = self.c + self.r * p_local
        return v, p_local, pdf_local / (self.r * self.r)


class OPlane:
    def __init__(self, normal, value, mat):
        self.n = np.asarray(normal, np.float64)
        self.v = float(value)
        self.mat = mat

    def intersect(self, o, d, t_min, t_best):
        cosine = _dot(d, self.n)
        ok = np.abs(cosine) >= 1e-8
        t = (self.v - _dot(o, self.n)) / np.where(ok, cosine, 1.0)
        ok &= (t >= t_min) & (t < t_best)
        t = np.where(ok, t, np.inf)
        nrm = -_norm(self.n)[None, :] * np.sign(cosine)[:, None]
        return t, nrm


class OTris:
    """Triangle soup with flat normals (mesh.rs:50-83); doubles as an
    area light (uniform triangle pick, kdtree.rs:141-147 pdf/n)."""

    def __init__(self, tris, mat):
        self.v = np.asarray(tris, np.float64)  # (T, 3, 3)
        self.mat = mat
        d0 = self.v[:, 1] - self.v[:, 0]
        d1 = self.v[:, 2] - self.v[:, 0]
        self.fn = _norm(np.cross(d0, d1))
        self.area = 0.5 * np.linalg.norm(np.cross(d0, d1), axis=-1)

    def intersect(self, o, d, t_min, t_best):
        n = o.shape[0]
        best_t = np.full(n, np.inf)
        best_n = np.tile([[0.0, 0.0, 1.0]], (n, 1))
        for i in range(len(self.v)):
            v1, v2, v3 = self.v[i]
            pn = self.fn[i]
            cosine = _dot(d, pn[None, :])
            ok = np.abs(cosine) >= 1e-8
            t = _dot((v1 - o), pn[None, :]) / np.where(ok, cosine, 1.0)
            ok &= (t >= t_min) & (t < np.minimum(t_best, best_t))
            p = o + t[:, None] * d
            d0, d1 = v2 - v1, v3 - v1
            d2 = p - v1
            d00, d01, d11 = d0 @ d0, d0 @ d1, d1 @ d1
            d20 = _dot(d2, d0[None, :])
            d21 = _dot(d2, d1[None, :])
            denom = d00 * d11 - d01 * d01
            bv = (d11 * d20 - d01 * d21) / denom
            bw = (d00 * d21 - d01 * d20) / denom
            bu = 1.0 - bv - bw
            ok &= (bu >= 0) & (bv >= 0) & (bw >= 0)
            upd = ok & (t < best_t)
            best_t = np.where(upd, t, best_t)
            best_n = np.where(upd[:, None], pn[None, :], best_n)
        return best_t, best_n

    def sample(self, target, rng):
        m = target.shape[0]
        idx = rng.integers(0, len(self.v), m)
        u = rng.uniform(0, 1, m)
        v = rng.uniform(0, 1, m)
        flip = u + v > 1.0  # fold instead of the reference's rejection loop
        u = np.where(flip, 1.0 - u, u)
        v = np.where(flip, 1.0 - v, v)
        w = 1.0 - u - v
        tv = self.v[idx]
        # mesh.rs:85-99 writes u*v1 + v*v2 + w*v3
        p = u[:, None] * tv[:, 0] + v[:, None] * tv[:, 1] + w[:, None] * tv[:, 2]
        n = self.fn[idx]
        pdf = (1.0 / self.area[idx]) / len(self.v)
        return p, n, pdf


class OMat:
    def __init__(self, albedo=(0.5, 0.5, 0.5), emittance=0.0):
        self.albedo = np.asarray(albedo, np.float64)
        self.emittance = float(emittance)

    def bsdf(self, n, wo, wi):
        above = (_dot(n, wi) > 0) & (_dot(n, wo) > 0)
        return np.where(above[:, None], self.albedo[None, :] / np.pi, 0.0)

    def sample_f(self, n, wo, rng):
        m = n.shape[0]
        r1 = rng.uniform(0, 1, m)
        r2 = rng.uniform(0, 1, m)
        phi = 2 * np.pi * r1
        ct = np.sqrt(r2)  # cos(acos(sqrt(r2)))
        st = np.sqrt(np.maximum(1 - r2, 0))
        local = np.stack([st * np.cos(phi), ct, st * np.sin(phi)], 1)
        pdf = ct / np.pi
        # rotate y-hat -> n (any azimuth: the lobe is azimuthally symmetric)
        up = np.tile([[0.0, 1.0, 0.0]], (m, 1))
        alt = np.tile([[1.0, 0.0, 0.0]], (m, 1))
        t = np.where(np.abs(n[:, 1:2]) > 0.999, alt, up)
        t1 = _norm(np.cross(t, n))
        t2 = np.cross(n, t1)
        wi = local[:, 0:1] * t1 + local[:, 1:2] * n + local[:, 2:3] * t2
        return _norm(wi), pdf, np.ones(m, bool)


class OScene:
    def __init__(self, objects, lights, env=(0.0, 0.0, 0.0)):
        self.objects = objects  # shapes with .mat
        self.lights = lights  # shapes with .mat (area lights)
        self.env = np.asarray(env, np.float64)

    def closest_hit(self, o, d, t_min=T_MIN):
        n = o.shape[0]
        bt = np.full(n, np.inf)
        bn = np.zeros((n, 3))
        bi = np.full(n, -1)
        for i, obj in enumerate(self.objects):
            t, nrm = obj.intersect(o, d, t_min, bt)
            upd = t < bt
            bt = np.where(upd, t, bt)
            bn = np.where(upd[:, None], nrm, bn)
            bi = np.where(upd, i, bi)
        return bt, bn, bi

    def occluded(self, o, d, limit):
        bt, _, _ = self.closest_hit(o, d)
        return bt < limit

    def sample_lights(self, mat_table, mat_idx, pos, nrm, wo, rng):
        m = pos.shape[0]
        color = np.zeros((m, 3))
        for light in self.lights:
            v, ln, pdf = light.sample(pos, rng)
            disp = v - pos
            dist = np.linalg.norm(disp, axis=-1)
            wi = disp / dist[:, None]
            cos_l = np.maximum(-_dot(disp, ln), 0.0) / dist
            sa = np.maximum(cos_l, 0.0) / (dist * dist)
            emit = light.mat.albedo * light.mat.emittance
            intensity = emit[None, :] * (sa / pdf)[:, None]
            vis = ~self.occluded(pos, wi, dist * (1.0 - SHADOW_EPS))
            f = np.zeros((m, 3))
            for mi, mat in enumerate(mat_table):
                sel = mat_idx == mi
                if sel.any():
                    f[sel] = mat.bsdf(nrm[sel], wo[sel], wi[sel])
            color += np.where(
                vis[:, None], f * intensity * _dot(wi, nrm)[:, None], 0.0
            )
        return color

    def trace(self, o, d, bounce, max_bounces, rng):
        """renderer.rs:286-321 surface branch, recursive, f64."""
        m = o.shape[0]
        bt, bn, bi = self.closest_hit(o, d)
        hit = np.isfinite(bt)
        out = np.where(hit[:, None], 0.0, self.env[None, :])
        pos = o + np.where(hit, bt, 0.0)[:, None] * d
        wo = -_norm(d)

        mat_table = [obj.mat for obj in self.objects]
        emit = np.zeros((m, 3))
        nee = np.zeros((m, 3))
        if bounce == 0:
            for mi, mat in enumerate(mat_table):
                emit[bi == mi] = mat.albedo * mat.emittance
        nee = self.sample_lights(mat_table, bi, pos, bn, wo, rng)
        out += np.where(hit[:, None], emit + nee, 0.0)

        if bounce < max_bounces:
            wi = np.zeros((m, 3))
            pdf = np.ones(m)
            f = np.zeros((m, 3))
            for mi, mat in enumerate(mat_table):
                sel = bi == mi
                if sel.any():
                    wi_s, pdf_s, _ = mat.sample_f(bn[sel], wo[sel], rng)
                    wi[sel] = wi_s
                    pdf[sel] = pdf_s
                    f[sel] = mat.bsdf(bn[sel], wo[sel], wi_s)
            sub = self.trace(pos, wi, bounce + 1, max_bounces, rng)
            indirect = (
                f * sub * (np.abs(_dot(wi, bn)) / np.maximum(pdf, 1e-300))[:, None]
            )
            out += np.where(hit[:, None], np.minimum(indirect, FIREFLY_CLAMP), 0.0)
        return out


def render(scene, eye, target, up, fov, width, height, spp, max_bounces, seed=0):
    """camera.rs:44-55 look_at + :65-82 cast_ray + renderer.rs:173-184 NDC."""
    eye = np.asarray(eye, np.float64)
    direction = _norm(np.asarray(target, np.float64) - eye)
    upv = np.asarray(up, np.float64)
    # look_at re-orthogonalizes up
    right = _norm(np.cross(direction, upv))
    upv = _norm(np.cross(right, direction))
    dpl = 1.0 / np.tan(fov / 2.0)

    rng = np.random.default_rng(seed)
    dim = float(max(width, height))
    xs = np.arange(width * height)
    px = (xs % width).astype(np.float64)
    py = (xs // width).astype(np.float64)
    xn = (2.0 * px + 1.0 - width) / dim
    yn = (2.0 * (height - py) - 1.0 - height) / dim

    acc = np.zeros((width * height, 3))
    for _ in range(spp):
        jx = rng.uniform(-1.0 / dim, 1.0 / dim, xn.shape)
        jy = rng.uniform(-1.0 / dim, 1.0 / dim, yn.shape)
        d = (
            dpl * direction[None, :]
            + (xn + jx)[:, None] * right[None, :]
            + (yn + jy)[:, None] * upv[None, :]
        )
        d = _norm(d)
        o = np.tile(eye, (len(xs), 1))
        acc += scene.trace(o, d, 0, max_bounces, rng)
    return acc / spp
