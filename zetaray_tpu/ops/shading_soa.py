"""SoA shading math shared by the Pallas megakernel and the XLA oracle.

Same physics as ops.bsdf / ops.lights (OpenPBR-lite: Lambert + GGX-VNDF with
height-correlated Smith and Schlick Fresnel; power-heuristic MIS), rewritten
over core.vec3's component-tuple vectors so it compiles cleanly inside
Mosaic. Every function is shape-polymorphic pure jnp: the megakernel calls
it on [tc]-lane tiles, tests call it on flat arrays and compare against the
AoS implementation in ops/bsdf.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import vec3 as v3
from ..core.vec3 import V3

_MIN_ALPHA = 1e-4
_INV_PI = 1.0 / 3.14159265358979


class MatSoA(NamedTuple):
    base: V3
    metallic: jnp.ndarray
    roughness: jnp.ndarray
    ior: jnp.ndarray
    # transmission weight [0,1] and relative IOR along the ray
    # (eta = eta_incident / eta_transmitted: entering glass -> 1/ior).
    # Both default to opaque-entering so existing call sites stay valid.
    transmission: jnp.ndarray | None = None
    eta: jnp.ndarray | None = None
    # OpenPBR coat: weight [0,1] + coat GGX roughness (reference
    # BSDF.hlsli:58,869-891). None compiles the lobe out entirely.
    coat: jnp.ndarray | None = None
    coat_roughness: jnp.ndarray | None = None

    def trans(self):
        return (
            self.transmission
            if self.transmission is not None
            else jnp.zeros_like(self.metallic)
        )

    def eta_rel(self):
        return self.eta if self.eta is not None else 1.0 / self.ior


class Frame(NamedTuple):
    t: V3
    b: V3
    n: V3

    def to_local(self, w: V3) -> V3:
        return V3(v3.dot(w, self.t), v3.dot(w, self.b), v3.dot(w, self.n))

    def to_world(self, w: V3) -> V3:
        return self.t * w.x + self.b * w.y + self.n * w.z


def make_frame(n: V3) -> Frame:
    """Duff et al. branchless ONB (same as ops.bsdf.make_frame)."""
    s = jnp.where(n.z >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n.z)
    b = n.x * n.y * a
    t = V3(1.0 + s * n.x * n.x * a, s * b, -s * n.x)
    bt = V3(b, s + n.y * n.y * a, -n.y)
    return Frame(t, bt, n)


def _f0_from_ior(ior):
    r = (ior - 1.0) / (ior + 1.0)
    return r * r


def _fresnel(f0: V3, cos_h) -> V3:
    m = jnp.clip(1.0 - cos_h, 0.0, 1.0)
    m5 = (m * m) * (m * m) * m
    return f0 + (v3.splat(1.0) - f0) * m5


def _ggx_d(a2, cos_h):
    c2 = cos_h * cos_h
    den = c2 * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(3.14159265 * den * den, 1e-12)


def _smith_lambda(a2, cos_t):
    c2 = jnp.clip(cos_t * cos_t, 1e-8, 1.0)
    return 0.5 * (jnp.sqrt(1.0 + a2 * (1.0 - c2) / c2) - 1.0)


def _g1(a2, c):
    return 1.0 / (1.0 + _smith_lambda(a2, c))


def _g2(a2, co, ci):
    return 1.0 / (1.0 + _smith_lambda(a2, co) + _smith_lambda(a2, ci))


def _lobe_params(mat: MatSoA):
    """kt is None when the material table has no transmission -- callers
    static-branch on it so the transmission lobe compiles out entirely
    (the reference's shader-variant specialization)."""
    alpha = jnp.maximum(mat.roughness * mat.roughness, _MIN_ALPHA)
    f0d = _f0_from_ior(mat.ior)
    m = mat.metallic
    f0 = V3(
        f0d * (1.0 - m) + mat.base.x * m,
        f0d * (1.0 - m) + mat.base.y * m,
        f0d * (1.0 - m) + mat.base.z * m,
    )
    if mat.transmission is None:
        return alpha, f0, mat.base * (1.0 - m), None
    t = mat.transmission
    kd = mat.base * ((1.0 - m) * (1.0 - t))
    kt = mat.base * ((1.0 - m) * t)
    return alpha, f0, kd, kt


def _lobe_probs(f0: V3, kd: V3, kt: V3, cos_o):
    """(q_spec, q_diff, q_trans): one-sample lobe selection probabilities."""
    s = v3.luminance(_fresnel(f0, cos_o))
    d = v3.luminance(kd)
    if kt is None:
        q_s = jnp.clip(s / jnp.maximum(s + d, 1e-8), 0.05, 1.0)
        return q_s, 1.0 - q_s, None
    t = v3.luminance(kt)
    tot = jnp.maximum(s + d + t, 1e-8)
    q_s = jnp.clip(s / tot, 0.05, 1.0)
    q_t = t / tot * (1.0 - q_s) / jnp.maximum(1.0 - s / tot, 1e-8)
    q_t = jnp.minimum(q_t, 1.0 - q_s)
    q_d = jnp.maximum(1.0 - q_s - q_t, 0.0)
    return q_s, q_d, q_t


# ---------------------------------------------------------------------------
# GGX directional albedo (single-scatter, F=1) -- polynomial fit computed
# once at import by NumPy quadrature. Drives Kulla-Conty/Turquin-style
# multiple-scattering energy compensation (reference: BSDF.hlsli multiscatter
# energy comp) as pure multiply-adds with Python-float coefficients, so it
# runs unchanged inside Pallas kernels (no tables, no gathers, no device
# constants).
# ---------------------------------------------------------------------------


def _fit_ggx_albedo_poly(deg: int = 3):
    import numpy as np

    nmu, na = 32, 32
    mu = np.linspace(0.02, 1.0, nmu)
    al = np.linspace(0.04, 1.0, na)
    # stratified VNDF importance sampling: E = mean(G2/G1), which handles
    # arbitrarily sharp lobes (uniform hemisphere quadrature does not)
    ns = 48
    g1, g2g = np.meshgrid(
        (np.arange(ns) + 0.5) / ns, (np.arange(ns) + 0.5) / ns, indexing="ij"
    )
    u1 = g1.reshape(-1)
    u2 = g2g.reshape(-1)

    def lam(a2, c):
        c2 = np.clip(c * c, 1e-8, 1.0)
        return 0.5 * (np.sqrt(1.0 + a2 * (1.0 - c2) / c2) - 1.0)

    e = np.zeros((nmu, na))
    for i, m in enumerate(mu):
        so = np.sqrt(max(1.0 - m * m, 0.0))
        for k, a in enumerate(al):
            alpha = a * a
            a2 = alpha * alpha
            # VNDF sample (Heitz 2018) around wo = (so, 0, m)
            vx, vy, vz = so * alpha, 0.0, m
            vl = np.sqrt(vx * vx + vy * vy + vz * vz)
            vx, vy, vz = vx / vl, vy / vl, vz / vl
            lensq = vx * vx + vy * vy
            if lensq > 1e-12:
                inv = 1.0 / np.sqrt(lensq)
                t1 = np.array([-vy * inv, vx * inv, 0.0])
            else:
                t1 = np.array([1.0, 0.0, 0.0])
            t2 = np.cross(np.array([vx, vy, vz]), t1)
            r = np.sqrt(u1)
            phi = 2.0 * np.pi * u2
            p1 = r * np.cos(phi)
            p2 = r * np.sin(phi)
            s = 0.5 * (1.0 + vz)
            p2 = (1.0 - s) * np.sqrt(np.maximum(0.0, 1.0 - p1 * p1)) + s * p2
            p3 = np.sqrt(np.maximum(0.0, 1.0 - p1 * p1 - p2 * p2))
            nh = (
                p1[:, None] * t1[None]
                + p2[:, None] * t2[None]
                + p3[:, None] * np.array([vx, vy, vz])[None]
            )
            h = np.stack(
                [alpha * nh[:, 0], alpha * nh[:, 1], np.maximum(nh[:, 2], 1e-6)],
                -1,
            )
            h /= np.linalg.norm(h, axis=-1, keepdims=True)
            wo = np.array([so, 0.0, m])
            wi = 2.0 * (h @ wo)[:, None] * h - wo
            up = wi[:, 2] > 1e-6
            g2 = 1.0 / (1.0 + lam(a2, m) + lam(a2, np.clip(wi[:, 2], 1e-6, 1.0)))
            g1v = 1.0 / (1.0 + lam(a2, m))
            e[i, k] = np.mean(np.where(up, g2 / g1v, 0.0))
    e = np.clip(e, 1e-3, 1.0)

    # least-squares polynomial in (mu, roughness)
    mm, aa = np.meshgrid(mu, al, indexing="ij")
    basis = np.stack(
        [mm**i * aa**j for i in range(deg + 1) for j in range(deg + 1)], -1
    ).reshape(-1, (deg + 1) ** 2)
    coef, *_ = np.linalg.lstsq(basis, e.reshape(-1), rcond=None)

    # cosine-weighted hemispherical average E_avg(a) = 2 int E(mu) mu dmu
    dmu = mu[1] - mu[0]
    e_avg = 2.0 * np.sum(e * mu[:, None] * dmu, axis=0)
    basis_a = np.stack([al**j for j in range(deg + 2)], -1)
    coef_a, *_ = np.linalg.lstsq(basis_a, e_avg, rcond=None)
    return tuple(float(c) for c in coef), tuple(float(c) for c in coef_a), deg


_GGX_E_COEF, _GGX_EAVG_COEF, _GGX_E_DEG = _fit_ggx_albedo_poly()


def ggx_albedo(cos_o, rough):
    """Fitted single-scatter GGX directional albedo E(cos_o, roughness)."""
    d = _GGX_E_DEG
    out = 0.0
    idx = 0
    mi = jnp.clip(cos_o, 0.02, 1.0)
    ai = jnp.clip(rough, 0.04, 1.0)
    mp = 1.0
    for i in range(d + 1):
        ap = 1.0
        for j in range(d + 1):
            out = out + _GGX_E_COEF[idx] * mp * ap
            idx += 1
            ap = ap * ai
        mp = mp * mi
    return jnp.clip(out, 0.05, 1.0)


def ggx_albedo_avg(rough):
    """Fitted cosine-weighted average GGX albedo E_avg(roughness)."""
    ai = jnp.clip(rough, 0.04, 1.0)
    out = 0.0
    ap = 1.0
    for c in _GGX_EAVG_COEF:
        out = out + c * ap
        ap = ap * ai
    return jnp.clip(out, 0.05, 1.0)


def _ms_lobe(f0: V3, rough, cos_o, cos_i) -> V3:
    """Kulla-Conty multiple-scattering lobe for GGX reflection:
    f_ms = (1-E(o))(1-E(i)) / (pi (1-E_avg)) * Fresnel_ms. Reciprocal, and
    the white furnace is exact at f0 = 1 (E(o) + (1-E(o)) = 1)."""
    e_o = ggx_albedo(cos_o, rough)
    e_i = ggx_albedo(cos_i, rough)
    e_avg = ggx_albedo_avg(rough)
    ms = (1.0 - e_o) * (1.0 - e_i) / (
        3.14159265 * jnp.maximum(1.0 - e_avg, 1e-4)
    )
    f_avg = f0 + (v3.splat(1.0) - f0) * (1.0 / 21.0)

    def fres(fa):
        return fa * fa * e_avg / jnp.maximum(1.0 - fa * (1.0 - e_avg), 1e-4)

    return V3(ms * fres(f_avg.x), ms * fres(f_avg.y), ms * fres(f_avg.z))


_COAT_F0 = 0.04  # coat IOR 1.5 (reference Material.h coat defaults)


def _fresnel_s(f0, cos_h):
    m = jnp.clip(1.0 - cos_h, 0.0, 1.0)
    m5 = (m * m) * (m * m) * m
    return f0 + (1.0 - f0) * m5


def _fresnel_scalar_dielectric(cos_i, eta):
    """Exact unpolarized dielectric Fresnel; eta = eta_i/eta_t; TIR -> 1."""
    cos_i = jnp.clip(cos_i, 0.0, 1.0)
    sin2_t = eta * eta * (1.0 - cos_i * cos_i)
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    r_par = (cos_i - eta * cos_t) / jnp.maximum(cos_i + eta * cos_t, 1e-8)
    r_perp = (eta * cos_i - cos_t) / jnp.maximum(eta * cos_i + cos_t, 1e-8)
    f = 0.5 * (r_par * r_par + r_perp * r_perp)
    return jnp.where(tir, 1.0, jnp.clip(f, 0.0, 1.0))


def _transmission_terms(mat: MatSoA, wo: V3, wi: V3, alpha, kt: V3):
    """Walter-2007 rough dielectric BTDF + half-vector pdf for wi.z < 0.

    Follows the pbrt formulation with eta = eta_i/eta_t along the ray and
    includes the (eta^2) radiance transport factor (matching the
    reference's GLOSSY_T conventions, BSDF.hlsli).
    """
    eta = mat.eta_rel()
    inv_eta = 1.0 / eta
    a2 = alpha * alpha
    cos_o = jnp.maximum(wo.z, 1e-6)
    cos_i = jnp.maximum(-wi.z, 1e-6)
    h = v3.normalize(wo + wi * inv_eta, eps=1e-24)
    h = v3.where(h.z < 0.0, -h, h)
    odoth = v3.dot(wo, h)
    idoth = v3.dot(wi, h)
    valid = (odoth > 1e-6) & (idoth < -1e-6)
    dt = _ggx_d(a2, jnp.clip(h.z, 0.0, 1.0))
    g2 = _g2(a2, cos_o, cos_i)
    fr = _fresnel_scalar_dielectric(odoth, eta)
    denom = odoth + inv_eta * idoth
    denom2 = jnp.maximum(denom * denom, 1e-12)
    # Walter's eta_t^2 numerator cancels exactly against the radiance
    # transport factor (etaI/etaT)^2 once the denominator is normalized by
    # eta_t (pbrt's formulation), so no eta factor remains here; the smooth
    # limit of f*cos/pdf is then (1-F)/eta_pbrt^2, matching specular glass.
    scale = (
        (1.0 - fr) * dt * g2 * jnp.abs(idoth) * jnp.abs(odoth)
        / (cos_o * cos_i * denom2)
    )
    f_t = kt * jnp.where(valid, scale, 0.0)
    dwh_dwi = jnp.abs(idoth) * (inv_eta * inv_eta) / denom2
    pdf_t = _g1(a2, cos_o) * dt * jnp.maximum(odoth, 0.0) / cos_o * dwh_dwi
    return f_t, jnp.where(valid, pdf_t, 0.0), fr, h


def _coat_q(mat: MatSoA, cos_o):
    """Coat sampling probability (0 when the lobe is compiled out)."""
    if mat.coat is None:
        return None
    return jnp.clip(mat.coat * _fresnel_s(_COAT_F0, cos_o) * 2.0, 0.0, 0.5)


def bsdf_eval(mat: MatSoA, wo: V3, wi: V3):
    """(f [V3], pdf) in the local frame.

    wi.z > 0: [coat GGX layer +] GGX reflection with multiple-scattering
    energy compensation + Lambert diffuse (diffuse and transmission energy
    split by the transmission factor). wi.z < 0: rough dielectric
    transmission (Walter 2007). The coat layers via Fresnel-weighted albedo
    scaling: f = f_coat + (1 - cw*Fc(o))(1 - cw*Fc(i)) * f_base
    (BSDF.hlsli COAT semantics).
    """
    alpha, f0, kd, kt = _lobe_params(mat)
    a2 = alpha * alpha
    cos_o = jnp.maximum(wo.z, 1e-6)
    q_s, q_d, q_t = _lobe_probs(f0, kd, kt, cos_o)
    up = wi.z > 1e-6
    down = wi.z < -1e-6
    cos_i = jnp.maximum(wi.z, 1e-6)

    # reflection side
    h = v3.normalize(wo + wi, eps=1e-24)
    cos_h = jnp.clip(h.z, 0.0, 1.0)
    odoth = jnp.maximum(v3.dot(wo, h), 1e-6)
    dt = _ggx_d(a2, cos_h)
    g2 = _g2(a2, cos_o, cos_i)
    fr = _fresnel(f0, odoth)
    f_ms = _ms_lobe(f0, mat.roughness, cos_o, cos_i)
    f_refl = fr * (dt * g2 / (4.0 * cos_o * cos_i)) + f_ms + kd * _INV_PI
    pdf_spec = _g1(a2, cos_o) * dt / (4.0 * cos_o)
    pdf_refl = q_s * pdf_spec + q_d * (cos_i * _INV_PI)

    q_c = _coat_q(mat, cos_o)
    if q_c is not None:
        cw = mat.coat
        ca = jnp.maximum(mat.coat_roughness * mat.coat_roughness, _MIN_ALPHA)
        ca2 = ca * ca
        fc_o = cw * _fresnel_s(_COAT_F0, cos_o)
        fc_i = cw * _fresnel_s(_COAT_F0, cos_i)
        dt_c = _ggx_d(ca2, cos_h)
        g2_c = _g2(ca2, cos_o, cos_i)
        f_coat = (
            cw * _fresnel_s(_COAT_F0, odoth) * dt_c * g2_c
            / (4.0 * cos_o * cos_i)
        )
        att = (1.0 - fc_o) * (1.0 - fc_i)
        f_refl = V3(
            f_coat + att * f_refl.x,
            f_coat + att * f_refl.y,
            f_coat + att * f_refl.z,
        )
        pdf_coat = _g1(ca2, cos_o) * dt_c / (4.0 * cos_o)
        pdf_refl = q_c * pdf_coat + (1.0 - q_c) * pdf_refl
    else:
        fc_o = None

    zero = jnp.zeros_like(cos_o)
    if kt is None:  # opaque: transmission lobe compiled out
        f = v3.where(up, f_refl, V3(zero, zero, zero))
        return f, jnp.where(up, pdf_refl, 0.0)

    # transmission side
    f_tr, pdf_tr_h, _, _ = _transmission_terms(mat, wo, wi, alpha, kt)
    if q_c is not None:
        # coat attenuates transmitted energy on both interfaces
        att_t = (1.0 - fc_o) * (
            1.0 - mat.coat * _fresnel_s(_COAT_F0, jnp.maximum(-wi.z, 1e-6))
        )
        f_tr = f_tr * att_t
        pdf_tr = (1.0 - q_c) * q_t * pdf_tr_h
    else:
        pdf_tr = q_t * pdf_tr_h

    f = v3.where(up, f_refl, v3.where(down, f_tr, V3(zero, zero, zero)))
    pdf = jnp.where(up, pdf_refl, jnp.where(down, pdf_tr, 0.0))
    return f, pdf


def _cosine_hemisphere(u1, u2) -> V3:
    # concentric disk
    a = 2.0 * u1 - 1.0
    b = 2.0 * u2 - 1.0
    cond = jnp.abs(a) > jnp.abs(b)
    r = jnp.where(cond, a, b)
    safe = jnp.where(r == 0.0, 1.0, r)
    phi = jnp.where(
        cond, (jnp.pi / 4.0) * (b / safe), (jnp.pi / 2.0) - (jnp.pi / 4.0) * (a / safe)
    )
    phi = jnp.where(r == 0.0, 0.0, phi)
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - x * x - y * y))
    return V3(x, y, z)


def _ggx_vndf(wo: V3, alpha, u1, u2) -> V3:
    v = v3.normalize(V3(wo.x * alpha, wo.y * alpha, wo.z))
    lensq = v.x * v.x + v.y * v.y
    safe = jax.lax.rsqrt(jnp.maximum(lensq, 1e-20))
    big = lensq > 1e-12
    t1 = V3(
        jnp.where(big, -v.y * safe, 1.0),
        jnp.where(big, v.x * safe, 0.0),
        jnp.zeros_like(v.x),
    )
    t2 = v3.cross(v, t1)
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + v.z)
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(0.0, 1.0 - p1 * p1)) + s * p2
    p3 = jnp.sqrt(jnp.maximum(0.0, 1.0 - p1 * p1 - p2 * p2))
    nh = t1 * p1 + t2 * p2 + v * p3
    return v3.normalize(V3(alpha * nh.x, alpha * nh.y, jnp.maximum(nh.z, 1e-6)))


def bsdf_sample(mat: MatSoA, wo: V3, u1, u2, u3):
    """Sample wi. Returns (wi [V3], weight f*|cos|/pdf [V3], pdf).

    One-sample lobe mixture over {GGX reflection, diffuse, GGX
    transmission}. TIR on the transmission pick kills the sample (small,
    documented energy loss at grazing glass; exact TIR-as-reflection
    accounting is a follow-up).
    """
    alpha, f0, kd, kt = _lobe_params(mat)
    cos_o = jnp.maximum(wo.z, 1e-6)
    q_s, q_d, q_t = _lobe_probs(f0, kd, kt, cos_o)

    # coat pick first (prob q_c), then the base mixture on rescaled u1 --
    # matches bsdf_eval's pdf composition exactly
    q_c = _coat_q(mat, cos_o)
    if q_c is not None:
        pick_coat = u1 < q_c
        u1 = jnp.clip((u1 - q_c) / jnp.maximum(1.0 - q_c, 1e-6), 0.0, 1.0)
        ca = jnp.maximum(mat.coat_roughness * mat.coat_roughness, _MIN_ALPHA)
        h_c = _ggx_vndf(wo, ca, u2, u3)
        wi_coat = h_c * (2.0 * v3.dot(wo, h_c)) - wo
    pick_spec = u1 < q_s

    h = _ggx_vndf(wo, alpha, u2, u3)
    wi_spec = h * (2.0 * v3.dot(wo, h)) - wo
    wi_diff = _cosine_hemisphere(u2, u3)

    if kt is None:  # opaque: two-lobe path only
        wi = v3.where(pick_spec, wi_spec, wi_diff)
        if q_c is not None:
            wi = v3.where(pick_coat, wi_coat, wi)
        f, pdf = bsdf_eval(mat, wo, wi)
        good = (pdf > 1e-12) & (wi.z > 1e-6)
        scale = jnp.where(good, jnp.abs(wi.z) / jnp.maximum(pdf, 1e-12), 0.0)
        return wi, f * scale, jnp.where(good, pdf, 0.0)

    pick_trans = (u1 >= q_s) & (u1 < q_s + q_t)
    # refraction through the sampled half-vector
    eta = mat.eta_rel()
    odoth = v3.dot(wo, h)
    sin2_t = eta * eta * (1.0 - odoth * odoth)
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    wi_trans = (h * (eta * odoth - cos_t)) - wo * eta

    wi = v3.where(pick_spec, wi_spec, v3.where(pick_trans, wi_trans, wi_diff))
    if q_c is not None:
        wi = v3.where(pick_coat, wi_coat, wi)
        pick_trans = pick_trans & ~pick_coat
    f, pdf = bsdf_eval(mat, wo, wi)
    # and/or logic (Mosaic cannot select between i1 vectors)
    hemi_ok = (pick_trans & (wi.z < -1e-6) & ~tir) | (
        ~pick_trans & (wi.z > 1e-6)
    )
    good = (pdf > 1e-12) & hemi_ok
    scale = jnp.where(good, jnp.abs(wi.z) / jnp.maximum(pdf, 1e-12), 0.0)
    return wi, f * scale, jnp.where(good, pdf, 0.0)


def power_heuristic(pdf_a, pdf_b):
    a2 = pdf_a * pdf_a
    return a2 / jnp.maximum(a2 + pdf_b * pdf_b, 1e-20)


def triangle_sample(u1, u2):
    """Heitz low-distortion square->triangle barycentrics (b1, b2)."""
    flip = u2 > u1
    b1 = jnp.where(flip, u1 * 0.5, u1 - u2 * 0.5)
    b2 = jnp.where(flip, u2 - u1 * 0.5, u2 * 0.5)
    return b1, b2


def pcg4d_soa(a, b, c, d):
    """pcg4d on four same-shaped uint32 arrays -> four uint32 arrays."""
    u = jnp.uint32
    a = a.astype(u) * u(1664525) + u(1013904223)
    b = b.astype(u) * u(1664525) + u(1013904223)
    c = c.astype(u) * u(1664525) + u(1013904223)
    d = d.astype(u) * u(1664525) + u(1013904223)
    a = a + b * d
    b = b + c * a
    c = c + a * b
    d = d + b * c
    a = a ^ (a >> 16)
    b = b ^ (b >> 16)
    c = c ^ (c >> 16)
    d = d ^ (d >> 16)
    a = a + b * d
    b = b + c * a
    c = c + a * b
    d = d + b * c
    return a, b, c, d


def to_unit_float(bits):
    """uint32 -> [0, 1) float32 using the top 24 bits.

    Goes through int32 (always positive after the shift) because Mosaic has
    no direct uint32->float32 cast.
    """
    return (bits >> 8).astype(jnp.int32).astype(jnp.float32) * (1.0 / 16777216.0)


def hashf4_soa(a, b, c, d):
    """Four [0,1) uniforms from four f32 counters -- float-ALU hash.

    TPU VPUs emulate 32-bit integer multiplies slowly (measured round 3:
    the pcg4d stream hash dominates the bounce megakernel), so this is the
    float-native alternative: a Hoskins-style "hash without sine" over the
    (pixel, bounce, seed, salt) counters, ~20 f32 FMAs + floors. 24-bit
    output resolution (f32 mantissa); quality validated against pcg4d by
    the integrator-agreement tests. Inputs must be small-magnitude floats
    (callers pre-scale counters into [0, ~1e4]).
    """
    def frac(x):
        return x - jnp.floor(x)

    def round4(va, vb, vc, vd):
        dot = va * vd + vb * vc + vc * va + vd * vb + 33.33
        va = va + dot
        vb = vb + dot
        vc = vc + dot
        vd = vd + dot
        return (
            frac((va + vb) * vc),
            frac((vb + vc) * vd),
            frac((vc + vd) * va),
            frac((va + vd) * vb),
        )

    va = frac(a * 0.1031 + b * 0.030197 + d * 0.0019)
    vb = frac(b * 0.1030 + c * 0.049831 + d * 0.0173)
    vc = frac(c * 0.0973 + a * 0.070919 + d * 0.0419)
    vd = frac(d * 0.1099 + a * 0.020399 + b * 0.0083)
    va, vb, vc, vd = round4(va, vb, vc, vd)
    # second round decorrelates adjacent counters (lag-1 corr measured
    # -0.4 after one round, < 0.01 after two)
    va, vb, vc, vd = round4(
        va * 127.1, vb * 311.7, vc * 74.7, vd * 269.5
    )
    return va, vb, vc, vd
