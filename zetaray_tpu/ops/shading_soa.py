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


def bsdf_eval(mat: MatSoA, wo: V3, wi: V3):
    """(f [V3], pdf) in the local frame.

    wi.z > 0: GGX reflection + Lambert diffuse (diffuse and transmission
    energy split by the transmission factor). wi.z < 0: rough dielectric
    transmission (Walter 2007).
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
    f_refl = fr * (dt * g2 / (4.0 * cos_o * cos_i)) + kd * _INV_PI
    pdf_spec = _g1(a2, cos_o) * dt / (4.0 * cos_o)
    pdf_refl = q_s * pdf_spec + q_d * (cos_i * _INV_PI)

    zero = jnp.zeros_like(cos_o)
    if kt is None:  # opaque: transmission lobe compiled out
        f = v3.where(up, f_refl, V3(zero, zero, zero))
        return f, jnp.where(up, pdf_refl, 0.0)

    # transmission side
    f_tr, pdf_tr_h, _, _ = _transmission_terms(mat, wo, wi, alpha, kt)
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
    pick_spec = u1 < q_s

    h = _ggx_vndf(wo, alpha, u2, u3)
    wi_spec = h * (2.0 * v3.dot(wo, h)) - wo
    wi_diff = _cosine_hemisphere(u2, u3)

    if kt is None:  # opaque: two-lobe path only
        wi = v3.where(pick_spec, wi_spec, wi_diff)
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
