"""OpenPBR-flavored BSDF: eval / sample / pdf (jnp, branch-free, batched).

TPU-native counterpart of the reference's HLSL BSDF stdlib
(Common/BSDF.hlsli:52-103 lobe structure, BSDFSampling.hlsli GGX VNDF
sampling). Round-1 scope: the metalness workflow with two lobes --

  DIFFUSE_R : Lambert, energy (1 - metallic) * base_color
  GLOSSY_R  : GGX microfacet reflection, Smith height-correlated G2,
              Schlick Fresnel with F0 = lerp(spec_from_ior, base, metallic),
              sampled via Heitz VNDF

Transmission (GLOSSY_T/DIFFUSE_T) and COAT lobes follow the same scaffolding
and land next (flags already flow through the material table). All functions
operate in the local shading frame (+Z = shading normal) on [N, ...] batches;
no data-dependent branches, so everything fuses on the VPU.

Sampling uses the standard one-sample mixture: pick a lobe with probability
proportional to its approximate albedo, sample it, and return the *mixture*
pdf so the estimator stays unbiased (matches the reference's lobe-probability
machinery in BSDF.hlsli ShadingData).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.sampling import square_to_cosine_hemisphere

_MIN_ALPHA = 1e-4
_INV_PI = 1.0 / jnp.pi


class MatParams(NamedTuple):
    """Per-ray shading parameters gathered from the material table."""

    base_color: jnp.ndarray  # [N, 3]
    metallic: jnp.ndarray  # [N]
    roughness: jnp.ndarray  # [N]
    ior: jnp.ndarray  # [N]
    transmission: jnp.ndarray  # [N] (reserved; not yet shaded)


def gather_mat(scene, mat_id: jnp.ndarray) -> MatParams:
    return MatParams(
        base_color=scene.mat_base_color[mat_id],
        metallic=scene.mat_metallic[mat_id],
        roughness=scene.mat_roughness[mat_id],
        ior=scene.mat_ior[mat_id],
        transmission=scene.mat_transmission[mat_id],
    )


# ---------------------------------------------------------------------------
# Frames
# ---------------------------------------------------------------------------


def make_frame(n: jnp.ndarray):
    """Branchless orthonormal basis (t, b) for unit normals [..., 3].

    Duff et al. 2017 (Pixar) revised ONB -- the same construction the
    reference's Math.hlsli uses for its shading frames.
    """
    s = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack(
        [1.0 + s * n[..., 0] ** 2 * a, s * b, -s * n[..., 0]], axis=-1
    )
    bt = jnp.stack([b, s + n[..., 1] ** 2 * a, -n[..., 1]], axis=-1)
    return t, bt


def to_local(n, t, b, w):
    """World direction -> local frame (z = n)."""
    return jnp.stack(
        [
            jnp.sum(w * t, -1),
            jnp.sum(w * b, -1),
            jnp.sum(w * n, -1),
        ],
        axis=-1,
    )


def to_world(n, t, b, w):
    return (
        w[..., 0:1] * t + w[..., 1:2] * b + w[..., 2:3] * n
    )


# ---------------------------------------------------------------------------
# GGX microfacet pieces
# ---------------------------------------------------------------------------


def _f0_from_ior(ior):
    r = (ior - 1.0) / (ior + 1.0)
    return r * r


def _fresnel_schlick(f0, cos_h):
    """f0 [...,3], cos_h [...] -> [...,3]."""
    m = jnp.clip(1.0 - cos_h, 0.0, 1.0)
    m2 = m * m
    return f0 + (1.0 - f0) * (m2 * m2 * m)[..., None]


def _ggx_d(alpha2, cos_h):
    c2 = cos_h * cos_h
    denom = c2 * (alpha2 - 1.0) + 1.0
    return alpha2 / jnp.maximum(jnp.pi * denom * denom, 1e-12)


def _smith_lambda(alpha2, cos_t):
    c2 = jnp.clip(cos_t * cos_t, 1e-8, 1.0)
    tan2 = (1.0 - c2) / c2
    return 0.5 * (jnp.sqrt(1.0 + alpha2 * tan2) - 1.0)


def _smith_g1(alpha2, cos_t):
    return 1.0 / (1.0 + _smith_lambda(alpha2, cos_t))


def _smith_g2(alpha2, cos_o, cos_i):
    """Height-correlated Smith masking-shadowing."""
    return 1.0 / (1.0 + _smith_lambda(alpha2, cos_o) + _smith_lambda(alpha2, cos_i))


def sample_ggx_vndf(wo, alpha, u):
    """Heitz 2018 visible-NDF sampling. wo [N,3] local (z up), u [N,2]."""
    # stretch
    v = jnp.stack([wo[..., 0] * alpha, wo[..., 1] * alpha, wo[..., 2]], -1)
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    # ONB around v
    lensq = v[..., 0] ** 2 + v[..., 1] ** 2
    safe = jnp.sqrt(jnp.maximum(lensq, 1e-20))
    x_axis = jnp.stack(
        [jnp.ones_like(safe), jnp.zeros_like(safe), jnp.zeros_like(safe)], -1
    )
    t1 = jnp.where(
        (lensq > 1e-12)[..., None],
        jnp.stack([-v[..., 1], v[..., 0], jnp.zeros_like(safe)], -1)
        / safe[..., None],
        x_axis,
    )
    t2 = jnp.cross(v, t1)
    # sample disk, warp to hemisphere
    r = jnp.sqrt(u[..., 0])
    phi = 2.0 * jnp.pi * u[..., 1]
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + v[..., 2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(0.0, 1.0 - p1 * p1)) + s * p2
    p3 = jnp.sqrt(jnp.maximum(0.0, 1.0 - p1 * p1 - p2 * p2))
    nh = p1[..., None] * t1 + p2[..., None] * t2 + p3[..., None] * v
    # unstretch
    h = jnp.stack(
        [alpha * nh[..., 0], alpha * nh[..., 1], jnp.maximum(nh[..., 2], 1e-6)], -1
    )
    return h / jnp.linalg.norm(h, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# Combined BSDF
# ---------------------------------------------------------------------------


def _lobe_params(mat: MatParams):
    alpha = jnp.maximum(mat.roughness * mat.roughness, _MIN_ALPHA)
    f0_dielec = _f0_from_ior(mat.ior)[..., None] * jnp.ones_like(mat.base_color)
    m = mat.metallic[..., None]
    f0 = f0_dielec * (1.0 - m) + mat.base_color * m
    kd = mat.base_color * (1.0 - m)
    return alpha, f0, kd


def _lum(c):
    return 0.2126 * c[..., 0] + 0.7152 * c[..., 1] + 0.0722 * c[..., 2]


def _spec_select_prob(f0, kd, cos_o):
    """Probability of sampling the specular lobe (approximate albedos)."""
    s = _lum(_fresnel_schlick(f0, cos_o))
    d = _lum(kd)
    return jnp.clip(s / jnp.maximum(s + d, 1e-8), 0.05, 1.0)


def bsdf_eval(mat: MatParams, wo, wi):
    """f(wo, wi) and mixture pdf. wo/wi local frame [N,3], both z > 0 expected.

    Returns (f [N,3], pdf [N]); zero when wi is below the hemisphere.
    """
    alpha, f0, kd = _lobe_params(mat)
    a2 = alpha * alpha
    cos_o = jnp.maximum(wo[..., 2], 1e-6)
    cos_i = wi[..., 2]
    up = cos_i > 1e-6
    cos_i_s = jnp.maximum(cos_i, 1e-6)

    h = wo + wi
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
    cos_h = jnp.clip(h[..., 2], 0.0, 1.0)
    odoth = jnp.maximum(jnp.sum(wo * h, -1), 1e-6)

    d_term = _ggx_d(a2, cos_h)
    g2 = _smith_g2(a2, cos_o, cos_i_s)
    fres = _fresnel_schlick(f0, odoth)
    f_spec = fres * (d_term * g2 / (4.0 * cos_o * cos_i_s))[..., None]
    f_diff = kd * _INV_PI

    pdf_spec = _smith_g1(a2, cos_o) * d_term / (4.0 * cos_o)
    pdf_diff = cos_i_s * _INV_PI
    q = _spec_select_prob(f0, kd, cos_o)
    pdf = q * pdf_spec + (1.0 - q) * pdf_diff

    f = jnp.where(up[..., None], f_spec + f_diff, 0.0)
    pdf = jnp.where(up, pdf, 0.0)
    return f, pdf


def bsdf_sample(mat: MatParams, wo, u):
    """Sample wi given wo (local frame). ``u`` [N,3] uniforms.

    Returns (wi [N,3], weight f*cos/pdf [N,3], pdf [N]).
    """
    alpha, f0, kd = _lobe_params(mat)
    cos_o = jnp.maximum(wo[..., 2], 1e-6)
    q = _spec_select_prob(f0, kd, cos_o)
    pick_spec = u[..., 0] < q

    # specular candidate
    h = sample_ggx_vndf(wo, alpha, u[..., 1:3])
    wi_spec = 2.0 * jnp.sum(wo * h, -1, keepdims=True) * h - wo
    # diffuse candidate
    wi_diff = square_to_cosine_hemisphere(u[..., 1:3])

    wi = jnp.where(pick_spec[..., None], wi_spec, wi_diff)
    f, pdf = bsdf_eval(mat, wo, wi)
    w = f * (jnp.maximum(wi[..., 2], 0.0) / jnp.maximum(pdf, 1e-12))[..., None]
    good = (pdf > 1e-12) & (wi[..., 2] > 1e-6)
    return wi, jnp.where(good[..., None], w, 0.0), jnp.where(good, pdf, 0.0)
