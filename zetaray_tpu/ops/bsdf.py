"""AoS BSDF interface: adapters over the single SoA implementation.

The physics lives in ops/shading_soa.py (shared with the Pallas
megakernel); this module provides the [N, 3]-array-of-structs view used by
the XLA reference tracer and the test suite, plus the frame utilities.
Counterpart of the reference's BSDF.hlsli / BSDFSampling.hlsli surface.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.vec3 import V3
from . import shading_soa as S

# Re-exported sampling pieces some callers/tests use directly.
sample_ggx_vndf = None  # replaced below with an AoS adapter


class MatParams(NamedTuple):
    """Per-ray shading parameters gathered from the material table."""

    base_color: jnp.ndarray  # [N, 3]
    metallic: jnp.ndarray  # [N]
    roughness: jnp.ndarray  # [N]
    ior: jnp.ndarray  # [N]
    transmission: jnp.ndarray  # [N]
    coat: jnp.ndarray | None = None  # [N] or None (lobe compiled out)
    coat_roughness: jnp.ndarray | None = None


def gather_mat(scene, mat_id: jnp.ndarray) -> MatParams:
    return MatParams(
        base_color=scene.mat_base_color[mat_id],
        metallic=scene.mat_metallic[mat_id],
        roughness=scene.mat_roughness[mat_id],
        ior=scene.mat_ior[mat_id],
        transmission=scene.mat_transmission[mat_id],
        coat=scene.mat_coat_weight[mat_id] if scene.has_coat else None,
        coat_roughness=(
            scene.mat_coat_roughness[mat_id] if scene.has_coat else None
        ),
    )


# ---------------------------------------------------------------------------
# Frames (AoS)
# ---------------------------------------------------------------------------


def make_frame(n: jnp.ndarray):
    """Branchless ONB for unit normals [..., 3] -> (tangent, bitangent)."""
    fr = S.make_frame(V3(n[..., 0], n[..., 1], n[..., 2]))
    t = jnp.stack([fr.t.x, fr.t.y, fr.t.z], axis=-1)
    b = jnp.stack([fr.b.x, fr.b.y, fr.b.z], axis=-1)
    return t, b


def to_local(n, t, b, w):
    return jnp.stack(
        [jnp.sum(w * t, -1), jnp.sum(w * b, -1), jnp.sum(w * n, -1)], axis=-1
    )


def to_world(n, t, b, w):
    return w[..., 0:1] * t + w[..., 1:2] * b + w[..., 2:3] * n


# ---------------------------------------------------------------------------
# Eval / sample adapters
# ---------------------------------------------------------------------------


def _soa_mat(mat: MatParams, eta=None) -> S.MatSoA:
    return S.MatSoA(
        base=V3(mat.base_color[..., 0], mat.base_color[..., 1], mat.base_color[..., 2]),
        metallic=mat.metallic,
        roughness=mat.roughness,
        ior=mat.ior,
        transmission=mat.transmission,
        eta=eta,
        coat=mat.coat,
        coat_roughness=mat.coat_roughness,
    )


def _v(w):
    return V3(w[..., 0], w[..., 1], w[..., 2])


def bsdf_eval(mat: MatParams, wo, wi, eta=None):
    """f(wo, wi) and mixture pdf; local frame [N,3] vectors.

    ``eta``: relative IOR along the ray (defaults to entering: 1/ior).
    wi below the hemisphere evaluates the transmission lobe.
    """
    f, pdf = S.bsdf_eval(_soa_mat(mat, eta), _v(wo), _v(wi))
    return jnp.stack([f.x, f.y, f.z], axis=-1), pdf


def bsdf_sample(mat: MatParams, wo, u, eta=None):
    """Sample wi given wo. ``u`` [N,3] uniforms.

    Returns (wi [N,3], weight f*|cos|/pdf [N,3], pdf [N]).
    """
    wi, w, pdf = S.bsdf_sample(
        _soa_mat(mat, eta), _v(wo), u[..., 0], u[..., 1], u[..., 2]
    )
    return (
        jnp.stack([wi.x, wi.y, wi.z], axis=-1),
        jnp.stack([w.x, w.y, w.z], axis=-1),
        pdf,
    )


def sample_ggx_vndf(wo, alpha, u):  # noqa: F811 (AoS adapter)
    h = S._ggx_vndf(_v(wo), alpha, u[..., 0], u[..., 1])
    return jnp.stack([h.x, h.y, h.z], axis=-1)
