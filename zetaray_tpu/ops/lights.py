"""Emissive-triangle light sampling (NEE) + MIS weights.

Counterpart of the reference's many-light machinery: alias-table emissive
selection (Common/LightSource.hlsli:72-96 ``SampleAliasTable``) + uniform
area sampling of the chosen triangle, with the solid-angle/area measure
conversions needed for MIS against BSDF sampling. Presampled sets and the
light voxel grid (PreLighting) layer on top of this in later rounds -- they
only change *which* light gets picked, not the math here.

Emission is one-sided for single-sided materials (geometric-normal side) and
two-sided when the material is double-sided, matching how the reference's
EmissiveTriangle lighting treats alpha/double-sided emitters.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.sampling import sample_alias, square_to_triangle


class LightSample(NamedTuple):
    pos: jnp.ndarray  # [N, 3] point on the light
    ng: jnp.ndarray  # [N, 3] light geometric normal (unit)
    le: jnp.ndarray  # [N, 3] radiance
    pdf_area: jnp.ndarray  # [N] pdf in area measure
    tri: jnp.ndarray  # [N] triangle id
    two_sided: jnp.ndarray  # [N] bool


def sample_emissive(scene, u) -> LightSample:
    """Pick an emissive triangle (power-weighted alias table) + point on it.

    ``u``: 4-tuple of [N] uniforms (2 for the alias pick, 2 for the
    barycentrics) -- see core.rng.uniform4.

    Attribute fetch is a one-hot matmul against the denormalized em_attrs
    table (scene.EA layout) instead of a chain of dynamic gathers -- the same
    gather-to-MXU trick as the Pallas closest-hit kernel.
    """
    import jax
    from ..scene.scene import EA

    # The em_* arrays are lane-padded; sample over the true (static) count.
    e = scene.num_emissives
    k = sample_alias(scene.em_prob[:e], scene.em_alias[:e], u[0], u[1])
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (k.shape[0], e), 1) == k[:, None]
    ).astype(jnp.float32)
    row = jnp.dot(
        onehot,
        scene.em_attrs[:e],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    b = square_to_triangle(jnp.stack([u[2], u[3]], -1))
    pos = (
        row[:, EA.V0 : EA.V0 + 3]
        + b[..., 0:1] * row[:, EA.E1 : EA.E1 + 3]
        + b[..., 1:2] * row[:, EA.E2 : EA.E2 + 3]
    )
    return LightSample(
        pos=pos,
        ng=row[:, EA.NG : EA.NG + 3],
        le=row[:, EA.LE : EA.LE + 3],
        pdf_area=row[:, EA.PDF_AREA],
        tri=scene.em_tri[k],
        two_sided=row[:, EA.TWO_SIDED] > 0.5,
    )


def light_pdf_area(scene, tri: jnp.ndarray) -> jnp.ndarray:
    """Area-measure pdf of sampling ``tri`` via :func:`sample_emissive`.

    Zero for non-emissive triangles. Used for MIS when a BSDF-sampled ray
    happens to hit an emitter.
    """
    k = scene.em_of_tri[jnp.maximum(tri, 0)]
    k_safe = jnp.maximum(k, 0)
    pdf = scene.em_pdf[k_safe] / jnp.maximum(scene.em_area[k_safe], 1e-12)
    return jnp.where((k >= 0) & (tri >= 0), pdf, 0.0)


def pdf_area_to_solid_angle(pdf_area, dist2, cos_light):
    """Convert an area-measure pdf to solid-angle measure at the shading pt."""
    return pdf_area * dist2 / jnp.maximum(cos_light, 1e-8)


def power_heuristic(pdf_a, pdf_b):
    """Power heuristic (beta = 2), the reference's MIS weight of choice."""
    a2 = pdf_a * pdf_a
    return a2 / jnp.maximum(a2 + pdf_b * pdf_b, 1e-20)


def emitted_radiance(scene, tri, wo_dot_ng):
    """Radiance emitted toward the viewer from triangle ``tri``.

    ``wo_dot_ng``: cosine between the (unflipped) geometric normal and the
    direction toward the previous path vertex. One-sided emitters emit only
    where it is positive.
    """
    tri_safe = jnp.maximum(tri, 0)
    mat = scene.mat_id[tri_safe]
    le = scene.mat_emissive[mat]
    two_sided = scene.mat_double_sided[mat]
    visible_side = two_sided | (wo_dot_ng > 0.0)
    return jnp.where((tri >= 0)[..., None] & visible_side[..., None], le, 0.0)
