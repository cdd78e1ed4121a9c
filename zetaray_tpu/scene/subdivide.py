"""Triangle subdivision: procedurally scale a scene's triangle count.

Midpoint 1-to-4 subdivision that preserves the rendered geometry exactly
(vertices/normals/uvs are linearly interpolated on the same surfaces), so a
subdivided Cornell renders the same image while stressing the BVH-cluster
streaming traversal (accel.stream) -- the Sponza-scale proxy BASELINE.md's
"ReSTIR DI on Sponza" config needs without shipping a large asset. The
reference exercises the same axis via its real assets + DXR BLAS builds
(RtAccelerationStructure.h); here triangle count is the whole story.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .scene import CpuScene


def _split4(a0, a1, a2):
    """One midpoint subdivision of per-vertex data: 3x[T, K] -> 3x[4T, K]."""
    m01 = 0.5 * (a0 + a1)
    m12 = 0.5 * (a1 + a2)
    m20 = 0.5 * (a2 + a0)
    n0 = np.concatenate([a0, m01, m20, m01])
    n1 = np.concatenate([m01, a1, m12, m12])
    n2 = np.concatenate([m20, m12, a2, m20])
    return n0, n1, n2


def subdivide_scene(
    scene: CpuScene, target_tris: int, keep_emissive: bool = True
) -> CpuScene:
    """Subdivide until the triangle count reaches ``target_tris``.

    Whole rounds of 1->4 splits (every triangle splits each round). With
    ``keep_emissive`` (default) the emissive triangles are left unsplit and
    moved to the tail of the triangle list: the light set stays bit-identical
    to the input scene's, so NEE/alias-table sampling consumes the same RNG
    stream and a subdivided scene renders the *same* 1-spp image, not merely
    the same expectation. Returns a new CpuScene (input untouched).
    """
    v0, v1, v2 = scene.v0, scene.v1, scene.v2
    n0, n1, n2 = scene.n0, scene.n1, scene.n2
    uv0, uv1, uv2 = scene.uv0, scene.uv1, scene.uv2
    mat_id = scene.mat_id
    inst_id = scene.inst_id
    emissive = scene.emissive_tris

    held = None
    if keep_emissive and emissive.size:
        is_em = np.zeros(v0.shape[0], bool)
        is_em[emissive] = True
        # order within each partition is preserved, so the emissive list keeps
        # its original relative order (alias-table entries line up 1:1)
        held = tuple(
            a[is_em]
            for a in (v0, v1, v2, n0, n1, n2, uv0, uv1, uv2, mat_id, inst_id)
        )
        keep = ~is_em
        v0, v1, v2 = v0[keep], v1[keep], v2[keep]
        n0, n1, n2 = n0[keep], n1[keep], n2[keep]
        uv0, uv1, uv2 = uv0[keep], uv1[keep], uv2[keep]
        mat_id, inst_id = mat_id[keep], inst_id[keep]
        emissive = None  # reattached at the tail below

    n_held = 0 if held is None else held[0].shape[0]
    while v0.shape[0] + n_held < target_tris and v0.shape[0] > 0:
        t = v0.shape[0]
        v0, v1, v2 = _split4(v0, v1, v2)
        n0, n1, n2 = _split4(n0, n1, n2)
        uv0, uv1, uv2 = _split4(uv0, uv1, uv2)
        mat_id = np.tile(mat_id, 4)
        inst_id = np.tile(inst_id, 4)
        if emissive is not None:
            # child k of triangle i lands at k*t + i
            emissive = np.concatenate([emissive + k * t for k in range(4)])

    if held is not None:
        hv0, hv1, hv2, hn0, hn1, hn2, huv0, huv1, huv2, hmat, hinst = held
        n_sub = v0.shape[0]
        v0 = np.concatenate([v0, hv0])
        v1 = np.concatenate([v1, hv1])
        v2 = np.concatenate([v2, hv2])
        n0 = np.concatenate([n0, hn0])
        n1 = np.concatenate([n1, hn1])
        n2 = np.concatenate([n2, hn2])
        uv0 = np.concatenate([uv0, huv0])
        uv1 = np.concatenate([uv1, huv1])
        uv2 = np.concatenate([uv2, huv2])
        mat_id = np.concatenate([mat_id, hmat])
        inst_id = np.concatenate([inst_id, hinst])
        emissive = n_sub + np.arange(n_held, dtype=np.int64)

    # renormalize interpolated shading normals
    def _norm(n):
        l = np.linalg.norm(n, axis=-1, keepdims=True)
        return (n / np.maximum(l, 1e-20)).astype(np.float32)

    return dataclasses.replace(
        scene,
        v0=v0.astype(np.float32), v1=v1.astype(np.float32),
        v2=v2.astype(np.float32),
        n0=_norm(n0), n1=_norm(n1), n2=_norm(n2),
        uv0=uv0.astype(np.float32), uv1=uv1.astype(np.float32),
        uv2=uv2.astype(np.float32),
        mat_id=mat_id.astype(np.int32),
        inst_id=inst_id.astype(np.int32),
        emissive_tris=emissive.astype(np.int32),
    )
