"""Device-side scene refit: the TPU-native BLAS/TLAS update.

The reference re-fits or rebuilds acceleration structures every frame for
animated instances (RtAccelerationStructure.h:83-110 `TLAS::Update`:
transform-only updates, dynamic-BLAS refit; SceneCore.h:239-351 per-frame
transform hierarchy). Here the whole scene is baked world-space SoA
(scene.SceneBuffers), so the per-frame update is one jitted pass that
applies per-instance *delta* transforms (rest pose -> time t, from
`animation.AnimationRig.deltas`) to every triangle and rebuilds the derived
tables:

  - Woop unit-triangle transforms (3x3 inverse per triangle, VPU adjugate)
  - per-triangle attribute rows (geometric/vertex normals, tangents)
  - emissive-sampling table positions (the reference's emissive position
    update task, SceneCore.cpp:102; areas/powers are preserved under the
    rigid + uniform-scale motions glTF node animation produces, so the
    alias table stays valid)
  - cluster AABBs for the streaming traversal (reshape + masked min/max:
    the refit analog of D3D12 BLAS UPDATE; boxes stay exact per-frame
    because they're recomputed from the transformed vertices, not grown)
  - world bounds

Instance deltas are gathered per-triangle with a one-hot matmul (instances
are few; [Tp, I+1] @ [I+1, 21] rides the MXU instead of a scatter/gather).
Everything is f32 on device; the rest-pose Woop build is f64 NumPy, so a
refit with identity deltas reproduces it to ~1e-6 relative (tested).
"""

from __future__ import annotations

from dataclasses import replace

import jax.numpy as jnp

from .scene import A, EA, SceneBuffers


def _inv3x3(m):
    """Batched 3x3 inverse via adjugate. m: [T, 3, 3] -> (det [T], inv [T,3,3]).
    Singular matrices (|det| below threshold) return zeros, which makes the
    Woop transform degenerate and every ray miss the triangle."""
    a = m
    c00 = a[:, 1, 1] * a[:, 2, 2] - a[:, 1, 2] * a[:, 2, 1]
    c01 = -(a[:, 1, 0] * a[:, 2, 2] - a[:, 1, 2] * a[:, 2, 0])
    c02 = a[:, 1, 0] * a[:, 2, 1] - a[:, 1, 1] * a[:, 2, 0]
    c10 = -(a[:, 0, 1] * a[:, 2, 2] - a[:, 0, 2] * a[:, 2, 1])
    c11 = a[:, 0, 0] * a[:, 2, 2] - a[:, 0, 2] * a[:, 2, 0]
    c12 = -(a[:, 0, 0] * a[:, 2, 1] - a[:, 0, 1] * a[:, 2, 0])
    c20 = a[:, 0, 1] * a[:, 1, 2] - a[:, 0, 2] * a[:, 1, 1]
    c21 = -(a[:, 0, 0] * a[:, 1, 2] - a[:, 0, 2] * a[:, 1, 0])
    c22 = a[:, 0, 0] * a[:, 1, 1] - a[:, 0, 1] * a[:, 1, 0]
    det = a[:, 0, 0] * c00 + a[:, 0, 1] * c01 + a[:, 0, 2] * c02
    # inv = adj / det, adj[i, j] = cofactor[j, i]
    adj = jnp.stack(
        [
            jnp.stack([c00, c10, c20], -1),
            jnp.stack([c01, c11, c21], -1),
            jnp.stack([c02, c12, c22], -1),
        ],
        axis=1,
    )
    good = jnp.abs(det) > 1e-16
    safe = jnp.where(good, det, 1.0)
    inv = jnp.where(good[:, None, None], adj / safe[:, None, None], 0.0)
    return det, inv


def woop_pack(v0, e1, e2):
    """[T, 3] triangle verts/edges -> Woop transforms packed [4, 3T]
    (same layout as scene._woop_matrices: row r in {u, v, w} lives in
    columns [r*T, (r+1)*T))."""
    n = jnp.cross(e1, e2)
    m = jnp.stack([e1, e2, n], axis=-1)  # [T, 3, 3] columns e1, e2, n
    det, inv = _inv3x3(m)
    tw = -jnp.einsum("tij,tj->ti", inv, v0)
    w4 = jnp.concatenate([inv, tw[..., None]], axis=-1)  # [T, 3, 4]
    # out[c, r*T + i] = w4[i, r, c]
    return w4.transpose(2, 1, 0).reshape(4, -1)


def _normalize(v):
    n = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), 1e-24))
    return v / n


def refit_scene(scene: SceneBuffers, delta_pos, delta_nrm) -> SceneBuffers:
    """Apply per-instance rest->now transforms; returns a new SceneBuffers.

    delta_pos: [I+1, 3, 4] f32 point transforms (identity row appended at
    index I for padding triangles, which carry inst_id = -1);
    delta_nrm: [I+1, 3, 3] inverse-transpose linear parts for normals.
    Jittable; call inside the frame program for animated scenes.
    """
    delta_pos = jnp.asarray(delta_pos, jnp.float32)
    delta_nrm = jnp.asarray(delta_nrm, jnp.float32)
    n_inst = delta_pos.shape[0]
    idx = jnp.where(scene.inst_id < 0, n_inst - 1, scene.inst_id)

    # One-hot gather of the per-instance transforms ([Tp, I+1] @ [I+1, 21]).
    onehot = (idx[:, None] == jnp.arange(n_inst)[None, :]).astype(jnp.float32)
    flat = jnp.concatenate(
        [delta_pos.reshape(n_inst, 12), delta_nrm.reshape(n_inst, 9)], axis=1
    )
    g = onehot @ flat  # [Tp, 21]
    rot = g[:, :12].reshape(-1, 3, 4)[:, :, :3]
    tvec = g[:, :12].reshape(-1, 3, 4)[:, :, 3]
    nrm_m = g[:, 12:].reshape(-1, 3, 3)

    point = lambda p: jnp.einsum("tij,tj->ti", rot, p) + tvec
    direc = lambda d: jnp.einsum("tij,tj->ti", rot, d)
    normal = lambda x: _normalize(jnp.einsum("tij,tj->ti", nrm_m, x))

    v0 = point(scene.v0)
    e1 = direc(scene.e1)
    e2 = direc(scene.e2)
    ng = _normalize(jnp.cross(e1, e2))
    n0, n1, n2 = normal(scene.n0), normal(scene.n1), normal(scene.n2)
    woop = woop_pack(v0, e1, e2)

    attrs = scene.tri_attrs
    tang = _normalize(direc(attrs[:, A.TANG : A.TANG + 3]))
    attrs = attrs.at[:, A.NG : A.NG + 3].set(ng)
    attrs = attrs.at[:, A.N0 : A.N0 + 3].set(n0)
    attrs = attrs.at[:, A.N1 : A.N1 + 3].set(n1)
    attrs = attrs.at[:, A.N2 : A.N2 + 3].set(n2)
    attrs = attrs.at[:, A.TANG : A.TANG + 3].set(tang)

    # Emissive table position update (em_* indices are small: plain take).
    em = scene.em_attrs
    etri = jnp.maximum(scene.em_tri, 0)
    emask = (scene.em_tri >= 0).astype(jnp.float32)[:, None]
    em = em.at[:, EA.V0 : EA.V0 + 3].set(v0[etri] * emask)
    em = em.at[:, EA.E1 : EA.E1 + 3].set(e1[etri] * emask)
    em = em.at[:, EA.E2 : EA.E2 + 3].set(e2[etri] * emask)
    em = em.at[:, EA.NG : EA.NG + 3].set(ng[etri] * emask)

    # World bounds over real triangles (padding rows carry inst_id = -1).
    vmask = scene.inst_id >= 0
    big = jnp.float32(3.0e38)
    pts = jnp.stack([v0, v0 + e1, v0 + e2], axis=1)  # [Tp, 3, 3]
    lo = jnp.min(jnp.where(vmask[:, None, None], pts, big), axis=(0, 1))
    hi = jnp.max(jnp.where(vmask[:, None, None], pts, -big), axis=(0, 1))

    cluster_aabb = scene.cluster_aabb
    woop_stream = scene.woop_stream
    stream_attrs = scene.stream_attrs
    if cluster_aabb is not None:
        from .scene import stream_attrs_table, stream_woop_layout

        m = cluster_aabb.shape[0]
        c = scene.v0.shape[0] // m
        woop_stream = stream_woop_layout(woop, m, c)
        stream_attrs = stream_attrs_table(attrs, v0, e1, e2)
        cpts = pts[: m * c].reshape(m, c * 3, 3)
        cmask = vmask[: m * c].repeat(3).reshape(m, c * 3)
        clo = jnp.min(jnp.where(cmask[..., None], cpts, big), axis=1)
        chi = jnp.max(jnp.where(cmask[..., None], cpts, -big), axis=1)
        # empty clusters (all padding): collapse to a point so they never hit
        empty = ~cmask.any(axis=1)
        clo = jnp.where(empty[:, None], 0.0, clo)
        chi = jnp.where(empty[:, None], -1.0, chi)
        cluster_aabb = (
            cluster_aabb.at[:, 0:3].set(clo).at[:, 3:6].set(chi)
        )

    return replace(
        scene,
        woop=woop,
        tri_attrs=attrs,
        em_attrs=em,
        v0=v0,
        e1=e1,
        e2=e2,
        ng=ng,
        n0=n0,
        n1=n1,
        n2=n2,
        world_lo=lo,
        world_hi=hi,
        cluster_aabb=cluster_aabb,
        woop_stream=woop_stream,
        stream_attrs=stream_attrs,
    )
