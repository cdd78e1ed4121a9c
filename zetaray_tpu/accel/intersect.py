"""Ray/triangle intersection as dense MXU compute.

This is the TPU-native replacement for the reference's DXR inline ray queries
(RayQuery.hlsli:42-140, backed by hardware TLAS/BLAS). TPUs have no traversal
hardware and hate divergent per-lane stacks, so the design inverts the
problem: triangles are stored as Woop unit-triangle transforms packed into a
``[4, 3, T]`` tensor (scene.py:_woop_matrices) and a whole tile of rays is
tested against a whole tile of triangles with two small matmuls

    local_o[N, 3, C] = einsum('nk,krc->nrc', [o|1][N,4], W[4,3,C])
    local_d[N, 3, C] = einsum('nk,krc->nrc', [d|0][N,4], W[4,3,C])

followed by elementwise VPU work (t = -ow/dw, barycentrics, validity mask)
and a masked min-reduction over the triangle axis. Everything is static-shape,
branch-free, and fuses under XLA; a hand-fused Pallas variant that keeps the
[N, C] intermediates in VMEM is the follow-up optimization. For large scenes
a host-built BVH culls triangle clusters before this dense test (accel.bvh).

Closest-hit and any-hit (occlusion, for shadow rays) variants are provided,
mirroring the reference's FindClosestHit / occlusion-only queries.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# Miss sentinel. MUST stay a Python float: a module-level jnp scalar becomes a
# device-array constant operand inside jit, which blocks XLA elementwise fusion
# and was measured to slow the intersection kernel ~1000x on TPU.
INF = 3.0e38
_TRANSIENT_BUDGET = 128 * 1024 * 1024  # bytes of scan transients to tolerate


class Hit(NamedTuple):
    """Per-ray closest hit. ``tri < 0`` means miss (t == INF)."""

    t: jnp.ndarray  # [N] f32
    tri: jnp.ndarray  # [N] i32
    u: jnp.ndarray  # [N] f32 barycentric
    v: jnp.ndarray  # [N] f32

    @property
    def valid(self):
        return self.tri >= 0


def _homog(o: jnp.ndarray, w: float) -> jnp.ndarray:
    return jnp.concatenate(
        [o, jnp.full(o.shape[:-1] + (1,), w, o.dtype)], axis=-1
    )


def _chunk_sizes(num_tris_padded: int, tri_chunk: int):
    c = min(tri_chunk, num_tris_padded)
    while num_tris_padded % c:
        c -= 128
    r = max(1024, _TRANSIENT_BUDGET // (24 * c))
    # round ray chunk to a power of two for friendlier shapes
    r = 1 << int(np.floor(np.log2(r)))
    return c, r


def _local_coords(o4, d4, w_chunk):
    """[R,4] rays x [4,3,C] Woop chunk -> local o/d components, each [R,C].

    Precision.HIGHEST is required: the default MXU path computes matmuls in
    bfloat16 passes, whose ~0.5% error is catastrophic for hit-t / barycentric
    classification. HIGHEST keeps full f32 (6-pass on MXU) and still beats the
    VPU formulation.
    """
    p = jax.lax.Precision.HIGHEST
    lo = jnp.einsum(
        "nk,krc->nrc", o4, w_chunk, precision=p, preferred_element_type=jnp.float32
    )
    ld = jnp.einsum(
        "nk,krc->nrc", d4, w_chunk, precision=p, preferred_element_type=jnp.float32
    )
    return lo[:, 0], lo[:, 1], lo[:, 2], ld[:, 0], ld[:, 1], ld[:, 2]


def _tri_hits(o4, d4, w_chunk, t_min, t_max):
    """Returns (t [R,C] with INF at misses, u, v)."""
    ou, ov, ow, du, dv, dw = _local_coords(o4, d4, w_chunk)
    parallel = jnp.abs(dw) < 1e-12
    safe_dw = jnp.where(parallel, 1.0, dw)
    t = -ow / safe_dw
    u = ou + t * du
    v = ov + t * dv
    valid = (
        (~parallel)
        & (t > t_min)
        & (t < t_max)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
    )
    return jnp.where(valid, t, INF), u, v


def _closest_chunked(woop3, o, d, t_min, t_max, tri_chunk):
    """Closest hit for one ray block [R, 3] against all triangles."""
    tp = woop3.shape[2]
    c, _ = _chunk_sizes(tp, tri_chunk)
    n_chunks = tp // c
    o4 = _homog(o, 1.0)
    d4 = _homog(d, 0.0)

    def body(carry, ci):
        best_t, best_tri, best_u, best_v = carry
        w_chunk = jax.lax.dynamic_slice_in_dim(woop3, ci * c, c, axis=2)
        t, u, v = _tri_hits(o4, d4, w_chunk, t_min, t_max)
        arg = jnp.argmin(t, axis=1)
        tmin_c = jnp.take_along_axis(t, arg[:, None], axis=1)[:, 0]
        u_c = jnp.take_along_axis(u, arg[:, None], axis=1)[:, 0]
        v_c = jnp.take_along_axis(v, arg[:, None], axis=1)[:, 0]
        better = tmin_c < best_t
        best_tri = jnp.where(better, ci * c + arg.astype(jnp.int32), best_tri)
        best_u = jnp.where(better, u_c, best_u)
        best_v = jnp.where(better, v_c, best_v)
        best_t = jnp.minimum(best_t, tmin_c)
        return (best_t, best_tri, best_u, best_v), None

    n = o.shape[0]
    init = (
        jnp.full((n,), INF),
        jnp.full((n,), -1, jnp.int32),
        jnp.zeros((n,)),
        jnp.zeros((n,)),
    )
    if n_chunks == 1:
        (bt, btri, bu, bv), _ = body(init, 0)
    else:
        (bt, btri, bu, bv), _ = jax.lax.scan(
            body, init, jnp.arange(n_chunks, dtype=jnp.int32)
        )
    return Hit(t=bt, tri=btri, u=bu, v=bv)


def _any_chunked(woop3, o, d, t_min, t_max, tri_chunk):
    tp = woop3.shape[2]
    c, _ = _chunk_sizes(tp, tri_chunk)
    n_chunks = tp // c
    o4 = _homog(o, 1.0)
    d4 = _homog(d, 0.0)

    def body(occluded, ci):
        w_chunk = jax.lax.dynamic_slice_in_dim(woop3, ci * c, c, axis=2)
        t, _, _ = _tri_hits(o4, d4, w_chunk, t_min, t_max)
        return occluded | jnp.any(t < INF, axis=1), None

    init = jnp.zeros((o.shape[0],), bool)
    if n_chunks == 1:
        occ, _ = body(init, 0)
    else:
        occ, _ = jax.lax.scan(body, init, jnp.arange(n_chunks, dtype=jnp.int32))
    return occ


def _ray_blocked(fn, woop3, o, d, tri_chunk, *args):
    """Apply ``fn`` over ray blocks via lax.map to bound transients."""
    tp = woop3.shape[2]
    c, r = _chunk_sizes(tp, tri_chunk)
    n = o.shape[0]
    if n <= r:
        return fn(woop3, o, d, *args, tri_chunk)
    n_pad = ((n + r - 1) // r) * r
    pad = n_pad - n
    o_p = jnp.pad(o, ((0, pad), (0, 0)))
    d_p = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
    o_b = o_p.reshape(n_pad // r, r, 3)
    d_b = d_p.reshape(n_pad // r, r, 3)
    out = jax.lax.map(lambda od: fn(woop3, od[0], od[1], *args, tri_chunk), (o_b, d_b))
    return jax.tree_util.tree_map(lambda x: x.reshape(n_pad, *x.shape[2:])[:n], out)


def intersect_closest(
    scene, o: jnp.ndarray, d: jnp.ndarray, t_min=1e-4, t_max=None, tri_chunk: int = 512
) -> Hit:
    """Closest-hit query: rays [N, 3] (origins, unit directions) vs scene.

    Equivalent of RayQuery.hlsli FindClosestHit (closest-hit inline RT).
    ``t_min``/``t_max`` must be scalars; for per-ray segment queries pass the
    unnormalized segment as ``d`` and use t in [0, 1] (see ops.pathtracer's
    shadow rays).
    """
    if t_max is None:
        t_max = INF
    woop3 = scene.woop.reshape(4, 3, -1)
    return _ray_blocked(_closest_chunked, woop3, o, d, tri_chunk, t_min, t_max)


def intersect_any(
    scene, o: jnp.ndarray, d: jnp.ndarray, t_min=1e-4, t_max=None, tri_chunk: int = 512
) -> jnp.ndarray:
    """Occlusion query: True where any triangle lies in (t_min, t_max).

    Equivalent of the reference's shadow-ray visibility queries
    (RayQuery.hlsli:317 Visibility()).
    """
    if t_max is None:
        t_max = INF
    woop3 = scene.woop.reshape(4, 3, -1)
    return _ray_blocked(_any_chunked, woop3, o, d, tri_chunk, t_min, t_max)


# ---------------------------------------------------------------------------
# Fused shaded-hit API (Pallas on TPU, jnp+gather oracle on CPU)
# ---------------------------------------------------------------------------


class ShadedHit(NamedTuple):
    """Closest hit + per-triangle attribute row (scene.A layout)."""

    t: jnp.ndarray  # [N]
    tri: jnp.ndarray  # [N] i32, -1 = miss
    u: jnp.ndarray  # [N]
    v: jnp.ndarray  # [N]
    attrs: jnp.ndarray  # [N, A.WIDTH], zeros at misses

    @property
    def valid(self):
        return self.tri >= 0


def _on_cpu() -> bool:
    return jax.default_backend() == "cpu"


def _pad_rays(o, d, mult=1024):
    # mult=1024: Mosaic requires the 1D mask operands' block tiling to match
    # XLA's T(1024) layout choice for odd sizes (observed on s32[13824]:
    # "XLA layout {0:T(1024)} does not match Mosaic layout {0:T(512)}")
    n = o.shape[0]
    np_ = ((n + mult - 1) // mult) * mult
    if np_ == n:
        return o, d, n
    pad = np_ - n
    return (
        jnp.pad(o, ((0, pad), (0, 0))),
        jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0),
        n,
    )


def _hit_alpha(scene, sh: ShadedHit):
    """(passes_alpha [N] bool, has_mask [N] bool) at the hit, from the
    baked alpha-cutout atlas (scene.alpha_tex; reference TestOpacity,
    GBufferRT_Inline.hlsl:37-60). Nearest sampling, wrap addressing."""
    from ..scene.scene import A

    at = sh.attrs
    w0 = 1.0 - sh.u - sh.v
    u = w0 * at[:, A.UV0] + sh.u * at[:, A.UV1] + sh.v * at[:, A.UV2]
    v = w0 * at[:, A.UV0 + 1] + sh.u * at[:, A.UV1 + 1] + sh.v * at[:, A.UV2 + 1]
    cutoff = at[:, A.ACUT]
    slot = at[:, A.ATEX].astype(jnp.int32)
    atlas = scene.alpha_tex
    k, res, _ = atlas.shape
    xi = jnp.mod((u * res).astype(jnp.int32), res)
    yi = jnp.mod((v * res).astype(jnp.int32), res)
    alpha = atlas[jnp.clip(slot, 0, k - 1), yi, xi]
    has_mask = (cutoff > 0.0) & (slot >= 0)
    return jnp.where(has_mask, alpha >= cutoff, True), has_mask


_CUTOUT_ROUNDS = 4  # max transparent layers pierced per query


def _closest_cutout(scene, o, d, t_min, t_max) -> ShadedHit:
    """Closest hit skipping alpha-rejected surfaces: iterative re-trace,
    advancing rejected lanes past their hit (the TPU answer to the
    reference's any-hit TestOpacity loop)."""
    n = o.shape[0]
    o_cur = o
    t_acc = jnp.zeros(n)
    live = jnp.ones(n, bool)
    out = None
    for _ in range(_CUTOUT_ROUNDS):
        sh = _closest_shaded_raw(scene, o_cur, d, t_min, t_max)
        passes, _ = _hit_alpha(scene, sh)
        settle = live & (~sh.valid | passes)  # miss or opaque-enough hit
        latched = ShadedHit(
            t=jnp.where(settle, t_acc + sh.t, 0.0 if out is None else out.t),
            tri=jnp.where(settle, sh.tri, -1 if out is None else out.tri),
            u=jnp.where(settle, sh.u, 0.0 if out is None else out.u),
            v=jnp.where(settle, sh.v, 0.0 if out is None else out.v),
            attrs=jnp.where(
                settle[:, None], sh.attrs,
                0.0 if out is None else out.attrs,
            ),
        )
        out = latched
        cont = live & sh.valid & ~passes
        step = sh.t + 1e-4 + 1e-4 * sh.t
        o_cur = jnp.where(cont[:, None], o_cur + step[:, None] * d, o_cur)
        t_acc = jnp.where(cont, t_acc + step, t_acc)
        live = cont
    # lanes still piercing after the budget keep their last (rejected) hit
    return ShadedHit(
        t=jnp.where(live, t_acc, out.t),
        tri=jnp.where(live, -1, out.tri),
        u=out.u, v=out.v,
        attrs=jnp.where(live[:, None], 0.0, out.attrs),
    )


def _occluded_cutout(scene, o, d, t_min, t_max):
    """Occlusion with alpha cutout: march closest hits along the segment
    until an alpha-passing surface occludes or the segment ends."""
    n = o.shape[0]
    o_cur = o
    t_acc = jnp.zeros(n)
    live = jnp.ones(n, bool)
    occ = jnp.zeros(n, bool)
    for _ in range(_CUTOUT_ROUNDS):
        sh = _closest_shaded_raw(scene, o_cur, d, t_min, INF)
        within = sh.valid & (t_acc + sh.t < t_max)
        passes, _ = _hit_alpha(scene, sh)
        occ = occ | (live & within & passes)
        cont = live & within & ~passes
        step = sh.t + 1e-4 + 1e-4 * sh.t
        o_cur = jnp.where(cont[:, None], o_cur + step[:, None] * d, o_cur)
        t_acc = jnp.where(cont, t_acc + step, t_acc)
        live = cont
    return occ | live  # layer-budget overflow counts as occluded


def intersect_closest_shaded(scene, o, d, t_min=1e-4, t_max=None) -> ShadedHit:
    """Closest hit with attributes fetched in-kernel (no XLA gathers on TPU).

    Scenes with a cluster BVH (scene.cluster_aabb set) use the streaming
    traversal (accel.stream) -- triangles beyond the VMEM ceiling stream
    from HBM with tile-level AABB culling; the winning triangle's attributes
    come from one XLA gather (1/C of the attribute bandwidth). Scenes with
    MASK-mode materials (scene.has_cutout) run the alpha-cutout re-trace."""
    if t_max is None:
        t_max = INF
    if scene.has_cutout:
        return _closest_cutout(scene, o, d, t_min, t_max)
    return _closest_shaded_raw(scene, o, d, t_min, t_max)


def intersect_closest_shaded_dense(scene, o, d, t_min=1e-4, t_max=None) -> ShadedHit:
    """Closest hit + attributes as PURE XLA (dense chunked einsum + one
    row gather) -- same results as the Pallas path, but fusable.

    Inside a large jitted frame the trace-only Pallas kernel costs ~7x its
    standalone price (ReSTIR PT's two replay traces: 290 -> 74.6 ms/frame
    at 512^2 when switched to this path), while the dense einsum fuses
    with the surrounding program and overlaps on the MXU. Only for
    VMEM-resident scenes (scene.cluster_aabb is None); cost scales
    O(N x T)."""
    hit = intersect_closest(scene, o, d, t_min, t_max)
    attrs = jnp.where(
        (hit.tri >= 0)[:, None], scene.tri_attrs[jnp.maximum(hit.tri, 0)], 0.0
    )
    return ShadedHit(hit.t, hit.tri, hit.u, hit.v, attrs)


def _closest_shaded_raw(scene, o, d, t_min=1e-4, t_max=None) -> ShadedHit:
    if t_max is None:
        t_max = INF
    if not _on_cpu():
        o_p, d_p, n = _pad_rays(o, d)
        if scene.cluster_aabb is not None:
            from .stream import closest_hit_stream_shaded

            # Stage barriers on BOTH sides of the streaming sweep: inside a
            # fused frame XLA re-computes the ray producer chain (bounce
            # shading) into each prepass consumer and re-fuses the gathered
            # result into every downstream consumer -- the same hazard the
            # restir_pt chain measured at 232 -> 69 ms when materialized
            # (render/frame.py restir_gi stage barriers). Each streaming
            # trace is a frame stage; pin it as one.
            o_p, d_p = jax.lax.optimization_barrier((o_p, d_p))
            # two-phase distance capping for unbounded queries only:
            # bounded/segment queries already clip their frustums
            cap = scene.stream_tcap if float(t_max) >= 1e30 else 0.0
            t, tri, u, v, attrs = jax.lax.optimization_barrier(
                closest_hit_stream_shaded(
                    scene.stream_attrs, scene.woop_stream,
                    scene.cluster_aabb, o_p, d_p,
                    t_min=float(t_min), t_max=float(t_max), t_cap=float(cap),
                )
            )
            return ShadedHit(t[:n], tri[:n], u[:n], v[:n], attrs[:n])
        from .pallas_kernels import closest_hit_pallas

        t, tri, u, v, attrs = closest_hit_pallas(
            scene.woop.reshape(4, 3, -1), scene.tri_attrs, o_p, d_p,
            t_min=float(t_min), t_max=float(t_max),
        )
        return ShadedHit(t[:n], tri[:n], u[:n], v[:n], attrs[:n])
    hit = intersect_closest(scene, o, d, t_min, t_max)
    attrs = jnp.where(
        (hit.tri >= 0)[:, None], scene.tri_attrs[jnp.maximum(hit.tri, 0)], 0.0
    )
    return ShadedHit(hit.t, hit.tri, hit.u, hit.v, attrs)


def intersect_occluded(scene, o, d, t_min=1e-4, t_max=None) -> jnp.ndarray:
    """Backend-dispatched any-hit query (Pallas on TPU); alpha-cutout scenes
    march closest hits through transparent texels instead."""
    if t_max is None:
        t_max = INF
    if scene.has_cutout:
        return _occluded_cutout(scene, o, d, t_min, t_max)
    if not _on_cpu():
        o_p, d_p, n = _pad_rays(o, d)
        if scene.cluster_aabb is not None:
            from .stream import occlusion_stream

            # stage barriers: see _closest_shaded_raw's clustered branch
            o_p, d_p = jax.lax.optimization_barrier((o_p, d_p))
            occ = jax.lax.optimization_barrier(
                occlusion_stream(
                    scene.woop_stream, scene.cluster_aabb, o_p, d_p,
                    t_min=float(t_min), t_max=float(t_max),
                )
            )
            return occ[:n]
        from .pallas_kernels import occlusion_pallas

        occ = occlusion_pallas(
            scene.woop.reshape(4, 3, -1), o_p, d_p,
            t_min=float(t_min), t_max=float(t_max),
        )
        return occ[:n]
    return intersect_any(scene, o, d, t_min, t_max)


# ---------------------------------------------------------------------------
# Shading-point reconstruction from a Hit
# ---------------------------------------------------------------------------


class Surface(NamedTuple):
    """Interpolated surface attributes at a hit point."""

    pos: jnp.ndarray  # [N, 3]
    ng: jnp.ndarray  # [N, 3] geometric normal (unit, faces ray origin side flag below)
    ns: jnp.ndarray  # [N, 3] shading normal (unit)
    uv: jnp.ndarray  # [N, 2]
    mat_id: jnp.ndarray  # [N] i32
    front: jnp.ndarray  # [N] bool: ray hit the front (ng) side


def hit_surface(scene, o, d, hit: Hit) -> Surface:
    """Gather + interpolate surface attributes for each hit.

    Gathers are the unavoidable random-access part (SURVEY.md hard-parts #2);
    they are batched per-attribute over SoA arrays so XLA emits a handful of
    wide dynamic-gathers instead of per-ray scalar loads.
    """
    tri = jnp.maximum(hit.tri, 0)
    w0 = 1.0 - hit.u - hit.v
    pos = o + hit.t[:, None] * d
    ng = scene.ng[tri]
    ns = (
        w0[:, None] * scene.n0[tri]
        + hit.u[:, None] * scene.n1[tri]
        + hit.v[:, None] * scene.n2[tri]
    )
    ns = ns / jnp.maximum(jnp.linalg.norm(ns, axis=-1, keepdims=True), 1e-20)
    uv = (
        w0[:, None] * scene.uv0[tri]
        + hit.u[:, None] * scene.uv1[tri]
        + hit.v[:, None] * scene.uv2[tri]
    )
    front = jnp.sum(d * ng, axis=-1) < 0.0
    # Flip normals to the incoming side (double-sided shading; one-sided
    # emission is handled in ops.lights).
    sign = jnp.where(front, 1.0, -1.0)[:, None]
    ng_f = ng * sign
    ns_f = ns * sign
    # Ensure shading normal is in the same hemisphere as geometric.
    flip_ns = jnp.sum(ns_f * ng_f, axis=-1, keepdims=True) < 0.0
    ns_f = jnp.where(flip_ns, -ns_f, ns_f)
    return Surface(
        pos=pos, ng=ng_f, ns=ns_f, uv=uv, mat_id=scene.mat_id[tri], front=front
    )


# ---------------------------------------------------------------------------
# NumPy reference (oracle for tests, like the reference validating SIMD math
# against DirectXMath -- SURVEY.md section 4)
# ---------------------------------------------------------------------------


def reference_closest_hit_np(v0, v1, v2, o, d, t_min=1e-4, t_max=3.0e38):
    """Brute-force Moller-Trumbore closest hit. [T,3] tris x [N,3] rays."""
    e1 = (v1 - v0).astype(np.float64)
    e2 = (v2 - v0).astype(np.float64)
    o = o.astype(np.float64)
    d = d.astype(np.float64)
    n = o.shape[0]
    best_t = np.full(n, np.inf)
    best_tri = np.full(n, -1, np.int64)
    best_uv = np.zeros((n, 2))
    for ti in range(v0.shape[0]):
        pvec = np.cross(d, e2[ti])
        det = pvec @ e1[ti]
        ok = np.abs(det) > 1e-16
        inv_det = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        tvec = o - v0[ti]
        u = np.einsum("nj,nj->n", tvec, pvec) * inv_det
        qvec = np.cross(tvec, np.broadcast_to(e1[ti], tvec.shape))
        v = np.einsum("nj,nj->n", d, qvec) * inv_det
        t = np.einsum("nj,j->n", qvec, e2[ti]) * inv_det
        hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > t_min) & (t < t_max)
        better = hit & (t < best_t)
        best_t = np.where(better, t, best_t)
        best_tri = np.where(better, ti, best_tri)
        best_uv[better, 0] = u[better]
        best_uv[better, 1] = v[better]
    return best_t, best_tri, best_uv
