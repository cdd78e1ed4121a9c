"""BVH-cluster streaming traversal: ray tracing beyond the VMEM ceiling.

The dense megakernel needs the whole Woop table resident in VMEM (~8k tris).
This module is the large-scene path, the TPU-native replacement for the
reference's hardware TLAS/BLAS traversal (RtAccelerationStructure.h:26-110,
RayQuery.hlsli:42-140):

  - the host BVH (accel.bvh, binned SAH) groups triangles into clusters of
    ``C`` (scene.upload_scene permutes + pads the triangle arrays so cluster
    c owns Woop lanes [c*C, (c+1)*C));
  - a cheap XLA pre-pass rates every (ray-subtile, cluster) pair with a
    conservative interval-arithmetic overlap test (origin box x direction
    box vs cluster AABB; swept box for bounded segments) -> int32 mask in
    SMEM;
  - a Pallas kernel runs a grid of (ray supertiles x clusters): the ray
    supertile (SoA rows [16, rt] per subtile: o, d, 1/d) stays RESIDENT in
    VMEM across the whole cluster sweep while the Pallas pipeline streams
    cluster Woop blocks from HBM double-buffered. Two culling levels skip
    the Woop intersection block per subtile via ``@pl.when``: the SMEM mask
    (geometry) and an in-kernel slab test against the rays' current best t
    (early termination) -- tile-level culling instead of per-ray stacks,
    the divergence-free TPU answer to BVH traversal (SURVEY.md hard parts
    #1).

Everything keeps the megakernel's SoA-row layout ([*, rt] vectors, lane dim
= rays): Mosaic needs static offsets to legalize the scalar any()-reductions
driving @pl.when, which is also why the subtile loop is a static unroll.

Total HBM traffic: rays once + (supertiles x Woop table), independent of
triangle count^2; compute scales with the *overlapping* (subtile, cluster)
pairs only. Attributes for the winning triangle are fetched by one XLA
gather afterwards (32 rows x N), NOT streamed -- the attribute table is
2.7x the Woop data and only 1/C of it is ever needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.vec3 import V3
from .megakernel import _tri_hits_soa

INF = 3.0e38
RS = 4096  # rays per supertile (VMEM-resident)
RT_SUB = 256  # rays per culling subtile
R_ROWS = 16  # SoA ray rows: 0-2 o | 3-5 d | 6-8 1/d | 9-15 pad (8-multiple)


def _pick_rs(n_rays: int):
    rs = min(RS, n_rays)
    while n_rays % rs:
        rs //= 2
    rt = min(RT_SUB, rs)
    return rs, rt


_BIG_T = 2.0e38


def _overlap_mask(o, d, aabb, rt, t_max):
    """Conservative (subtile x cluster) overlap mask, [rows, M] int32.

    Interval-arithmetic slab test: the subtile is abstracted as the interval
    ray (origin box O, direction box D); per axis the t-interval that can
    reach the cluster slab is the interval quotient (C - O) / D, and the
    per-axis intervals are intersected like a scalar slab test. Every
    concrete ray's slab intervals lie inside these, so the test never culls
    a true hit; narrow direction cones (coherent primary tiles) cull tightly
    because the cross-axis intersection captures the frustum.
    """
    n = o.shape[0]
    rows = n // rt
    o_r = o.reshape(rows, rt, 3)
    d_r = d.reshape(rows, rt, 3)
    olo = o_r.min(1)[:, None]  # [rows, 1, 3]
    ohi = o_r.max(1)[:, None]
    dlo = d_r.min(1)[:, None]
    dhi = d_r.max(1)[:, None]
    clo = aabb[None, :, 0:3]  # [1, M, 3]
    chi = aabb[None, :, 3:6]

    n_lo = clo - ohi  # numerator interval [n_lo, n_hi], [rows, M, 3]
    n_hi = chi - olo
    # interval quotient [n_lo, n_hi] / [dlo, dhi]; D spanning 0 -> unbounded
    zero_in = (dlo <= 0.0) & (dhi >= 0.0)
    b1 = jnp.where(jnp.abs(dlo) < 1e-20, 1e-20, dlo)
    b2 = jnp.where(jnp.abs(dhi) < 1e-20, 1e-20, dhi)
    q11 = n_lo / b1
    q12 = n_lo / b2
    q21 = n_hi / b1
    q22 = n_hi / b2
    t_lo = jnp.minimum(jnp.minimum(q11, q12), jnp.minimum(q21, q22))
    t_hi = jnp.maximum(jnp.maximum(q11, q12), jnp.maximum(q21, q22))
    t_lo = jnp.where(zero_in, -_BIG_T, t_lo)
    t_hi = jnp.where(zero_in, _BIG_T, t_hi)
    t_near = jnp.maximum(t_lo.max(-1), 0.0)  # [rows, M]
    t_far = jnp.minimum(t_hi.min(-1), t_max)
    return (t_far >= t_near).astype(jnp.int32)


def _mask_smem(mask, n_super, n_sub):
    """[rows, M] -> ([n_super, M, n_sub, 1], [n_super, M, 1, 1]): per-grid-
    step subtile flags + their supertile-level OR, both as SMEM blocks
    (trailing dims equal array dims, satisfying Mosaic's block-shape rule).
    The OR gates the whole subtile loop with ONE scalar read -- most grid
    steps are fully culled and must cost ~nothing."""
    m = mask.shape[1]
    sub = mask.reshape(n_super, n_sub, m).transpose(0, 2, 1)
    return sub[..., None], sub.max(-1)[..., None, None]


def _rays_soa(o, d, rows, rt):
    """[N, 3] o/d -> [rows, R_ROWS, rt] SoA ray rows (o, d, 1/d)."""
    n = o.shape[0]
    safe = jnp.where(jnp.abs(d) < 1e-20, 1e-20, d)
    r = jnp.concatenate([o, d, 1.0 / safe, jnp.zeros((n, R_ROWS - 9))], axis=1)
    return r.reshape(rows, rt, R_ROWS).transpose(0, 2, 1)


def _slab_live(aabb6, r, best, t_min):
    """Per-ray slab test vs cluster AABB, culled by current best t.
    r: [R_ROWS, rt] SoA rays. Returns f32 live-ray count (0 = skip)."""
    lox, loy, loz, hix, hiy, hiz = aabb6
    ox, oy, oz = r[0], r[1], r[2]
    ivx, ivy, ivz = r[6], r[7], r[8]
    t0 = (lox - ox) * ivx
    t1 = (hix - ox) * ivx
    tn = jnp.minimum(t0, t1)
    tf = jnp.maximum(t0, t1)
    t0 = (loy - oy) * ivy
    t1 = (hiy - oy) * ivy
    tn = jnp.maximum(tn, jnp.minimum(t0, t1))
    tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    t0 = (loz - oz) * ivz
    t1 = (hiz - oz) * ivz
    tn = jnp.maximum(tn, jnp.minimum(t0, t1))
    tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    tn = jnp.maximum(tn, t_min)
    # NaN-conservative: a NaN lane fails both reject comparisons -> visit
    ok = jnp.logical_not((tf < tn) | (tn >= best))
    return jnp.sum(ok.astype(jnp.float32))


def _closest_stream_kernel(
    smask_ref, mask_ref, aabb_ref, rays_ref, w_ref,
    t_ref, tri_ref, u_ref, v_ref,
    *, rt, c, t_min, t_max, n_sub,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        t_ref[:] = jnp.full_like(t_ref, INF)
        tri_ref[:] = jnp.full_like(tri_ref, -1)
        u_ref[:] = jnp.zeros_like(u_ref)
        v_ref[:] = jnp.zeros_like(v_ref)

    @pl.when(smask_ref[0, 0, 0, 0] > 0)
    def _visit():
        _closest_visit(
            mask_ref, aabb_ref, rays_ref, w_ref, t_ref, tri_ref, u_ref, v_ref,
            j=j, rt=rt, c=c, t_min=t_min, t_max=t_max, n_sub=n_sub,
        )


def _closest_visit(
    mask_ref, aabb_ref, rays_ref, w_ref, t_ref, tri_ref, u_ref, v_ref,
    *, j, rt, c, t_min, t_max, n_sub,
):
    aabb6 = tuple(aabb_ref[0, 0, 0, k] for k in range(6))
    for s in range(n_sub):  # static unroll: keeps layouts provable
        @pl.when(mask_ref[0, 0, s, 0] > 0)
        def _(s=s):
            r = rays_ref[s]
            o = V3(r[0], r[1], r[2])
            d = V3(r[3], r[4], r[5])
            best = jnp.minimum(t_ref[s], t_max)
            n_live = _slab_live(aabb6, r, best, t_min)

            @pl.when(n_live > 0.0)
            def _():
                t, u, v = _tri_hits_soa(w_ref[:], o, d, t_min, t_max, c)
                tmin = jnp.min(t, axis=0)
                hit = tmin < INF
                iota = jax.lax.broadcasted_iota(jnp.int32, (c, rt), 0)
                is_min = t == tmin[None, :]
                idx = jnp.max(jnp.where(is_min, iota, -1), axis=0)
                sel = (iota == idx[None, :]) & hit[None, :]
                u_best = jnp.sum(jnp.where(sel, u, 0.0), axis=0)
                v_best = jnp.sum(jnp.where(sel, v, 0.0), axis=0)
                better = tmin < t_ref[s]
                t_ref[s] = jnp.where(better, tmin, t_ref[s])
                tri_ref[s] = jnp.where(better, j * c + idx, tri_ref[s])
                u_ref[s] = jnp.where(better, u_best, u_ref[s])
                v_ref[s] = jnp.where(better, v_best, v_ref[s])


@functools.partial(jax.jit, static_argnames=("t_min", "t_max", "interpret"))
def closest_hit_stream(woop3, aabb, o, d, t_min=1e-4, t_max=INF, interpret=False):
    """Streaming closest hit. woop3: [4, 3, M*C] cluster-ordered Woop;
    aabb: [M, 8] cluster bounds rows (lo.xyz, hi.xyz, pad); o/d: [N, 3].
    Returns (t [N], tri [N] i32 cluster-slot id, u, v)."""
    n = o.shape[0]
    m = aabb.shape[0]
    c = woop3.shape[2] // m
    rs, rt = _pick_rs(n)
    n_sub = rs // rt
    rows = n // rt
    n_super = n // rs
    mask, smask = _mask_smem(_overlap_mask(o, d, aabb, rt, t_max), n_super, n_sub)
    aabb4 = aabb.reshape(m, 1, 1, 8)
    rays = _rays_soa(o, d, rows, rt)
    grid = (n_super, m)
    kernel = functools.partial(
        _closest_stream_kernel, rt=rt, c=c, t_min=t_min, t_max=t_max,
        n_sub=n_sub,
    )
    out_spec = pl.BlockSpec((n_sub, rt), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    t, tri, u, v = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, 1, 1), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 1, n_sub, 1), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 1, 1, 8), lambda i, j: (j, 0, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (n_sub, R_ROWS, rt), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((4, 3, c), lambda i, j: (0, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec, out_spec, out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, rt), jnp.float32),
            jax.ShapeDtypeStruct((rows, rt), jnp.int32),
            jax.ShapeDtypeStruct((rows, rt), jnp.float32),
            jax.ShapeDtypeStruct((rows, rt), jnp.float32),
        ),
        interpret=interpret,
    )(smask, mask, aabb4, rays, woop3)
    return t.reshape(n), tri.reshape(n), u.reshape(n), v.reshape(n)


def _occlusion_stream_kernel(
    smask_ref, mask_ref, aabb_ref, rays_ref, w_ref, occ_ref,
    *, rt, c, t_min, t_max, n_sub,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        occ_ref[:] = jnp.zeros_like(occ_ref)

    @pl.when(smask_ref[0, 0, 0, 0] > 0)
    def _visit():
        _occlusion_visit(
            mask_ref, aabb_ref, rays_ref, w_ref, occ_ref,
            j=j, rt=rt, c=c, t_min=t_min, t_max=t_max, n_sub=n_sub,
        )


def _occlusion_visit(
    mask_ref, aabb_ref, rays_ref, w_ref, occ_ref,
    *, j, rt, c, t_min, t_max, n_sub,
):
    aabb6 = tuple(aabb_ref[0, 0, 0, k] for k in range(6))
    for s in range(n_sub):  # static unroll (see closest kernel)
        @pl.when(mask_ref[0, 0, s, 0] > 0)
        def _(s=s):
            r = rays_ref[s]
            o = V3(r[0], r[1], r[2])
            d = V3(r[3], r[4], r[5])
            live = occ_ref[s] == 0
            best = jnp.where(live, jnp.full((rt,), t_max), t_min)
            n_live = _slab_live(aabb6, r, best, t_min)

            @pl.when(n_live > 0.0)
            def _():
                t, _, _ = _tri_hits_soa(w_ref[:], o, d, t_min, t_max, c)
                any_hit = jnp.min(t, axis=0) < INF
                occ_ref[s] = occ_ref[s] | any_hit.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("t_min", "t_max", "interpret"))
def occlusion_stream(woop3, aabb, o, d, t_min=1e-4, t_max=INF, interpret=False):
    """Streaming any-hit occlusion (segment query when d is unnormalized and
    t in (t_min, t_max) spans the segment). Returns bool [N]."""
    n = o.shape[0]
    m = aabb.shape[0]
    c = woop3.shape[2] // m
    rs, rt = _pick_rs(n)
    n_sub = rs // rt
    rows = n // rt
    n_super = n // rs
    mask, smask = _mask_smem(_overlap_mask(o, d, aabb, rt, t_max), n_super, n_sub)
    aabb4 = aabb.reshape(m, 1, 1, 8)
    rays = _rays_soa(o, d, rows, rt)
    grid = (n_super, m)
    kernel = functools.partial(
        _occlusion_stream_kernel, rt=rt, c=c, t_min=t_min, t_max=t_max,
        n_sub=n_sub,
    )
    occ = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, 1, 1), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 1, n_sub, 1), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 1, 1, 8), lambda i, j: (j, 0, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (n_sub, R_ROWS, rt), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((4, 3, c), lambda i, j: (0, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (n_sub, rt), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows, rt), jnp.int32),
        interpret=interpret,
    )(smask, mask, aabb4, rays, woop3)
    return occ.reshape(n).astype(bool)
