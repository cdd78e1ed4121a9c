"""BVH-cluster streaming traversal: ray tracing beyond the VMEM ceiling.

The dense megakernel needs the whole Woop table resident in VMEM (~8k tris).
This module is the large-scene path, the TPU-native replacement for the
reference's hardware TLAS/BLAS traversal (RtAccelerationStructure.h:26-110,
RayQuery.hlsli:42-140):

  - the host BVH (accel.bvh, binned SAH) groups triangles into clusters of
    ``C`` (scene.upload_scene permutes + pads the triangle arrays so cluster
    c owns Woop lanes [c*C, (c+1)*C));
  - rays are sorted into coherent shafts (direction octant + origin Morton
    code) so every 256-ray subtile spans a tight origin box and direction
    cone -- without this, secondary/GI ray tiles overlap EVERY cluster and
    tile culling is useless (round-3 profile: 100% mask occupancy,
    0.3 Mrays/s);
  - a cheap XLA pre-pass rates every (ray-subtile, cluster) pair with a
    conservative interval-arithmetic overlap test (origin box x direction
    box vs cluster AABB) and produces, per ray *supertile*, a front-to-back
    (shaft-entry t, bucket-ranked -- XLA argsort costs 1.7 ms where the
    cumsum rank costs ~0.2) ordered visit list of overlapping clusters;
  - a Pallas kernel runs a DYNAMIC grid of exactly the visited
    (supertile, cluster) pairs, with the pair list scalar-prefetched
    (``pltpu.PrefetchScalarGridSpec``; grid size = true visit count):
    culled clusters are never DMA'd and never cost a grid step, and the ray
    supertile (SoA rows [16, rt] per subtile: o, d, 1/d) stays RESIDENT in
    VMEM across the whole sweep. Inside a visit, two more culling levels
    skip the intersection block per subtile via ``@pl.when``: the SMEM
    subtile mask (geometry) and an in-kernel slab test against the rays'
    current best t -- front-to-back order makes this early termination
    effective. Tile-level culling instead of per-ray stacks: the
    divergence-free TPU answer to BVH traversal (SURVEY.md hard parts #1).
  - the closest kernel tracks only (best t, best tri): the winning
    triangle's (u, v) are recomputed OUTSIDE the kernel from one 12-row XLA
    gather, which deletes two [C, rt] select-reduce passes from every
    visited pair (the epilogue was ~40% of per-pair cost).

Layouts: the Woop table is pre-laid-out [M, 4, 3C] at scene upload
(scene.stream_woop_layout) so cluster blocks stream contiguously; all
[rows, M] pre-pass intermediates keep the axis dim MAJOR ([3, rows, M]) --
a [rows, M, 3] form pads the minor dim 3 -> 128 under TPU tiling, a 40x
memory bloat that cost 3 ms/call in round 3.

Total HBM traffic: rays once + (supertiles x *overlapping* Woop blocks);
compute scales with the overlapping (subtile, cluster) pairs only.
Attributes for the winning triangle are fetched by one XLA gather
afterwards (32 rows x N), NOT streamed -- the attribute table is 2.7x the
Woop data and only 1/C of it is ever needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.vec3 import V3

INF = 3.0e38
RS = 4096  # rays per supertile (VMEM-resident)
RT_SUB = 256  # rays per culling subtile
R_ROWS = 16  # SoA ray rows: 0-2 o | 3-5 d | 6-8 1/d | 9-15 pad (8-multiple)
MAX_SUPER = 64  # supertiles per pallas_call (bounds the SMEM visit list)
NB = 32  # t-near rank buckets for the front-to-back visit order


def _pick_rs(n_rays: int):
    rs = min(RS, n_rays)
    while n_rays % rs:
        rs //= 2
    rt = min(RT_SUB, rs)
    return rs, rt


_BIG_T = 2.0e38


def _overlap_tnear(oT, dT, aabb, rt, t_max, live=None):
    """Conservative (subtile x cluster) overlap, [rows, M]. oT/dT: [3, N]
    (the [N, 3] -> [3, N] transpose is TPU-hostile, ~0.6 ms at 65k rays, so
    the caller does it ONCE and shares it with the ray-SoA build).

    Interval-arithmetic slab test: the subtile is abstracted as the interval
    ray (origin box O, direction box D); per axis the t-interval that can
    reach the cluster slab is the interval quotient (C - O) / D, and the
    per-axis intervals are intersected like a scalar slab test. Every
    concrete ray's slab intervals lie inside these, so the test never culls
    a true hit; narrow direction cones (coherent/sorted tiles) cull tightly
    because the cross-axis intersection captures the frustum.

    ``live``: optional bool [N] -- rays excluded from the subtile boxes
    (the two-phase capped traversal's phase-2 masking: already-resolved
    rays must not widen their subtile's frustum). Fully-dead subtiles are
    masked off entirely.

    Returns (mask int32 [rows, M], t_near f32 [rows, M]) where t_near is the
    conservative shaft entry distance (INF where no overlap) -- the
    front-to-back visit-order key. All [*, rows, M] intermediates keep the
    axis dim major (see module docstring).
    """
    n = oT.shape[1]
    rows = n // rt
    oT = oT.reshape(3, rows, rt)
    dT = dT.reshape(3, rows, rt)
    if live is not None:
        lv = live.reshape(1, rows, rt)
        olo = jnp.where(lv, oT, _BIG_T).min(2)[..., None]
        ohi = jnp.where(lv, oT, -_BIG_T).max(2)[..., None]
        dlo = jnp.where(lv, dT, _BIG_T).min(2)[..., None]
        dhi = jnp.where(lv, dT, -_BIG_T).max(2)[..., None]
    else:
        olo = oT.min(2)[..., None]  # [3, rows, 1]
        ohi = oT.max(2)[..., None]
        dlo = dT.min(2)[..., None]
        dhi = dT.max(2)[..., None]
    clo = aabb[:, 0:3].T[:, None, :]  # [3, 1, M]
    chi = aabb[:, 3:6].T[:, None, :]

    n_lo = clo - ohi  # numerator interval [n_lo, n_hi], [3, rows, M]
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
    t_near = jnp.maximum(t_lo.max(0), 0.0)  # [rows, M]
    t_far = jnp.minimum(t_hi.min(0), t_max)
    ok = t_far >= t_near
    if live is not None:
        # inverted (all-dead) boxes can alias a valid window: mask explicitly
        any_live = live.reshape(rows, rt).max(1)[:, None] > 0
        ok = ok & any_live
    return ok.astype(jnp.int32), jnp.where(ok, t_near, INF)


def _overlap_mask(o, d, aabb, rt, t_max):
    """Mask-only form of :func:`_overlap_tnear` (profiling/tests)."""
    return _overlap_tnear(o.T, d.T, aabb, rt, t_max)[0]


def _visit_pairs(mask, tnear, n_super, n_sub):
    """Flat (supertile, cluster) visit-pair list from the subtile overlap.

    mask/tnear: [rows, M]. The Pallas grid runs EXACTLY the visited pairs
    (dynamic grid size = total visit count): culled clusters cost nothing --
    not even a no-op grid step (0.41 us each; a [16 supertile x 1398
    cluster] static grid paid a 9.3 ms floor).

    Returns
      pair_i [Vmax] int32 -- supertile of each visit (monotone);
      pair_c [Vmax] int32 -- cluster id, front-to-back (shaft-entry t,
             NB-bucket rank; XLA argsort costs ~10x) within a supertile;
      v      scalar int32 -- true pair count (the dynamic grid size);
      msk    [Vmax, n_sub, 1] int32 -- subtile masks per pair (SMEM blocks);
      touched [n_super] bool -- supertiles with at least one visit (the
             caller resets outputs of untouched ones; their output blocks
             are never written by the kernel).
    """
    m = mask.shape[1]
    vmax = n_super * m
    msk = mask.reshape(n_super, n_sub, m)
    tn = tnear.reshape(n_super, n_sub, m)
    sup = msk.max(1) > 0  # [n_super, M]
    tkey = jnp.where(sup, tn.min(1), INF)
    cnt = sup.sum(1).astype(jnp.int32)
    # bucketed t-near rank; within-bucket prefix counts via one strictly-
    # lower-triangular MXU matmul (exact: 0/1 bf16 inputs, f32 accumulate)
    tmax = jnp.max(jnp.where(sup, tkey, 0.0), axis=1, keepdims=True)
    b = jnp.clip(
        (tkey / jnp.maximum(tmax, 1e-20) * (NB - 2)).astype(jnp.int32),
        0, NB - 2,
    )
    b = jnp.where(sup, b, NB - 1)
    oneh = (b[:, :, None] == jnp.arange(NB, dtype=jnp.int32)).astype(jnp.bfloat16)
    ii = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
    tril = (jj < ii).astype(jnp.bfloat16)  # strictly lower
    within = jax.lax.dot_general(
        tril, oneh, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [m, n_super, NB]: count of j < i in i's bucket
    within = within.transpose(1, 0, 2)
    # f32 accumulation: a bf16 sum rounds once a bucket exceeds 512 entries,
    # which shifts cumulative offsets, collides ranks in the order scatter,
    # and silently drops clusters from the visit list (advisor round 4).
    hist = oneh.sum(1, dtype=jnp.float32)  # [n_super, NB]
    offs = jnp.cumsum(hist, axis=1) - hist
    # select-at-bucket via masked minor-axis sums (take_along_axis gathers
    # along a 32-wide minor dim, which lowers poorly on TPU)
    oneh_f = oneh.astype(jnp.float32)
    rank = (
        (offs[:, None, :] * oneh_f).sum(-1) + (within * oneh_f).sum(-1)
    ).astype(jnp.int32)
    col = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32), (n_super, m))
    order = jnp.zeros((n_super, m), jnp.int32)
    order = order.at[jnp.arange(n_super)[:, None], rank].set(col)
    # flatten per-supertile [0, cnt) prefixes into one pair list
    starts = jnp.cumsum(cnt) - cnt  # [n_super]
    v = cnt.sum()
    q = jnp.arange(vmax, dtype=jnp.int32)
    seg = jnp.zeros((vmax,), jnp.int32).at[starts[1:]].add(1)
    pair_i = jnp.minimum(jnp.cumsum(seg), n_super - 1)
    pos = q - starts[pair_i]
    pos = jnp.clip(pos, 0, m - 1)
    pair_c = order.reshape(-1)[pair_i * m + pos]
    mt = msk.transpose(0, 2, 1).reshape(n_super * m, n_sub)
    msk_p = mt[pair_i * m + pair_c]
    return pair_i, pair_c, v, msk_p[..., None], cnt > 0


# --------------------------------------------------------------------------
# Ray sorting: shaft coherence for secondary rays
# --------------------------------------------------------------------------


def _morton_spread(x):
    """Spread the low 10 bits of ``x`` (uint32) to every third bit."""
    x = (x | (x << 16)) & jnp.uint32(0x030000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


def _sort_perm(o, d, aabb):
    """Shaft-coherence permutation: coarse origin Morton cell, then a fine
    octahedral DIRECTION cell, then the remaining Morton bits. Returns
    (perm, inv) so that sorted = x[perm] and original = sorted[inv].

    Key layout (high -> low): octant (3) | morton_hi (9 = 8x8x8 origin
    cells) | dir_fine (4 = 16 within-octant cone cells, ~22 degrees) |
    morton_lo (16). The round-4 key (octant << 29 | morton) gave every
    SUBTILE a 90-degree direction cone, whose interval frustum overlaps
    every cluster for hemisphere/GI rays -- measured 100% mask occupancy
    and 0.71 Mrays/s brute force at 229k tris. Supertiles still get the
    octant+origin shaft (the visit-list granularity), but their subtiles
    now split by fine direction cell, so the per-subtile masks -- which
    gate the expensive [C, rt] intersect blocks -- see narrow cones and
    cull again. Primary rays (one origin) degrade to octant + cone +
    residual-Morton order, equivalent to the old image order.

    Robust bounds: mean +- 2.5 sigma of the cluster centers, clamped to the
    true bounds. The Cornell asset's 100x100 ground plane around a +-2 unit
    interior would otherwise collapse every interior origin into a handful
    of Morton cells and destroy the sort's discrimination (this is a sort
    KEY only -- outliers clamp to the edge, correctness is unaffected)."""
    n = o.shape[0]
    lo_t = jnp.min(aabb[:, 0:3], axis=0)
    hi_t = jnp.max(aabb[:, 3:6], axis=0)
    ctr = 0.5 * (aabb[:, 0:3] + aabb[:, 3:6])
    mu = ctr.mean(0)
    sd = ctr.std(0)
    lo = jnp.maximum(lo_t, mu - 2.5 * sd)
    hi = jnp.minimum(hi_t, mu + 2.5 * sd)
    q = jnp.clip((o - lo) / jnp.maximum(hi - lo, 1e-6), 0.0, 1.0)
    qi = (q * 1023.0).astype(jnp.uint32)
    mx = _morton_spread(qi[:, 0])
    my = _morton_spread(qi[:, 1])
    mz = _morton_spread(qi[:, 2])
    morton = (mx << 2) | (my << 1) | mz  # 30 bits
    octant = (
        ((d[:, 0] < 0).astype(jnp.uint32) << 2)
        | ((d[:, 1] < 0).astype(jnp.uint32) << 1)
        | (d[:, 2] < 0).astype(jnp.uint32)
    )
    # within-octant cone cell: |d| normalized to the L1 simplex, 2+2 bits
    a = jnp.abs(d)
    s = jnp.maximum(a.sum(-1), 1e-20)
    du = jnp.clip(a[:, 1] / s * 4.0, 0.0, 3.0).astype(jnp.uint32)
    dv = jnp.clip(a[:, 2] / s * 4.0, 0.0, 3.0).astype(jnp.uint32)
    dir_fine = (du << 2) | dv  # 4 bits, ~16 cells per octant
    m_hi = morton >> 21  # top 9 bits (3 per axis)
    m_lo = (morton >> 5) & jnp.uint32(0xFFFF)  # next 16 bits
    key = (octant << 29) | (m_hi << 20) | (dir_fine << 16) | m_lo
    _, perm = jax.lax.sort_key_val(key, jnp.arange(n, dtype=jnp.int32))
    inv = jnp.zeros((n,), jnp.int32).at[perm].set(jnp.arange(n, dtype=jnp.int32))
    return perm, inv


# --------------------------------------------------------------------------
# In-kernel intersection
# --------------------------------------------------------------------------


def _tri_valid_t(w2, o: V3, d: V3, t_min, t_max, c):
    """Woop intersection of a cluster block against a ray subtile.

    w2: [4, 3*c] pre-transposed Woop block -- column r*c+j holds row r of
    triangle j's affine map, rows are the (x, y, z, const) coefficients.
    Returns ([c, rt] bool valid-hit, [c, rt] f32 t).

    Broadcast-FMA on the VPU. An MXU dot_general form measured ~2x SLOWER
    on v5e: the contraction dim is 4, so the MXU pads K 4->128 and wastes
    97% of each pass. No explicit parallel-ray guard: dw == 0 yields
    +-inf/NaN t whose window/inside comparisons are all False (IEEE).
    """

    def row(r):
        wr = [w2[k, r * c : (r + 1) * c][:, None] for k in range(4)]
        lo = (
            wr[0] * o.x[None, :]
            + wr[1] * o.y[None, :]
            + wr[2] * o.z[None, :]
            + wr[3]
        )
        ld = wr[0] * d.x[None, :] + wr[1] * d.y[None, :] + wr[2] * d.z[None, :]
        return lo, ld

    (ou, du) = row(0)
    (ov, dv) = row(1)
    (ow, dw) = row(2)
    t = -ow / dw
    u = ou + t * du
    v = ov + t * dv
    valid = (
        (t > t_min) & (t < t_max)
        & (jnp.minimum(u, v) >= 0.0) & (u + v <= 1.0)
    )
    return valid, t




def _rays_soa(oT, dT, rows, rt):
    """[3, N] oT/dT -> [rows, R_ROWS, rt] SoA ray rows (o, d, 1/d).

    Takes the T layout (shared with the overlap prepass -- each [N, 3] ->
    [3, N] transpose costs ~0.6 ms at 65k rays) and builds row-major with
    only a major-axis transpose."""
    n = oT.shape[1]
    safe = jnp.where(jnp.abs(dT) < 1e-20, 1e-20, dT)
    r = jnp.concatenate(
        [oT, dT, 1.0 / safe, jnp.zeros((R_ROWS - 9, n))], axis=0
    )  # [R_ROWS, N]
    return r.reshape(R_ROWS, rows, rt).transpose(1, 0, 2)


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


# --------------------------------------------------------------------------
# Kernels
# --------------------------------------------------------------------------


def _is_first_of_supertile(pi_ref, k):
    """1 when grid step k is its supertile's first visit (output block init)."""
    prev = pi_ref[jnp.maximum(k - 1, 0)]
    return (k == 0) | (pi_ref[k] != prev)


def _closest_stream_kernel(
    pi_ref, pc_ref, mask_ref, aabb_ref, rays_ref, w_ref,
    t_ref, tri_ref,
    *, rt, c, t_min, t_max, n_sub,
):
    k = pl.program_id(0)

    @pl.when(_is_first_of_supertile(pi_ref, k))
    def _():
        t_ref[:] = jnp.full_like(t_ref, INF)
        tri_ref[:] = jnp.full_like(tri_ref, -1)

    cluster = pc_ref[k]
    aabb6 = tuple(aabb_ref[0, 0, 0, kk] for kk in range(6))
    w2 = w_ref[0]
    for s in range(n_sub):  # static unroll: keeps layouts provable
        @pl.when(mask_ref[0, s, 0] > 0)
        def _(s=s):
            r = rays_ref[s]
            o = V3(r[0], r[1], r[2])
            d = V3(r[3], r[4], r[5])
            best = jnp.minimum(t_ref[s], t_max)
            n_live = _slab_live(aabb6, r, best, t_min)

            @pl.when(n_live > 0.0)
            def _():
                valid, t = _tri_valid_t(w2, o, d, t_min, t_max, c)
                t = jnp.where(valid, t, INF)
                tmin = jnp.min(t, axis=0)
                hit = tmin < INF
                iota = jax.lax.broadcasted_iota(jnp.int32, (c, rt), 0)
                is_min = t == tmin[None, :]
                idx = jnp.max(jnp.where(is_min, iota, -1), axis=0)
                better = (tmin < t_ref[s]) & hit
                t_ref[s] = jnp.where(better, tmin, t_ref[s])
                tri_ref[s] = jnp.where(better, cluster * c + idx, tri_ref[s])


def _occlusion_stream_kernel(
    pi_ref, pc_ref, mask_ref, aabb_ref, rays_ref, w_ref, occ_ref,
    *, rt, c, t_min, t_max, n_sub,
):
    k = pl.program_id(0)

    @pl.when(_is_first_of_supertile(pi_ref, k))
    def _():
        occ_ref[:] = jnp.zeros_like(occ_ref)

    aabb6 = tuple(aabb_ref[0, 0, 0, kk] for kk in range(6))
    w2 = w_ref[0]
    for s in range(n_sub):  # static unroll (see closest kernel)
        @pl.when(mask_ref[0, s, 0] > 0)
        def _(s=s):
            r = rays_ref[s]
            o = V3(r[0], r[1], r[2])
            d = V3(r[3], r[4], r[5])
            live = occ_ref[s] == 0
            best = jnp.where(live, jnp.full((rt,), t_max), t_min)
            n_live = _slab_live(aabb6, r, best, t_min)

            @pl.when(n_live > 0.0)
            def _():
                valid, _ = _tri_valid_t(w2, o, d, t_min, t_max, c)
                any_hit = jnp.max(valid.astype(jnp.int32), axis=0)
                occ_ref[s] = occ_ref[s] | any_hit


# --------------------------------------------------------------------------
# Host-side wrappers
# --------------------------------------------------------------------------


def _stream_call(
    kernel_fn, outs, miss_vals, woop4, aabb, o, d,
    t_min, t_max, interpret, live=None,
):
    """Shared launch: flat visit-pair list + dynamic-grid pallas_call,
    chunked over at most MAX_SUPER supertiles so the SMEM pair list stays
    bounded. ``miss_vals``: per-output fill for supertiles with zero visits
    (their output blocks are never written by the kernel). ``live``:
    optional bool [N] -- dead rays are excluded from the prepass frustum
    boxes AND neutralized in the ray SoA (origin parked far outside every
    cluster so the in-kernel slab test rejects them) without re-sorting."""
    n = o.shape[0]
    m = aabb.shape[0]
    c = woop4.shape[2] // 3
    rs, rt = _pick_rs(n)
    n_sub = rs // rt
    rows = n // rt
    n_super = n // rs
    if live is not None:
        o = jnp.where(live[:, None], o, 3.0e7)
    oT, dT = o.T, d.T  # hostile transpose: done ONCE, shared
    mask, tnear = _overlap_tnear(oT, dT, aabb, rt, t_max, live=live)
    aabb4 = aabb.reshape(m, 1, 1, 8)
    rays = _rays_soa(oT, dT, rows, rt)

    kernel = functools.partial(
        kernel_fn, rt=rt, c=c, t_min=t_min, t_max=t_max, n_sub=n_sub
    )
    out_spec = pl.BlockSpec(
        (n_sub, rt), lambda k, pi, pc: (pi[k], 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec(
            (1, n_sub, 1), lambda k, pi, pc: (k, 0, 0),
            memory_space=pltpu.SMEM,
        ),
        pl.BlockSpec(
            (1, 1, 1, 8), lambda k, pi, pc: (pc[k], 0, 0, 0),
            memory_space=pltpu.SMEM,
        ),
        pl.BlockSpec(
            (n_sub, R_ROWS, rt), lambda k, pi, pc: (pi[k], 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 4, 3 * c), lambda k, pi, pc: (pc[k], 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]

    n_chunk = -(-n_super // MAX_SUPER)  # ceil
    per = -(-n_super // n_chunk)
    results = []
    for ck in range(n_chunk):
        lo_s = ck * per
        hi_s = min((ck + 1) * per, n_super)
        ns_k = hi_s - lo_s
        msel = mask[lo_s * n_sub : hi_s * n_sub]
        tsel = tnear[lo_s * n_sub : hi_s * n_sub]
        pair_i, pair_c, v, msk, touched = _visit_pairs(msel, tsel, ns_k, n_sub)
        rows_k = ns_k * n_sub
        out_shapes = tuple(
            jax.ShapeDtypeStruct((rows_k, rt), dt) for dt in outs
        )
        out_specs = out_spec if len(outs) == 1 else tuple(out_spec for _ in outs)
        res = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(v,),
                in_specs=in_specs,
                out_specs=out_specs,
            ),
            out_shape=out_shapes if len(outs) > 1 else out_shapes[0],
            interpret=interpret,
        )(pair_i, pair_c, msk, aabb4, rays[lo_s * n_sub : hi_s * n_sub], woop4)
        if len(outs) == 1:
            res = (res,)
        ok = jnp.repeat(touched, n_sub)[:, None]  # [rows_k, 1]
        res = tuple(
            jnp.where(ok, r, jnp.asarray(mv, dtype=r.dtype))
            for r, mv in zip(res, miss_vals)
        )
        results.append(res)
    if n_chunk == 1:
        return results[0]
    return tuple(jnp.concatenate(parts, axis=0) for parts in zip(*results))


def _closest_call(woop4, aabb, o, d, t_min, t_max, interpret, t_cap=0.0):
    """Closest-hit launch with optional TWO-PHASE distance capping.

    With ``0 < t_cap < t_max``, phase 1 sweeps only t in (t_min, t_cap]:
    every subtile frustum is clipped at t_cap, which collapses the overlap
    mask for hemisphere/GI shafts (measured 46% -> ~8% cluster occupancy at
    229k tris -- unbounded frustums from interior surfaces sweep half the
    scene). A phase-1 hit is the GLOBAL closest (all clusters intersecting
    the capped frustum were visited), so phase 2 re-sweeps the full range
    only for phase-1 misses: those rays stay in place (no re-sort) but are
    masked out of the prepass frustum boxes and parked in the ray SoA
    (``live``), so surviving subtiles cull like a fresh sweep. This is the
    TPU analog of a BVH traversal's early ray termination, which the
    per-visit kernel can only approximate (front-to-back slab-vs-best-t).

    Returns (t [rows, rt], tri [rows, rt]) in the caller's (sorted) order.
    """
    t1, tri1 = _stream_call(
        _closest_stream_kernel, (jnp.float32, jnp.int32), (INF, -1),
        woop4, aabb, o, d, t_min, min(t_cap, t_max) if t_cap > 0.0 else t_max,
        interpret,
    )
    if not (0.0 < t_cap < t_max):
        return t1, tri1
    n = o.shape[0]
    unresolved = (tri1 < 0).reshape(n)
    t2, tri2 = _stream_call(
        _closest_stream_kernel, (jnp.float32, jnp.int32), (INF, -1),
        woop4, aabb, o, d, t_min, t_max, interpret, live=unresolved,
    )
    un = unresolved.reshape(t1.shape)
    return jnp.where(un, t2, t1), jnp.where(un, tri2, tri1)


def _uv_postpass(woop3, tri, o, d):
    """Recompute (t, u, v) for each ray's winning triangle from a 12-row
    gather -- the kernel only tracks (t, tri), saving two [C, rt] passes per
    visited pair. Same Woop math as in-kernel, so results agree to fp."""
    safe = jnp.maximum(tri, 0)
    w = woop3[:, :, safe]  # [4, 3, N]
    ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]

    def row(r):
        lo = w[0, r] * ox + w[1, r] * oy + w[2, r] * oz + w[3, r]
        ld = w[0, r] * dx + w[1, r] * dy + w[2, r] * dz
        return lo, ld

    ou, du = row(0)
    ov, dv = row(1)
    ow, dw = row(2)
    par = jnp.abs(dw) < 1e-12
    t = -ow / jnp.where(par, 1.0, dw)
    u = ou + t * du
    v = ov + t * dv
    hit = tri >= 0
    return (
        jnp.where(hit, t, INF),
        jnp.where(hit, u, 0.0),
        jnp.where(hit, v, 0.0),
    )


def _mt_tuv(v0, e1, e2, o, d):
    """Moller-Trumbore (t, u, v) for per-ray gathered triangles. All [N, 3].
    Barycentric convention matches Woop's (u along e1, v along e2)."""
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=1)
    inv = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    tvec = o - v0
    u = jnp.sum(tvec * pvec, axis=1) * inv
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=1) * inv
    t = jnp.sum(e2 * qvec, axis=1) * inv
    return t, u, v


@functools.partial(
    jax.jit, static_argnames=("t_min", "t_max", "interpret", "sort", "t_cap")
)
def closest_hit_stream_shaded(
    stream_attrs, woop_stream, aabb, o, d,
    t_min=1e-4, t_max=INF, interpret=False, sort=True, t_cap=0.0,
):
    """Streaming closest hit WITH shading attributes: the production path.

    ``stream_attrs``: [Tp, AW + 12] cached table (scene upload/refit) --
    per-triangle attribute row (A.WIDTH cols) followed by v0|e1|e2 (9 cols)
    and padding. One gather fetches attrs AND the winning triangle's
    geometry (t/u/v recomputed Moller-Trumbore in XLA), and ONE gather
    un-permutes the whole result block back to caller ray order -- XLA row
    gathers cost ~2 ms per take at 65k indices regardless of row width, so
    the separate uv-gather + attrs-gather + 4 scalar un-permutes of the
    naive formulation cost ~3x this.

    Returns (t [N], tri [N] i32, u, v, attrs [N, AW]).
    """
    aw = stream_attrs.shape[1] - 12
    if sort:
        perm, inv = _sort_perm(o, d, aabb)
        o, d = o[perm], d[perm]
    n = o.shape[0]
    _, tri = _closest_call(
        woop_stream, aabb, o, d, t_min, t_max, interpret, t_cap=t_cap
    )
    tri = tri.reshape(n)
    hit = tri >= 0
    g = stream_attrs[jnp.maximum(tri, 0)]  # ONE [N, AW+12] gather
    t, u, v = _mt_tuv(
        g[:, aw : aw + 3], g[:, aw + 3 : aw + 6], g[:, aw + 6 : aw + 9], o, d
    )
    hf = hit[:, None]
    combined = jnp.concatenate(
        [
            jnp.where(hf, g[:, :aw], 0.0),
            jnp.where(hit, t, INF)[:, None],
            jnp.where(hit, u, 0.0)[:, None],
            jnp.where(hit, v, 0.0)[:, None],
            tri.astype(jnp.float32)[:, None],  # < 2^24: exact in f32
        ],
        axis=1,
    )
    if sort:
        combined = combined[inv]  # ONE un-permuting gather
    t = combined[:, aw]
    u = combined[:, aw + 1]
    v = combined[:, aw + 2]
    tri = combined[:, aw + 3].astype(jnp.int32)
    return t, tri, u, v, combined[:, :aw]


@functools.partial(
    jax.jit, static_argnames=("t_min", "t_max", "interpret", "sort", "t_cap")
)
def closest_hit_stream(
    woop3, woop_stream, aabb, o, d,
    t_min=1e-4, t_max=INF, interpret=False, sort=True, t_cap=0.0,
):
    """Streaming closest hit. woop3: [4, 3, M*C] cluster-ordered Woop (used
    for the winning-triangle uv gather); woop_stream: [M, 4, 3C] kernel
    layout (scene.stream_woop_layout); aabb: [M, 8] cluster bounds rows
    (lo.xyz, hi.xyz, pad); o/d: [N, 3].
    Returns (t [N], tri [N] i32 cluster-slot id, u, v)."""
    if sort:
        perm, inv = _sort_perm(o, d, aabb)
        o, d = o[perm], d[perm]
    n = o.shape[0]
    _, tri = _closest_call(
        woop_stream, aabb, o, d, t_min, t_max, interpret, t_cap=t_cap
    )
    tri = tri.reshape(n)
    t, u, v = _uv_postpass(woop3, tri, o, d)
    if sort:
        t, tri, u, v = t[inv], tri[inv], u[inv], v[inv]
    return t, tri, u, v


@functools.partial(
    jax.jit, static_argnames=("t_min", "t_max", "interpret", "sort")
)
def occlusion_stream(
    woop_stream, aabb, o, d,
    t_min=1e-4, t_max=INF, interpret=False, sort=True,
):
    """Streaming any-hit occlusion (segment query when d is unnormalized and
    t in (t_min, t_max) spans the segment). woop_stream: [M, 4, 3C] kernel
    layout. Returns bool [N]."""
    if sort:
        perm, inv = _sort_perm(o, d, aabb)
        o, d = o[perm], d[perm]
    n = o.shape[0]
    (occ,) = _stream_call(
        _occlusion_stream_kernel, (jnp.int32,), (0,),
        woop_stream, aabb, o, d, t_min, t_max, interpret,
    )
    occ = occ.reshape(n)
    if sort:
        occ = occ[inv]
    return occ.astype(bool)
