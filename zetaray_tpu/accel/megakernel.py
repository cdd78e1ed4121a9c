"""The path-tracing bounce megakernel (Pallas TPU).

One ``pallas_call`` per bounce does EVERYTHING for a tile of rays without
leaving VMEM: closest-hit intersection (Woop SoA), one-hot attribute fetch,
surface reconstruction, emitted-light MIS, NEE against a presampled light
set, the shadow-ray occlusion test, BSDF sampling, and Russian roulette.
This replaces ~40 XLA stages whose HBM round trips dominated the split
implementation (measured: 190 ms -> target <40 ms for 512x512x5 bounces).

Correspondences to the reference:
  - the whole kernel ~= one ReSTIR-style uber compute pass over the
    wavefront (IndirectLighting.cpp's PathTracer kernels);
  - the presampled light set = PreLighting's PresampleEmissives
    (DefaultRendererImpl.h:37-38: 128 sets x 512 samples); each ray tile
    reads one set resident in VMEM and picks samples via a K=128 one-hot
    matmul on the MXU -- O(1) light sampling without in-kernel gathers;
  - pcg4d (shading_soa) = Sampling.hlsli's per-pixel PCG streams.

Path state lives in a [16, N] SoA f32 array, aliased in/out of the kernel:
  rows 0-2 o | 3-5 d | 6-8 throughput | 9-11 radiance
  12 prev_bsdf_pdf | 13 alive | 14 specular-bounce flag | 15 pad

Scene limits (v1): the whole Woop + attribute tables must fit VMEM
(T <= 8192 triangles with the chunked fori loops). Larger scenes stream
BVH clusters from HBM (accel.bvh_stream).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import vec3 as v3
from ..core.vec3 import V3
from ..ops import shading_soa as S
from ..scene.scene import A

INF = 3.0e38
_EPS_RAY = 1e-3
STATE_ROWS = 16
LSET_ROWS = 16  # 0-2 pos | 3-5 ng | 6-8 Le | 9 pdf_area | 10 two_sided
PS = 128  # presampled light samples per set
NS = 64  # number of presampled sets


def _tri_hits_soa(w, o: V3, d: V3, t_min, t_max, tc):
    """w: [4, 3, tc] Woop chunk; o/d: V3 of [rt]. Returns ([tc, rt] ...).

    Two lowerings, A/B-measured on v5e at 512^2:
      - broadcast FMAs on the VPU (default): 9.9 ms/full bounce;
      - the Woop transform as two [3*tc, 4] x [4, rt] MXU dot_generals
        (ZETARAY_WOOP_MXU=1): 3.5x faster on an ISOLATED closest-hit
        kernel, but 10.4 ms inside the full bounce kernel -- the in-kernel
        [4,3,tc] transpose + extra VMEM pressure costs more than the MXU
        saves once the kernel is shading-bound. Kept selectable for
        intersection-bound workloads (accel.stream large scenes)."""
    import os

    if not os.environ.get("ZETARAY_WOOP_MXU"):
        return _tri_hits_vpu(w, o, d, t_min, t_max, tc)
    rt = o.x.shape[0]
    A = w.transpose(1, 2, 0).reshape(3 * tc, 4)
    O = jnp.concatenate(
        [o.x[None], o.y[None], o.z[None], jnp.ones((1, rt))], axis=0
    )
    D = jnp.concatenate(
        [d.x[None], d.y[None], d.z[None], jnp.zeros((1, rt))], axis=0
    )
    dims = (((1,), (0,)), ((), ()))
    LO = jax.lax.dot_general(
        A, O, dims, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    LD = jax.lax.dot_general(
        A, D, dims, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    ou, ov, ow = LO[:tc], LO[tc : 2 * tc], LO[2 * tc :]
    du, dv, dw = LD[:tc], LD[tc : 2 * tc], LD[2 * tc :]
    par = jnp.abs(dw) < 1e-12
    t = -ow / jnp.where(par, 1.0, dw)
    u = ou + t * du
    v = ov + t * dv
    valid = (
        (~par) & (t > t_min) & (t < t_max) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
    )
    return jnp.where(valid, t, INF), u, v


def _tri_hits_vpu(w, o: V3, d: V3, t_min, t_max, tc):
    """Broadcast-FMA (VPU) form of _tri_hits_soa, kept for A/B timing."""

    def row(r):
        lo = (
            w[0, r][:, None] * o.x[None, :]
            + w[1, r][:, None] * o.y[None, :]
            + w[2, r][:, None] * o.z[None, :]
            + w[3, r][:, None]
        )
        ld = (
            w[0, r][:, None] * d.x[None, :]
            + w[1, r][:, None] * d.y[None, :]
            + w[2, r][:, None] * d.z[None, :]
        )
        return lo, ld

    (ou, du) = row(0)
    (ov, dv) = row(1)
    (ow, dw) = row(2)
    par = jnp.abs(dw) < 1e-12
    t = -ow / jnp.where(par, 1.0, dw)
    u = ou + t * du
    v = ov + t * dv
    valid = (
        (~par) & (t > t_min) & (t < t_max) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
    )
    return jnp.where(valid, t, INF), u, v


# Unroll the triangle-chunk loop only for small scenes; larger ones use a
# fori_loop (bounded compile time + VMEM reuse across iterations).
_UNROLL_CHUNKS = 4


def _closest_soa(woop_ref, attrsT_ref, o, d, t_min, rt, tp, tc):
    """Chunked closest hit over all tris. Returns (t, u, v, attrs)."""
    n_chunks = tp // tc

    def chunk(c, carry):
        best_t, best_u, best_v, attrs = carry
        w = woop_ref[:, :, pl.ds(c * tc, tc)]
        t, u, v = _tri_hits_soa(w, o, d, t_min, INF, tc)
        tmin_c = jnp.min(t, axis=0)
        hit_c = tmin_c < INF
        iota = jax.lax.broadcasted_iota(jnp.int32, (tc, rt), 0)
        is_min = t == tmin_c[None, :]
        idx = jnp.max(jnp.where(is_min, iota, -1), axis=0)
        sel = (iota == idx[None, :]) & hit_c[None, :]
        sel_f = sel.astype(jnp.float32)
        att_c = jax.lax.dot_general(
            attrsT_ref[:, pl.ds(c * tc, tc)],
            sel_f,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        u_c = jnp.sum(jnp.where(sel, u, 0.0), axis=0)
        v_c = jnp.sum(jnp.where(sel, v, 0.0), axis=0)
        better = tmin_c < best_t
        best_u = jnp.where(better, u_c, best_u)
        best_v = jnp.where(better, v_c, best_v)
        attrs = jnp.where(better[None, :], att_c, attrs)
        best_t = jnp.where(better, tmin_c, best_t)
        return (best_t, best_u, best_v, attrs)

    init = (
        jnp.full((rt,), INF),
        jnp.zeros((rt,)),
        jnp.zeros((rt,)),
        jnp.zeros((A.WIDTH, rt)),
    )
    if n_chunks <= _UNROLL_CHUNKS:
        carry = init
        for c in range(n_chunks):
            carry = chunk(c, carry)
        return carry
    return jax.lax.fori_loop(0, n_chunks, chunk, init)


def _occluded_soa(woop_ref, o, seg: V3, rt, tp, tc, t_min=1e-3, t_max=1.0 - 1e-3):
    """Segment occlusion: any hit with t in (t_min, t_max) along ``seg``.

    The running mask is carried as f32 (Mosaic cannot legalize scf.for
    with i1 vector carries).
    """
    n_chunks = tp // tc

    def chunk(c, occ_f):
        w = woop_ref[:, :, pl.ds(c * tc, tc)]
        t, _, _ = _tri_hits_soa(w, o, seg, t_min, t_max, tc)
        return jnp.maximum(occ_f, (jnp.min(t, axis=0) < INF).astype(jnp.float32))

    init = jnp.zeros((rt,))
    if n_chunks <= _UNROLL_CHUNKS:
        occ = init
        for c in range(n_chunks):
            occ = chunk(c, occ)
        return occ > 0.5
    return jax.lax.fori_loop(0, n_chunks, chunk, init) > 0.5


def _rng5(i, rt, bounce, seed, salt):
    """Five uniforms per lane from ONE pcg4d call.

    Integer hashing is the megakernel's hottest block by far (measured
    round 3: the former two-call _rng8 cost ~6.2 ms/bounce at 512^2 --
    two-thirds of the whole bounce kernel; u32 multiplies emulate slowly
    on the VPU). One pcg4d yields 128 well-mixed bits: the four outputs'
    top-24 bits drive the light pick + the three BSDF-sample uniforms, and
    the Russian-roulette uniform is assembled from their low bytes (pcg4d's
    final xorshift folds high entropy into the low bits, so the slices are
    independent). Same (pixel, bounce, frame) counter structure as the
    reference's per-pixel PCG streams (Sampling.hlsli:12-74).
    """
    pix = jax.lax.broadcasted_iota(jnp.uint32, (rt, 1), 0)[:, 0] + (
        i * rt
    ).astype(jnp.uint32)
    b = jnp.full((rt,), bounce, jnp.uint32)
    s = jnp.full((rt,), seed, jnp.uint32)
    r = S.pcg4d_soa(pix, b, s, jnp.full((rt,), salt, jnp.uint32))
    u_light, u_s1, u_s2, u_s3 = (S.to_unit_float(x) for x in r)
    lo = (
        (r[0] & jnp.uint32(0xFF))
        | ((r[1] & jnp.uint32(0xFF)) << 8)
        | ((r[2] & jnp.uint32(0xFF)) << 16)
    )
    u_rr = lo.astype(jnp.int32).astype(jnp.float32) * (1.0 / 16777216.0)
    return u_light, u_s1, u_s2, u_s3, u_rr


def _rng5_f32(i, rt, bounce, seed, salt):
    """Float-ALU hash variant (S.hashf4_soa): no integer multiplies.
    Select with ZETARAY_MK_PRNG=f32; same counter structure as _rng5."""
    pix = (
        jax.lax.broadcasted_iota(jnp.int32, (rt, 1), 0)[:, 0] + i * rt
    ).astype(jnp.float32)
    b = jnp.full((rt,), bounce, jnp.int32).astype(jnp.float32)
    sd = jnp.full((rt,), (seed & jnp.uint32(0xFFFF)).astype(jnp.int32), jnp.int32)
    u1, u5, u6, u7 = S.hashf4_soa(
        pix * (1.0 / 97.0), b * 7.13 + 0.7, sd.astype(jnp.float32) * 0.1237,
        pix * (1.0 / 8192.0) + b * 0.317,
    )
    # fifth stream: one more round keyed off the first four
    u8, _, _, _ = S.hashf4_soa(u1 * 251.0, u5 * 241.0, u6 * 239.0, u7 * 233.0)
    return u1, u5, u6, u7, u8


def _rng5_hw(i, rt, bounce, seed, salt):
    """Hardware-PRNG variant (pltpu.prng_random_bits): the TPU's native
    generator replaces the emulated-u32-multiply hash entirely. Seeded per
    (frame seed, bounce, global tile) so streams stay sharding-invariant
    and frame-decorrelated; A/B against _rng5 via ZETARAY_MK_PRNG=hw."""
    # prng_seed accepts at most 2 values: fold (bounce, tile, salt) into one
    mix = (
        jnp.uint32(bounce) * jnp.uint32(0x9E3779B9)
        ^ (i + 1).astype(jnp.uint32) * jnp.uint32(salt)
    )
    pltpu.prng_seed(seed, mix)
    bits = pltpu.prng_random_bits((5, rt))
    u = (
        (pltpu.bitcast(bits, jnp.uint32) >> 8).astype(jnp.int32)
        .astype(jnp.float32) * (1.0 / 16777216.0)
    )
    return u[0], u[1], u[2], u[3], u[4]


def bounce_uniforms(n, bounce, seed, salt=0x9E37, pix0=0, wops=False):
    """[5, N] per-ray uniforms for one bounce, computed in XLA
    (8 rows when ``wops``: +alias test, +2 barycentrics).

    Bit-identical to the in-kernel _rng5 slicing (same pcg4d counters), but
    hashed OUTSIDE the Pallas kernel: XLA lowers u32 multiplies well while
    Mosaic's emulation made the in-kernel hash the single hottest block of
    the whole frame (measured round 3: ~6 ms/bounce at 512^2). The rows
    ride into the bounce kernel as one [5, rt] VMEM block per tile
    (~5 MB/bounce of extra input bandwidth -- noise)."""
    pix = jnp.arange(n, dtype=jnp.uint32) + jnp.asarray(pix0).astype(jnp.uint32)
    b = jnp.full((n,), bounce, jnp.uint32)
    sd = jnp.full((n,), seed, jnp.uint32)
    r = S.pcg4d_soa(pix, b, sd, jnp.full((n,), salt, jnp.uint32))
    u14 = [S.to_unit_float(x) for x in r]
    lo = (
        (r[0] & jnp.uint32(0xFF))
        | ((r[1] & jnp.uint32(0xFF)) << 8)
        | ((r[2] & jnp.uint32(0xFF)) << 16)
    )
    u_rr = lo.astype(jnp.int32).astype(jnp.float32) * (1.0 / 16777216.0)
    rows = [u14[0], u14[1], u14[2], u14[3], u_rr]
    if wops:
        r2 = S.pcg4d_soa(pix, b, sd, jnp.full((n,), 0x905A, jnp.uint32))
        rows += [S.to_unit_float(x) for x in r2[:3]]
    return jnp.stack(rows, 0)


def _ablate():
    """Dev-only kernel bisection: ZETARAY_MK_SKIP=comma,separated,blocks
    with blocks in {rng, sample, recon, occl, emit}. Perf diagnosis only --
    never set in production paths."""
    import os

    return frozenset(
        s for s in os.environ.get("ZETARAY_MK_SKIP", "").split(",") if s
    )


def _nee_sample_wops(em_ref, u_pick, u_alias, u_b0, u_b1, rt, n_em):
    """Per-lane power-alias emissive sample inside the kernel (the
    reference's *_WoPS kernel variants: NEE WithOut Presampled Sets).
    ``em_ref``: [1, EA.WIDTH + 2, Ep] = em_attrs rows + alias prob/alias
    (see wops_table). Returns (lp, lng, lle, lpdf_area, l2s)."""
    from ..scene.scene import EA

    em = em_ref[0]
    e = n_em
    iota = jax.lax.broadcasted_iota(jnp.int32, (e, rt), 0)
    k0 = jnp.minimum((u_pick * e).astype(jnp.int32), e - 1)
    oh0 = (iota == k0[None, :]).astype(jnp.float32)
    row0 = jax.lax.dot_general(
        em[:, :e], oh0, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    # alias resolve (core.sampling.sample_alias, in-kernel)
    k = jnp.where(
        u_alias >= row0[EA.WIDTH],
        row0[EA.WIDTH + 1].astype(jnp.int32),
        k0,
    )
    oh = (iota == k[None, :]).astype(jnp.float32)
    row = jax.lax.dot_general(
        em[:, :e], oh, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    # low-distortion square -> triangle (core.sampling.square_to_triangle)
    flip = u_b1 > u_b0
    b1 = jnp.where(flip, u_b0 * 0.5, u_b0 - u_b1 * 0.5)
    b2 = jnp.where(flip, u_b1 - u_b0 * 0.5, u_b1 * 0.5)
    v0 = v3.from_rows(row, EA.V0)
    e1 = v3.from_rows(row, EA.E1)
    e2 = v3.from_rows(row, EA.E2)
    lp = v0 + e1 * b1 + e2 * b2
    return (
        lp,
        v3.from_rows(row, EA.NG),
        v3.from_rows(row, EA.LE),
        row[EA.PDF_AREA],
        row[EA.TWO_SIDED] > 0.5,
    )


def wops_table(scene):
    """[1, EA.WIDTH + 2, Ep] emissive table for in-kernel WoPS NEE:
    em_attrs columns + the alias-table prob/alias rows."""
    return jnp.concatenate(
        [
            scene.em_attrs.T,
            scene.em_prob[None, :],
            scene.em_alias.astype(jnp.float32)[None, :],
        ],
        0,
    )[None]


def _bounce_kernel(
    scal_ref, state_ref, woop_ref, attrsT_ref, lset_ref, u_ref, out_ref,
    *, rt, tp, tc, cfg, last, has_lights, has_transmission, has_coat,
    n_em=0, skip=frozenset(),
):
    i = pl.program_id(0)
    bounce = scal_ref[0, 0]
    seed = scal_ref[1, 0].astype(jnp.uint32)
    # global tile index: pix0/rt + i, so RNG streams and light-set choices
    # are identical whether the wavefront is whole or a per-device shard
    i = scal_ref[2, 0] + i

    st = state_ref[:]
    o = V3(st[0], st[1], st[2])
    d = V3(st[3], st[4], st[5])
    thr = V3(st[6], st[7], st[8])
    rad = V3(st[9], st[10], st[11])
    prev_pdf = st[12]
    alive = st[13] > 0.5
    spec = st[14] > 0.5

    t_hit, bu, bv, at = _closest_soa(
        woop_ref, attrsT_ref, o, d, cfg.t_min, rt, tp, tc
    )
    hit = t_hit < INF
    found = hit & alive

    # -- environment (sun + sky) on miss rays
    if cfg.sky is not None:
        from ..ops import sky as SK

        miss = alive & ~hit
        env = SK.sky_radiance(d, cfg.sky, with_disk=False)
        if cfg.sun_nee:
            # sun disk only on primary/specular rays (NEE owns the rest)
            disk_gain = jnp.where(spec, 1.0, 0.0)
        else:
            disk_gain = jnp.ones((rt,))
        sun = np.asarray(cfg.sky.sun_dir, np.float64)
        sun = sun / np.linalg.norm(sun)
        c_sun = d.x * float(sun[0]) + d.y * float(sun[1]) + d.z * float(sun[2])
        cos_r = float(np.cos(cfg.sky.sun_angular_radius))
        edge = jnp.clip((c_sun - cos_r) / max(1e-6, 1.0 - cos_r) * 4.0, 0.0, 1.0)
        disk = edge * (cfg.sky.sun_intensity * SK.SUN_RADIANCE_SCALE) * disk_gain
        gain_env = jnp.where(miss, 1.0, 0.0)
        rad = rad + thr * V3(
            (env.x + disk * SK.SUN_COLOR[0]) * gain_env,
            (env.y + disk * SK.SUN_COLOR[1]) * gain_env,
            (env.z + disk * SK.SUN_COLOR[2]) * gain_env,
        )

    ng_raw = v3.from_rows(at, A.NG)
    wo_dot_ng = -v3.dot(d, ng_raw)

    # -- emitted radiance with MIS
    if has_lights and "emit" not in skip:
        two_sided = at[A.DOUBLE] > 0.5
        vis_side = two_sided | (wo_dot_ng > 0.0)
        le = v3.from_rows(at, A.EMISS)
        pdf_l_sa = at[A.EM_PDF_AREA] * t_hit * t_hit / jnp.maximum(
            jnp.abs(wo_dot_ng), 1e-8
        )
        if cfg.nee:
            mis = jnp.where(spec, 1.0, S.power_heuristic(prev_pdf, pdf_l_sa))
        else:
            mis = jnp.ones((rt,))
        gain = jnp.where(found & vis_side, mis, 0.0)
        if cfg.min_emissive_bounce > 0:
            # masked components are produced by a ReSTIR pass instead
            gain = jnp.where(bounce >= cfg.min_emissive_bounce, gain, 0.0)
        rad = rad + thr * le * gain

    alive = found

    if not last:
        # -- surface reconstruction (SoA)
        w0 = 1.0 - bu - bv
        if "recon" in skip:
            ns = ng_raw
        else:
            ns = v3.normalize(
                v3.from_rows(at, A.N0) * w0
                + v3.from_rows(at, A.N1) * bu
                + v3.from_rows(at, A.N2) * bv
            )
        front = wo_dot_ng > 0.0
        sgn = jnp.where(front, 1.0, -1.0)
        ng = ng_raw * sgn
        ns = ns * sgn
        ns = v3.where(v3.dot(ns, ng) < 0.0, -ns, ns)
        pos = o + d * t_hit
        ior = jnp.maximum(at[A.IOR], 1.01)
        rough = at[A.ROUGH]
        if cfg.path_regularization:
            # BSDF.hlsli ShadingData::Regularize at secondary vertices
            alpha = rough * rough
            alpha_r = jnp.where(
                alpha < 0.25, jnp.clip(2.0 * alpha, 0.1, 0.25), alpha
            )
            reg_gate = (bounce >= 1).astype(jnp.float32)
            rough = reg_gate * jnp.sqrt(alpha_r) + (1.0 - reg_gate) * rough
        mat = S.MatSoA(
            base=v3.from_rows(at, A.BASE),
            metallic=at[A.METAL],
            roughness=rough,
            ior=ior,
            # None compiles the transmission/coat lobes out
            transmission=at[A.TRANS] if has_transmission else None,
            eta=jnp.where(front, 1.0 / ior, ior) if has_transmission else None,
            coat=at[A.COATW] if has_coat else None,
            coat_roughness=at[A.COATR] if has_coat else None,
        )
        frame = S.make_frame(ns)
        wo_l = frame.to_local(-d)

        if "rng" in skip:
            half = jnp.full((rt,), 0.5)
            u1 = u5 = u6 = u7 = u8 = half
        else:
            # precomputed in XLA (bounce_uniforms); hashing in-kernel was
            # the hottest block of the whole frame
            u = u_ref[:]
            u1, u5, u6, u7, u8 = u[0], u[1], u[2], u[3], u[4]

        # -- NEE: presampled set (WPS) or per-lane alias sample (WoPS)
        if cfg.nee and has_lights:
            if cfg.nee_mode == "wops":
                u = u_ref[:]
                lp, lng, lle, lpdf_area, l2s = _nee_sample_wops(
                    lset_ref, u1, u[5], u[6], u[7], rt, n_em
                )
            else:
                n_sets, _, ps = lset_ref.shape
                set_idx = jax.lax.rem(i + bounce * 13, n_sets)
                lset = lset_ref[set_idx]  # [LSET_ROWS, ps]
                p = jnp.minimum((u1 * ps).astype(jnp.int32), ps - 1)
                onehot = (
                    jax.lax.broadcasted_iota(jnp.int32, (ps, rt), 0)
                    == p[None, :]
                ).astype(jnp.float32)
                srow = jax.lax.dot_general(
                    lset, onehot, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # [LSET_ROWS, rt]
                lp = v3.from_rows(srow, 0)
                lng = v3.from_rows(srow, 3)
                lle = v3.from_rows(srow, 6)
                lpdf_area = srow[9]
                l2s = srow[10] > 0.5
            to_l = lp - pos
            dist2 = jnp.maximum(v3.dot(to_l, to_l), 1e-12)
            inv_d = jax.lax.rsqrt(dist2)
            wi_w = to_l * inv_d
            cos_surf = v3.dot(wi_w, ns)
            cos_l_raw = -v3.dot(wi_w, lng)
            cos_l = jnp.where(l2s, jnp.abs(cos_l_raw), cos_l_raw)
            wi_l = frame.to_local(wi_w)
            f, pdf_b = S.bsdf_eval(mat, wo_l, wi_l)
            pdf_l_sa2 = lpdf_area * dist2 / jnp.maximum(cos_l, 1e-8)
            candidate = alive & (cos_surf > 1e-6) & (cos_l > 1e-6) & (lpdf_area > 0.0)
            if cfg.min_nee_bounce > 0:
                candidate = candidate & (bounce >= cfg.min_nee_bounce)
            shadow_o = pos + ng * _EPS_RAY
            if "occl" in skip:
                occ = jnp.zeros((rt,), jnp.float32) > 0.5
            else:
                occ = _occluded_soa(woop_ref, shadow_o, to_l, rt, tp, tc)
            vis = candidate & ~occ
            mis2 = S.power_heuristic(pdf_l_sa2, pdf_b)
            scale = cos_surf * mis2 / jnp.maximum(pdf_l_sa2, 1e-12)
            contrib = thr * f * lle * scale
            if cfg.firefly_clamp > 0.0:
                contrib = V3(
                    jnp.minimum(contrib.x, cfg.firefly_clamp),
                    jnp.minimum(contrib.y, cfg.firefly_clamp),
                    jnp.minimum(contrib.z, cfg.firefly_clamp),
                )
            zero = jnp.zeros((rt,))
            rad = rad + v3.where(vis, contrib, V3(zero, zero, zero))

        # -- sun NEE (delta light: one shadow ray toward the sun; SkyDI-lite)
        if cfg.sky is not None and cfg.sun_nee:
            from ..ops import sky as SK

            sun = np.asarray(cfg.sky.sun_dir, np.float64)
            sun = sun / np.linalg.norm(sun)
            sdir = V3(
                jnp.full((rt,), float(sun[0])),
                jnp.full((rt,), float(sun[1])),
                jnp.full((rt,), float(sun[2])),
            )
            cos_s = v3.dot(sdir, ns)
            f_s, _ = S.bsdf_eval(mat, wo_l, frame.to_local(sdir))
            occ_s = _occluded_soa(
                woop_ref, pos + ng * _EPS_RAY, sdir, rt, tp, tc,
                t_min=1e-3, t_max=1e8,
            )
            e_sun = SK.sun_irradiance(cfg.sky)
            sun_ok = alive & (cos_s > 1e-6) & ~occ_s
            gain_s = jnp.where(sun_ok, cos_s, 0.0)
            rad = rad + thr * V3(
                f_s.x * float(e_sun[0]) * gain_s,
                f_s.y * float(e_sun[1]) * gain_s,
                f_s.z * float(e_sun[2]) * gain_s,
            )

        # -- BSDF sample
        if "sample" in skip:
            wi_l = wo_l
            wgt = V3(jnp.full((rt,), 0.8), jnp.full((rt,), 0.8), jnp.full((rt,), 0.8))
            pdf = jnp.full((rt,), 1.0)
        else:
            wi_l, wgt, pdf = S.bsdf_sample(mat, wo_l, u5, u6, u7)
        wi_w2 = frame.to_world(wi_l)
        # reflected rays leave above the geometric surface, transmitted below
        # (and/or logic: Mosaic cannot select between i1 vectors)
        transmitted = wi_l.z < 0.0
        side = v3.dot(wi_w2, ng)
        geo_ok = (transmitted & (side < -1e-6)) | (~transmitted & (side > 1e-6))
        alive = alive & (pdf > 0.0) & geo_ok
        thr = thr * wgt
        prev_pdf = pdf
        spec_out = jnp.zeros((rt,))

        # -- Russian roulette (runtime bounce index)
        do_rr = bounce >= cfg.rr_start  # scalar
        q = jnp.clip(v3.max_component(thr), 0.05, 0.95)
        survive = u8 < q
        # Mosaic cannot select() between i1 vectors -- use pure and/or logic.
        alive = alive & (survive | jnp.logical_not(do_rr))
        rr_scale = jnp.where(do_rr, 1.0 / q, jnp.ones_like(q))
        thr = thr * rr_scale

        offs = jnp.where(transmitted, -_EPS_RAY, _EPS_RAY)
        o = pos + ng * offs
        d = wi_w2
    else:
        spec_out = st[14]

    out_ref[0, :] = o.x
    out_ref[1, :] = o.y
    out_ref[2, :] = o.z
    out_ref[3, :] = d.x
    out_ref[4, :] = d.y
    out_ref[5, :] = d.z
    out_ref[6, :] = thr.x
    out_ref[7, :] = thr.y
    out_ref[8, :] = thr.z
    out_ref[9, :] = rad.x
    out_ref[10, :] = rad.y
    out_ref[11, :] = rad.z
    out_ref[12, :] = prev_pdf
    out_ref[13, :] = alive.astype(jnp.float32)
    out_ref[14, :] = spec_out
    out_ref[15, :] = st[15]


# --------------------------------------------------------------------------
# G-buffer kernel (GBufferRT equivalent): primary hits -> SoA planes
# --------------------------------------------------------------------------

# G-buffer SoA rows (the 10-plane G-buffer of the reference, GBuffer.cpp,
# in SoA form; packing to the reference's exact formats happens at export).
class G:
    POS = 0  # 3
    NS = 3  # 3 shading normal (flipped toward viewer)
    NG = 6  # 3 geometric normal (flipped)
    BASE = 9  # 3
    METAL = 12
    ROUGH = 13
    IOR = 14
    VALID = 15
    DEPTH = 16
    WO = 17  # 3 unit direction toward the camera
    EMISS = 20  # 3 emitted radiance toward camera (visible side resolved)
    EM_PDF_AREA = 23
    UV = 24  # 2 interpolated texture coords
    TEXID = 26  # base-color texture id as float (-1 = none)
    TRANS = 27  # transmission weight [0,1]
    ETA = 28  # relative IOR along the primary ray (front: 1/ior, back: ior)
    COATW = 29  # coat weight
    COATR = 30  # coat roughness
    MATID = 31  # material index as float (texture-slot lookup)
    TANG = 32  # 3: world tangent (normal mapping)
    UVDENS = 35  # sqrt(uv area / world area) (ray-cone mips)
    INST = 36  # instance index as float (-1 = miss): geometry motion vectors
    ROWS = 40


def _gbuffer_kernel(rays_ref, woop_ref, attrsT_ref, out_ref, *, rt, tp, tc, t_min):
    r = rays_ref[:]
    o = V3(r[0], r[1], r[2])
    d = V3(r[3], r[4], r[5])
    t_hit, bu, bv, at = _closest_soa(woop_ref, attrsT_ref, o, d, t_min, rt, tp, tc)
    hit = t_hit < INF
    ng_raw = v3.from_rows(at, A.NG)
    wo_dot_ng = -v3.dot(d, ng_raw)
    front = wo_dot_ng > 0.0
    sgn = jnp.where(front, 1.0, -1.0)
    ng = ng_raw * sgn
    w0 = 1.0 - bu - bv
    ns = v3.normalize(
        v3.from_rows(at, A.N0) * w0
        + v3.from_rows(at, A.N1) * bu
        + v3.from_rows(at, A.N2) * bv
    ) * sgn
    ns = v3.where(v3.dot(ns, ng) < 0.0, -ns, ns)
    pos = o + d * t_hit
    two_sided = at[A.DOUBLE] > 0.5
    vis_side = two_sided | front
    le_gain = jnp.where(hit & vis_side, 1.0, 0.0)
    hf = hit.astype(jnp.float32)
    out_ref[G.POS, :] = pos.x
    out_ref[G.POS + 1, :] = pos.y
    out_ref[G.POS + 2, :] = pos.z
    out_ref[G.NS, :] = ns.x
    out_ref[G.NS + 1, :] = ns.y
    out_ref[G.NS + 2, :] = ns.z
    out_ref[G.NG, :] = ng.x
    out_ref[G.NG + 1, :] = ng.y
    out_ref[G.NG + 2, :] = ng.z
    out_ref[G.BASE, :] = at[A.BASE]
    out_ref[G.BASE + 1, :] = at[A.BASE + 1]
    out_ref[G.BASE + 2, :] = at[A.BASE + 2]
    out_ref[G.METAL, :] = at[A.METAL]
    out_ref[G.ROUGH, :] = at[A.ROUGH]
    out_ref[G.IOR, :] = jnp.maximum(at[A.IOR], 1.01)
    out_ref[G.VALID, :] = hf
    out_ref[G.DEPTH, :] = jnp.where(hit, t_hit, 0.0)
    out_ref[G.WO, :] = -d.x
    out_ref[G.WO + 1, :] = -d.y
    out_ref[G.WO + 2, :] = -d.z
    out_ref[G.EMISS, :] = at[A.EMISS] * le_gain
    out_ref[G.EMISS + 1, :] = at[A.EMISS + 1] * le_gain
    out_ref[G.EMISS + 2, :] = at[A.EMISS + 2] * le_gain
    out_ref[G.EM_PDF_AREA, :] = at[A.EM_PDF_AREA]
    w0b = 1.0 - bu - bv
    out_ref[G.UV, :] = (
        w0b * at[A.UV0] + bu * at[A.UV1] + bv * at[A.UV2]
    )
    out_ref[G.UV + 1, :] = (
        w0b * at[A.UV0 + 1] + bu * at[A.UV1 + 1] + bv * at[A.UV2 + 1]
    )
    out_ref[G.TEXID, :] = jnp.where(hit, at[A.TEXID], -1.0)
    ior = jnp.maximum(at[A.IOR], 1.01)
    out_ref[G.TRANS, :] = at[A.TRANS]
    out_ref[G.ETA, :] = jnp.where(front, 1.0 / ior, ior)
    out_ref[G.COATW, :] = at[A.COATW]
    out_ref[G.COATR, :] = at[A.COATR]
    out_ref[G.MATID, :] = jnp.where(hit, at[A.MATID], -1.0)
    out_ref[G.TANG, :] = at[A.TANG]
    out_ref[G.TANG + 1, :] = at[A.TANG + 1]
    out_ref[G.TANG + 2, :] = at[A.TANG + 2]
    out_ref[G.UVDENS, :] = at[A.UVDENS]
    out_ref[G.INST, :] = jnp.where(hit, at[A.INSTID], -1.0)
    for r in range(G.INST + 1, G.ROWS):
        out_ref[r, :] = jnp.zeros((rt,))


def gbuffer_xla(scene, o, d, t_min=1e-4):
    """G-buffer via the backend-dispatched intersection path (jnp assembly).

    Used for clustered scenes where the dense kernel's whole-table VMEM
    residency is impossible -- intersect_closest_shaded streams BVH clusters
    (accel.stream). Row-for-row identical semantics to _gbuffer_kernel.
    """
    from .intersect import intersect_closest_shaded

    n = o.shape[0]
    sh = intersect_closest_shaded(scene, o, d, t_min=t_min)
    at = sh.attrs.T  # [A.WIDTH, n]
    ov = V3(o[:, 0], o[:, 1], o[:, 2])
    dv = V3(d[:, 0], d[:, 1], d[:, 2])
    hit = sh.valid
    bu, bv = sh.u, sh.v
    ng_raw = v3.from_rows(at, A.NG)
    wo_dot_ng = -v3.dot(dv, ng_raw)
    front = wo_dot_ng > 0.0
    sgn = jnp.where(front, 1.0, -1.0)
    ng = ng_raw * sgn
    w0 = 1.0 - bu - bv
    ns = v3.normalize(
        v3.from_rows(at, A.N0) * w0
        + v3.from_rows(at, A.N1) * bu
        + v3.from_rows(at, A.N2) * bv
    ) * sgn
    ns = v3.where(v3.dot(ns, ng) < 0.0, -ns, ns)
    pos = ov + dv * sh.t
    two_sided = at[A.DOUBLE] > 0.5
    le_gain = jnp.where(hit & (two_sided | front), 1.0, 0.0)
    ior = jnp.maximum(at[A.IOR], 1.01)
    from ..core.rows import stack_rows

    return stack_rows(G.ROWS, {
        G.POS: pos.x, G.POS + 1: pos.y, G.POS + 2: pos.z,
        G.NS: ns.x, G.NS + 1: ns.y, G.NS + 2: ns.z,
        G.NG: ng.x, G.NG + 1: ng.y, G.NG + 2: ng.z,
        G.BASE: at[A.BASE], G.BASE + 1: at[A.BASE + 1],
        G.BASE + 2: at[A.BASE + 2],
        G.METAL: at[A.METAL], G.ROUGH: at[A.ROUGH],
        G.IOR: ior,
        G.VALID: hit.astype(jnp.float32),
        G.DEPTH: jnp.where(hit, sh.t, 0.0),
        G.WO: -dv.x, G.WO + 1: -dv.y, G.WO + 2: -dv.z,
        G.EMISS: at[A.EMISS] * le_gain,
        G.EMISS + 1: at[A.EMISS + 1] * le_gain,
        G.EMISS + 2: at[A.EMISS + 2] * le_gain,
        G.EM_PDF_AREA: at[A.EM_PDF_AREA],
        G.UV: w0 * at[A.UV0] + bu * at[A.UV1] + bv * at[A.UV2],
        G.UV + 1: w0 * at[A.UV0 + 1] + bu * at[A.UV1 + 1] + bv * at[A.UV2 + 1],
        G.TEXID: jnp.where(hit, at[A.TEXID], -1.0),
        G.TRANS: at[A.TRANS],
        G.ETA: jnp.where(front, 1.0 / ior, ior),
        G.COATW: at[A.COATW],
        G.COATR: at[A.COATR],
        G.MATID: jnp.where(hit, at[A.MATID], -1.0),
        G.TANG: at[A.TANG], G.TANG + 1: at[A.TANG + 1],
        G.TANG + 2: at[A.TANG + 2],
        G.UVDENS: at[A.UVDENS],
        G.INST: jnp.where(hit, at[A.INSTID], -1.0),
    }, n=n)


def gbuffer(scene, o, d, t_min=1e-4, rt=1024, interpret=False):
    """Primary-hit G-buffer pass. Returns [G.ROWS, N] SoA planes."""
    if scene.cluster_aabb is not None or scene.has_cutout:
        return gbuffer_xla(scene, o, d, t_min=t_min)
    n = o.shape[0]
    n_pad = ((n + rt - 1) // rt) * rt
    rays = jnp.zeros((6, n_pad))
    rays = rays.at[0:3, :n].set(o.T)
    rays = rays.at[3:6, :n].set(d.T)
    woop3 = scene.woop.reshape(4, 3, -1)
    attrsT = scene.tri_attrs.T
    tp = woop3.shape[2]
    tc = min(128, tp)
    kernel = functools.partial(
        _gbuffer_kernel, rt=rt, tp=tp, tc=tc, t_min=t_min
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // rt,),
        in_specs=[
            pl.BlockSpec((6, rt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G.ROWS, rt), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G.ROWS, n_pad), jnp.float32),
        interpret=interpret,
    )(rays, woop3, attrsT)
    return out[:, :n]


# --------------------------------------------------------------------------
# Split bounce: trace kernel + shade kernel (two pallas_calls per bounce).
#
# A/B on the chip (512^2, 3 bounces, Cornell): fused 21.9 ms vs split
# ~24 ms -- the fused form wins, so the split stays OPT-IN
# (ZETARAY_MK_SPLIT=1) except when secondary-bounce texturing needs the
# between-kernel XLA texture fetch (trace_megakernel forces it then).
# --------------------------------------------------------------------------

SURF_ROWS = 24  # 0-2 pos | 3-5 ns | 6-8 ng | 9-11 base | 12 metal
# | 13 rough | 14 ior | 15 trans | 16 eta | 17 coatw | 18 coatr
# | 19-20 uv | 21 texid | 22 uvdens | 23 pad  (rows 19-22 feed the
# secondary-bounce texture fetch between the trace and shade kernels)


def _bounce_trace_kernel(
    scal_ref, state_ref, woop_ref, attrsT_ref, out_ref, surf_ref,
    *, rt, tp, tc, cfg, last, has_lights,
):
    """Closest hit + env/emissive accumulation + surface reconstruction."""
    bounce = scal_ref[0, 0]
    st = state_ref[:]
    o = V3(st[0], st[1], st[2])
    d = V3(st[3], st[4], st[5])
    thr = V3(st[6], st[7], st[8])
    rad = V3(st[9], st[10], st[11])
    prev_pdf = st[12]
    alive = st[13] > 0.5
    spec = st[14] > 0.5

    t_hit, bu, bv, at = _closest_soa(
        woop_ref, attrsT_ref, o, d, cfg.t_min, rt, tp, tc
    )
    hit = t_hit < INF
    found = hit & alive

    if cfg.sky is not None:
        from ..ops import sky as SK

        miss = alive & ~hit
        env = SK.sky_radiance(d, cfg.sky, with_disk=False)
        disk_gain = jnp.where(spec, 1.0, 0.0) if cfg.sun_nee else jnp.ones((rt,))
        sun = np.asarray(cfg.sky.sun_dir, np.float64)
        sun = sun / np.linalg.norm(sun)
        c_sun = d.x * float(sun[0]) + d.y * float(sun[1]) + d.z * float(sun[2])
        cos_r = float(np.cos(cfg.sky.sun_angular_radius))
        edge = jnp.clip((c_sun - cos_r) / max(1e-6, 1.0 - cos_r) * 4.0, 0.0, 1.0)
        disk = edge * (cfg.sky.sun_intensity * SK.SUN_RADIANCE_SCALE) * disk_gain
        gain_env = jnp.where(miss, 1.0, 0.0)
        rad = rad + thr * V3(
            (env.x + disk * SK.SUN_COLOR[0]) * gain_env,
            (env.y + disk * SK.SUN_COLOR[1]) * gain_env,
            (env.z + disk * SK.SUN_COLOR[2]) * gain_env,
        )

    ng_raw = v3.from_rows(at, A.NG)
    wo_dot_ng = -v3.dot(d, ng_raw)
    if has_lights:
        two_sided = at[A.DOUBLE] > 0.5
        vis_side = two_sided | (wo_dot_ng > 0.0)
        le = v3.from_rows(at, A.EMISS)
        pdf_l_sa = at[A.EM_PDF_AREA] * t_hit * t_hit / jnp.maximum(
            jnp.abs(wo_dot_ng), 1e-8
        )
        if cfg.nee:
            mis = jnp.where(spec, 1.0, S.power_heuristic(prev_pdf, pdf_l_sa))
        else:
            mis = jnp.ones((rt,))
        gain = jnp.where(found & vis_side, mis, 0.0)
        if cfg.min_emissive_bounce > 0:
            gain = jnp.where(bounce >= cfg.min_emissive_bounce, gain, 0.0)
        rad = rad + thr * le * gain

    alive = found
    # surface reconstruction for the shade kernel
    w0 = 1.0 - bu - bv
    ns = v3.normalize(
        v3.from_rows(at, A.N0) * w0
        + v3.from_rows(at, A.N1) * bu
        + v3.from_rows(at, A.N2) * bv
    )
    front = wo_dot_ng > 0.0
    sgn = jnp.where(front, 1.0, -1.0)
    ng = ng_raw * sgn
    ns = ns * sgn
    ns = v3.where(v3.dot(ns, ng) < 0.0, -ns, ns)
    pos = o + d * t_hit
    ior = jnp.maximum(at[A.IOR], 1.01)

    for r_i, v in enumerate(st):
        out_ref[r_i, :] = v
    out_ref[9, :] = rad.x
    out_ref[10, :] = rad.y
    out_ref[11, :] = rad.z
    out_ref[13, :] = alive.astype(jnp.float32)
    surf_ref[0, :] = pos.x
    surf_ref[1, :] = pos.y
    surf_ref[2, :] = pos.z
    surf_ref[3, :] = ns.x
    surf_ref[4, :] = ns.y
    surf_ref[5, :] = ns.z
    surf_ref[6, :] = ng.x
    surf_ref[7, :] = ng.y
    surf_ref[8, :] = ng.z
    surf_ref[9, :] = at[A.BASE]
    surf_ref[10, :] = at[A.BASE + 1]
    surf_ref[11, :] = at[A.BASE + 2]
    surf_ref[12, :] = at[A.METAL]
    surf_ref[13, :] = at[A.ROUGH]
    surf_ref[14, :] = ior
    surf_ref[15, :] = at[A.TRANS]
    surf_ref[16, :] = jnp.where(front, 1.0 / ior, ior)
    surf_ref[17, :] = at[A.COATW]
    surf_ref[18, :] = at[A.COATR]
    surf_ref[19, :] = w0 * at[A.UV0] + bu * at[A.UV1] + bv * at[A.UV2]
    surf_ref[20, :] = (
        w0 * at[A.UV0 + 1] + bu * at[A.UV1 + 1] + bv * at[A.UV2 + 1]
    )
    surf_ref[21, :] = jnp.where(hit, at[A.TEXID], -1.0)
    surf_ref[22, :] = at[A.UVDENS]
    surf_ref[23, :] = jnp.zeros((rt,))
    # accumulated ray-cone width rides state row 15 (RT.hlsli cone updates;
    # scal row 3 carries the per-segment spread angle)
    spread = scal_ref[3, 0] * 1e-6
    out_ref[15, :] = st[15] + jnp.where(
        alive, t_hit * spread.astype(jnp.float32), 0.0
    )


def _bounce_shade_kernel(
    scal_ref, state_ref, surf_ref, woop_ref, lset_ref, u_ref, out_ref,
    *, rt, tp, tc, cfg, has_lights, has_transmission, has_coat, n_em=0,
):
    """NEE + sun NEE + BSDF sample + Russian roulette for one bounce."""
    i = pl.program_id(0)
    bounce = scal_ref[0, 0]
    seed = scal_ref[1, 0].astype(jnp.uint32)
    i = scal_ref[2, 0] + i

    st = state_ref[:]
    sf = surf_ref[:]
    d = V3(st[3], st[4], st[5])
    thr = V3(st[6], st[7], st[8])
    rad = V3(st[9], st[10], st[11])
    alive = st[13] > 0.5
    pos = V3(sf[0], sf[1], sf[2])
    ns = V3(sf[3], sf[4], sf[5])
    ng = V3(sf[6], sf[7], sf[8])
    rough = sf[13]
    if cfg.path_regularization:
        alpha = rough * rough
        alpha_r = jnp.where(
            alpha < 0.25, jnp.clip(2.0 * alpha, 0.1, 0.25), alpha
        )
        reg_gate = (bounce >= 1).astype(jnp.float32)
        rough = reg_gate * jnp.sqrt(alpha_r) + (1.0 - reg_gate) * rough
    mat = S.MatSoA(
        base=V3(sf[9], sf[10], sf[11]),
        metallic=sf[12], roughness=rough, ior=sf[14],
        transmission=sf[15] if has_transmission else None,
        eta=sf[16] if has_transmission else None,
        coat=sf[17] if has_coat else None,
        coat_roughness=sf[18] if has_coat else None,
    )
    frame = S.make_frame(ns)
    wo_l = frame.to_local(-d)

    u = u_ref[:]
    u1, u5, u6, u7, u8 = u[0], u[1], u[2], u[3], u[4]

    if cfg.nee and has_lights:
        if cfg.nee_mode == "wops":
            lp, lng, lle, lpdf_area, l2s = _nee_sample_wops(
                lset_ref, u1, u[5], u[6], u[7], rt, n_em
            )
        else:
            n_sets, _, ps = lset_ref.shape
            set_idx = jax.lax.rem(i + bounce * 13, n_sets)
            lset = lset_ref[set_idx]
            p = jnp.minimum((u1 * ps).astype(jnp.int32), ps - 1)
            onehot = (
                jax.lax.broadcasted_iota(jnp.int32, (ps, rt), 0) == p[None, :]
            ).astype(jnp.float32)
            srow = jax.lax.dot_general(
                lset, onehot, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            lp = v3.from_rows(srow, 0)
            lng = v3.from_rows(srow, 3)
            lle = v3.from_rows(srow, 6)
            lpdf_area = srow[9]
            l2s = srow[10] > 0.5
        to_l = lp - pos
        dist2 = jnp.maximum(v3.dot(to_l, to_l), 1e-12)
        inv_d = jax.lax.rsqrt(dist2)
        wi_w = to_l * inv_d
        cos_surf = v3.dot(wi_w, ns)
        cos_l_raw = -v3.dot(wi_w, lng)
        cos_l = jnp.where(l2s, jnp.abs(cos_l_raw), cos_l_raw)
        wi_l = frame.to_local(wi_w)
        f, pdf_b = S.bsdf_eval(mat, wo_l, wi_l)
        pdf_l_sa2 = lpdf_area * dist2 / jnp.maximum(cos_l, 1e-8)
        candidate = alive & (cos_surf > 1e-6) & (cos_l > 1e-6) & (lpdf_area > 0.0)
        if cfg.min_nee_bounce > 0:
            candidate = candidate & (bounce >= cfg.min_nee_bounce)
        shadow_o = pos + ng * _EPS_RAY
        occ = _occluded_soa(woop_ref, shadow_o, to_l, rt, tp, tc)
        vis = candidate & ~occ
        mis2 = S.power_heuristic(pdf_l_sa2, pdf_b)
        scale = cos_surf * mis2 / jnp.maximum(pdf_l_sa2, 1e-12)
        contrib = thr * f * lle * scale
        if cfg.firefly_clamp > 0.0:
            contrib = V3(
                jnp.minimum(contrib.x, cfg.firefly_clamp),
                jnp.minimum(contrib.y, cfg.firefly_clamp),
                jnp.minimum(contrib.z, cfg.firefly_clamp),
            )
        zero = jnp.zeros((rt,))
        rad = rad + v3.where(vis, contrib, V3(zero, zero, zero))

    if cfg.sky is not None and cfg.sun_nee:
        from ..ops import sky as SK

        sun = np.asarray(cfg.sky.sun_dir, np.float64)
        sun = sun / np.linalg.norm(sun)
        sdir = V3(
            jnp.full((rt,), float(sun[0])),
            jnp.full((rt,), float(sun[1])),
            jnp.full((rt,), float(sun[2])),
        )
        cos_s = v3.dot(sdir, ns)
        f_s, _ = S.bsdf_eval(mat, wo_l, frame.to_local(sdir))
        occ_s = _occluded_soa(
            woop_ref, pos + ng * _EPS_RAY, sdir, rt, tp, tc,
            t_min=1e-3, t_max=1e8,
        )
        e_sun = SK.sun_irradiance(cfg.sky)
        sun_ok = alive & (cos_s > 1e-6) & ~occ_s
        gain_s = jnp.where(sun_ok, cos_s, 0.0)
        rad = rad + thr * V3(
            f_s.x * float(e_sun[0]) * gain_s,
            f_s.y * float(e_sun[1]) * gain_s,
            f_s.z * float(e_sun[2]) * gain_s,
        )

    wi_l, wgt, pdf = S.bsdf_sample(mat, wo_l, u5, u6, u7)
    wi_w2 = frame.to_world(wi_l)
    transmitted = wi_l.z < 0.0
    side = v3.dot(wi_w2, ng)
    geo_ok = (transmitted & (side < -1e-6)) | (~transmitted & (side > 1e-6))
    alive = alive & (pdf > 0.0) & geo_ok
    thr = thr * wgt
    do_rr = bounce >= cfg.rr_start
    q = jnp.clip(v3.max_component(thr), 0.05, 0.95)
    survive = u8 < q
    alive = alive & (survive | jnp.logical_not(do_rr))
    rr_scale = jnp.where(do_rr, 1.0 / q, jnp.ones_like(q))
    thr = thr * rr_scale
    offs = jnp.where(transmitted, -_EPS_RAY, _EPS_RAY)
    o = pos + ng * offs

    out_ref[0, :] = o.x
    out_ref[1, :] = o.y
    out_ref[2, :] = o.z
    out_ref[3, :] = wi_w2.x
    out_ref[4, :] = wi_w2.y
    out_ref[5, :] = wi_w2.z
    out_ref[6, :] = thr.x
    out_ref[7, :] = thr.y
    out_ref[8, :] = thr.z
    out_ref[9, :] = rad.x
    out_ref[10, :] = rad.y
    out_ref[11, :] = rad.z
    out_ref[12, :] = pdf
    out_ref[13, :] = alive.astype(jnp.float32)
    out_ref[14, :] = jnp.zeros((rt,))
    eta_scale = jnp.where(transmitted & (sf[16] > 0.0), sf[16], 1.0)
    out_ref[15, :] = st[15] * eta_scale


def bounce_step_split(
    state, woop3, attrsT, light_sets, bounce, seed, cfg, last, has_lights,
    has_transmission=False, has_coat=False, rt=1024, interpret=False, pix0=0,
    textures=None, spread_angle=0.0, n_em=0,
):
    """Two-kernel bounce (see the split-bounce note above).

    ``textures``/``spread_angle``: secondary-bounce base-color texturing
    (reference RT.hlsli fetches maps at every path vertex with ray-cone
    mips): the trace kernel emits uv/texid/uvdens + accumulated cone
    width, the fetch runs as XLA between the two kernels, and the shade
    kernel consumes the modulated base color."""
    n = state.shape[1]
    tp = woop3.shape[2]
    tc = min(128, tp)
    scal = jnp.stack(
        [
            jnp.full((), bounce, jnp.int32),
            jnp.asarray(seed).astype(jnp.int32).reshape(()),
            (jnp.asarray(pix0) // rt).astype(jnp.int32).reshape(()),
            (jnp.asarray(spread_angle, jnp.float32) * 1e6)
            .astype(jnp.int32).reshape(()),
        ]
    ).reshape(4, 1)
    tr = functools.partial(
        _bounce_trace_kernel, rt=rt, tp=tp, tc=tc, cfg=cfg, last=last,
        has_lights=has_lights,
    )
    state2, surf = pl.pallas_call(
        tr,
        grid=(n // rt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((STATE_ROWS, rt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((STATE_ROWS, rt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((SURF_ROWS, rt), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(state.shape, jnp.float32),
            jax.ShapeDtypeStruct((SURF_ROWS, n), jnp.float32),
        ),
        input_output_aliases={1: 0},
        interpret=interpret,
    )(scal, state, woop3, attrsT)
    if last:
        return state2
    if textures:
        from ..scene.textures import base_color_at

        factor = base_color_at(
            textures, surf[19:21].T, surf[21], state2[15], surf[22]
        )
        if factor is not None:
            surf = surf.at[9:12].set(surf[9:12] * factor)
    sh = functools.partial(
        _bounce_shade_kernel, rt=rt, tp=tp, tc=tc, cfg=cfg,
        has_lights=has_lights, has_transmission=has_transmission,
        has_coat=has_coat,
    )
    u = bounce_uniforms(n, bounce, seed, pix0=pix0)
    return pl.pallas_call(
        sh,
        grid=(n // rt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((STATE_ROWS, rt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((SURF_ROWS, rt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (u.shape[0], rt), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (STATE_ROWS, rt), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(state.shape, jnp.float32),
        input_output_aliases={1: 0},
        interpret=interpret,
    )(scal, state2, surf, woop3, light_sets, u)


def bounce_step(
    state, woop3, attrsT, light_sets, bounce, seed, cfg, last, has_lights,
    has_transmission=False, has_coat=False, rt=1024, interpret=False, pix0=0,
    n_em=0,
):
    """Run one bounce over the whole wavefront. state: [16, N] (donated)."""
    n = state.shape[1]
    tp = woop3.shape[2]
    tc = min(128, tp)
    scal = jnp.stack(
        [
            jnp.full((), bounce, jnp.int32),
            jnp.asarray(seed).astype(jnp.int32).reshape(()),
            (jnp.asarray(pix0) // rt).astype(jnp.int32).reshape(()),
        ]
    ).reshape(3, 1)
    kernel = functools.partial(
        _bounce_kernel, rt=rt, tp=tp, tc=tc, cfg=cfg, last=last,
        has_lights=has_lights, has_transmission=has_transmission,
        has_coat=has_coat, n_em=n_em, skip=_ablate(),
    )
    u = bounce_uniforms(
        n, bounce, seed, pix0=pix0, wops=(cfg.nee_mode == "wops")
    )
    return pl.pallas_call(
        kernel,
        grid=(n // rt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((STATE_ROWS, rt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (u.shape[0], rt), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (STATE_ROWS, rt), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(state.shape, jnp.float32),
        input_output_aliases={1: 0},
        interpret=interpret,
    )(scal, state, woop3, attrsT, light_sets, u)


def build_light_sets(scene, seed: jnp.ndarray, ns: int = NS, ps: int = PS):
    """Presampled emissive sets [ns, LSET_ROWS, ps] (PreLighting analog).

    Defaults are the VMEM-sized 64x128; the reference's scale is 128 sets
    x 512 samples (DefaultRendererImpl.h:37-38), available via
    PTConfig.light_ns/light_ps -- consumers derive sizes from the array
    shape, so any (ns, ps) compiles."""
    from ..ops.lights import sample_emissive
    from ..core.rng import uniform4

    n = ns * ps
    pix = jnp.arange(n, dtype=jnp.int32)
    u = uniform4(pix, 0, seed, salt=0xBEEF)
    ls = sample_emissive(scene, u)
    rows = jnp.zeros((LSET_ROWS, n))
    rows = rows.at[0:3].set(ls.pos.T)
    rows = rows.at[3:6].set(ls.ng.T)
    rows = rows.at[6:9].set(ls.le.T)
    rows = rows.at[9].set(ls.pdf_area)
    rows = rows.at[10].set(ls.two_sided.astype(jnp.float32))
    return rows.reshape(LSET_ROWS, ns, ps).transpose(1, 0, 2)


def trace_megakernel(scene, o, d, seed, cfg, rt=1024, interpret=False, pix0=0, rows_out=False, textures=None, spread_angle=0.0, smb_kill=None):
    """Full path trace via the bounce megakernel. Returns [N, 3] radiance.

    ``textures``: optional scene texture bundle -- base color is fetched at
    every path vertex with ray-cone mips (forces the split bounce).
    ``smb_kill``: optional [N] bool -- stochastic multi-bounce: these paths
    stop extending after the trace's first hit vertex (applied between
    bounce steps in XLA, so it works for fused and split alike)."""
    n = o.shape[0]
    n_pad = ((n + rt - 1) // rt) * rt
    has_lights = scene.num_emissives > 0

    def pad(x):
        return jnp.pad(x, ((0, n_pad - n), (0, 0))) if n_pad != n else x

    o_p, d_p = pad(o), pad(d)
    state = jnp.zeros((STATE_ROWS, n_pad))
    state = state.at[0:3].set(o_p.T)
    state = state.at[3:6].set(d_p.T)
    state = state.at[6:9].set(1.0)  # throughput
    state = state.at[13].set(1.0)  # alive
    state = state.at[14].set(1.0)  # specular (primary)

    woop3 = scene.woop.reshape(4, 3, -1)
    attrsT = scene.tri_attrs.T
    if has_lights and cfg.nee:
        if cfg.nee_mode == "wops":
            lsets = wops_table(scene)
        else:
            lsets = build_light_sets(scene, seed, cfg.light_ns, cfg.light_ps)
    else:
        lsets = jnp.zeros((cfg.light_ns, LSET_ROWS, cfg.light_ps))

    import os as _os

    # A/B measured (512^2, 3 bounces): fused 27.4 ms vs split 29.3 ms --
    # the two-kernel form stays OPT-IN (and is forced by texturing, which
    # needs the between-kernel XLA fetch)
    split = bool(textures) or _os.environ.get("ZETARAY_MK_SPLIT") == "1"
    for bounce in range(cfg.max_bounces + 1):
        if split:
            state = bounce_step_split(
                state, woop3, attrsT, lsets, bounce, seed, cfg,
                last=(bounce == cfg.max_bounces), has_lights=has_lights,
                has_transmission=scene.has_transmission,
                has_coat=scene.has_coat,
                rt=rt, interpret=interpret, pix0=pix0,
                textures=textures, spread_angle=spread_angle,
                n_em=scene.num_emissives,
            )
        else:
            state = bounce_step(
                state, woop3, attrsT, lsets, bounce, seed, cfg,
                last=(bounce == cfg.max_bounces), has_lights=has_lights,
                has_transmission=scene.has_transmission,
                has_coat=scene.has_coat,
                rt=rt, interpret=interpret, pix0=pix0,
                n_em=scene.num_emissives,
            )
        if smb_kill is not None and bounce == 0:
            keep = 1.0 - jnp.pad(
                smb_kill.astype(jnp.float32), (0, n_pad - n)
            )
            state = state.at[13].multiply(keep)
    if rows_out:  # radiance rows are the kernel-native layout
        return state[9:12, :n]
    return state[9:12, :n].T


def trace_with_first_hit(
    scene, o, d, seed, cfg, rt=1024, interpret=False, pix0=0,
    textures=None, spread_angle=0.0, smb_kill=None,
):
    """Path trace that ALSO returns the first-hit surface.

    restir_gi/pt generation needs the first suffix vertex's geometry AND
    the traced radiance; doing both with intersect_closest_shaded + a full
    trace repeats the first closest-hit sweep. Here bounce 0 runs as the
    SPLIT trace kernel (whose surface output is exactly the first hit) and
    the remaining bounces run fused. Returns (radiance_rows [3, N],
    surf [SURF_ROWS, N], alive_after_b0 [N] f32).
    """
    n = o.shape[0]
    n_pad = ((n + rt - 1) // rt) * rt
    has_lights = scene.num_emissives > 0

    def pad(x):
        return jnp.pad(x, ((0, n_pad - n), (0, 0))) if n_pad != n else x

    o_p, d_p = pad(o), pad(d)
    state = jnp.zeros((STATE_ROWS, n_pad))
    state = state.at[0:3].set(o_p.T)
    state = state.at[3:6].set(d_p.T)
    state = state.at[6:9].set(1.0)
    state = state.at[13].set(1.0)
    state = state.at[14].set(1.0)

    woop3 = scene.woop.reshape(4, 3, -1)
    attrsT = scene.tri_attrs.T
    if has_lights and cfg.nee:
        if cfg.nee_mode == "wops":
            lsets = wops_table(scene)
        else:
            lsets = build_light_sets(scene, seed, cfg.light_ns, cfg.light_ps)
    else:
        lsets = jnp.zeros((cfg.light_ns, LSET_ROWS, cfg.light_ps))

    # bounce 0 split: trace kernel emits the surface
    tp = woop3.shape[2]
    tc = min(128, tp)
    scal = jnp.stack(
        [
            jnp.full((), 0, jnp.int32),
            jnp.asarray(seed).astype(jnp.int32).reshape(()),
            (jnp.asarray(pix0) // rt).astype(jnp.int32).reshape(()),
            (jnp.asarray(spread_angle, jnp.float32) * 1e6)
            .astype(jnp.int32).reshape(()),
        ]
    ).reshape(4, 1)
    tr = functools.partial(
        _bounce_trace_kernel, rt=rt, tp=tp, tc=tc, cfg=cfg,
        last=(cfg.max_bounces == 0), has_lights=has_lights,
    )
    state, surf = pl.pallas_call(
        tr,
        grid=(n_pad // rt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((STATE_ROWS, rt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((STATE_ROWS, rt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((SURF_ROWS, rt), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(state.shape, jnp.float32),
            jax.ShapeDtypeStruct((SURF_ROWS, n_pad), jnp.float32),
        ),
        input_output_aliases={1: 0},
        interpret=interpret,
    )(scal, state, woop3, attrsT)
    alive0 = state[13]
    if cfg.max_bounces > 0:
        if textures:
            from ..scene.textures import base_color_at

            factor = base_color_at(
                textures, surf[19:21].T, surf[21], state[15], surf[22]
            )
            if factor is not None:
                surf = surf.at[9:12].set(surf[9:12] * factor)
        sh = functools.partial(
            _bounce_shade_kernel, rt=rt, tp=tp, tc=tc, cfg=cfg,
            has_lights=has_lights,
            has_transmission=scene.has_transmission,
            has_coat=scene.has_coat, n_em=scene.num_emissives,
        )
        u = bounce_uniforms(
            n_pad, 0, seed, pix0=pix0, wops=(cfg.nee_mode == "wops")
        )
        state = pl.pallas_call(
            sh,
            grid=(n_pad // rt,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((STATE_ROWS, rt), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((SURF_ROWS, rt), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(
                (u.shape[0], rt), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            ],
            out_specs=pl.BlockSpec(
                (STATE_ROWS, rt), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct(state.shape, jnp.float32),
            input_output_aliases={1: 0},
            interpret=interpret,
        )(scal, state, surf, woop3, lsets, u)
        if smb_kill is not None:
            keep = 1.0 - jnp.pad(
                smb_kill.astype(jnp.float32), (0, n_pad - n)
            )
            state = state.at[13].multiply(keep)
        for bounce in range(1, cfg.max_bounces + 1):
            state = bounce_step(
                state, woop3, attrsT, lsets, bounce, seed, cfg,
                last=(bounce == cfg.max_bounces), has_lights=has_lights,
                has_transmission=scene.has_transmission,
                has_coat=scene.has_coat,
                rt=rt, interpret=interpret, pix0=pix0,
                n_em=scene.num_emissives,
            )
    return state[9:12, :n], surf[:, :n], alive0[:n]
