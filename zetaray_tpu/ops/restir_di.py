"""ReSTIR DI: reservoir-based direct lighting from emissive triangles.

TPU-native rebuild of the reference's DirectLighting pass
(DirectLighting.h:20-144: ReSTIR_DI_Temporal/Spatial kernels +
Resampling.hlsli/Reservoir.hlsli): weighted reservoir sampling over many
light candidates, with temporal reuse (reprojected previous-frame
reservoirs, M clamped to M_MAX=20x like DirectLighting.h:95) and spatial
reuse over nearby pixels.

TPU mapping:
  - initial candidates (RIS over M0 presampled lights) run in a Pallas
    kernel over G-buffer SoA rows -- candidates come from the VMEM-resident
    presampled sets via one-hot matmuls (zero gathers);
  - temporal/spatial merges are image-space elementwise XLA with one
    row-gather per reuse (jnp.take over the flat pixel axis), the analog of
    the reference's reservoir texture fetches;
  - final shading traces ONE shadow ray per pixel (Pallas occlusion).

The estimator is the standard biased-but-practical combine (target p-hat
without visibility, M-clamping); the unbiased Z-counting variant is a
planned toggle.

Reservoir SoA rows (all [N]-wide f32):
  0-2 y_pos | 3-5 y_ng | 6-8 y_Le | 9 w_sum | 10 M | 11 W
  12 y_two_sided | 13 y_phat (target at this pixel) | 14-15 pad
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import vec3 as v3
from ..core.vec3 import V3
from ..core.rows import stack_rows
from ..accel.megakernel import G, LSET_ROWS, _occluded_soa
from . import shading_soa as S

R_ROWS = 16
_EPS_RAY = 1e-3


@dataclass(frozen=True)
class ReSTIRConfig:
    # Initial candidates are full-set RIS over the tile's PS=128
    # presampled entries (num_candidates is kept for config compatibility
    # but the kernel always rates the whole set -- strictly lower variance).
    num_candidates: int = 16
    temporal: bool = True
    m_max_factor: float = 20.0  # clamp temporal M to factor * M0
    spatial_iterations: int = 1
    spatial_radius: int = 16  # pixels
    depth_tolerance: float = 0.1  # relative depth test for reuse validity
    normal_tolerance: float = 0.9  # min dot(ns, ns_prev) for reuse
    # RIS target function for candidates + reuse merges: False = cheap
    # albedo/pi approximation (final shade always evaluates the full BSDF,
    # so the estimator stays unbiased -- W is computed w.r.t. whatever
    # target is used consistently; measured ~4x faster initial candidates).
    # True = full GGX+Lambert target (lower variance on glossy surfaces).
    full_target: bool = False
    # Light voxel grid (reference: BuildLightVoxelGrid + LVG-variant
    # kernels): merge this many camera-space voxel reservoir candidates
    # into each pixel's initial reservoir. 0 = off. The LVGConfig grid
    # shape lives in ops.prelighting.
    lvg_samples: int = 0
    # Spatial combine: "biased" = M-clamped merge (fast; slight darkening
    # at geometric discontinuities), "pairwise" = pairwise MIS (the
    # reference's unbiased estimator, PairwiseMIS.hlsli / Bitterli 2022).
    spatial_mis: str = "biased"
    spatial_neighbors: int = 3  # per pairwise pass (reference default)
    # Gather reuse candidates through the PACKED reservoir encoding
    # (ops.reservoir_pack; the reference's RGBA32U reservoir textures,
    # DirectLighting.h:106-116): halves the gathered rows and matches the
    # reference's quantization. False keeps raw-f32 reuse (bit-exact).
    packed_reuse: bool = True


def _surface_from_gbuf(gb, trans: bool = False, coat: bool = False):
    """gb: [G.ROWS, n] -> (pos, ns, ng, wo, mat, valid).

    ``trans``/``coat``: statically include the transmission / coat lobes
    (G.TRANS/G.ETA, G.COATW/G.COATR rows) so shading matches the pt mode;
    False compiles them out.
    """
    pos = v3.from_rows(gb, G.POS)
    ns = v3.from_rows(gb, G.NS)
    ng = v3.from_rows(gb, G.NG)
    wo = v3.from_rows(gb, G.WO)
    mat = S.MatSoA(
        base=v3.from_rows(gb, G.BASE),
        metallic=gb[G.METAL],
        roughness=gb[G.ROUGH],
        ior=gb[G.IOR],
        transmission=gb[G.TRANS] if trans else None,
        eta=gb[G.ETA] if trans else None,
        coat=gb[G.COATW] if coat else None,
        coat_roughness=gb[G.COATR] if coat else None,
    )
    return pos, ns, ng, wo, mat, gb[G.VALID] > 0.5


def _phat(mat, frame, wo_l, pos, ns, y_pos: V3, y_ng: V3, y_le: V3, y_two, full=True):
    """Target function: unshadowed luminance of the sample's contribution
    in *area measure* (f * Le * cos_surf * cos_light / dist^2).

    ``full=False`` replaces the BSDF with an albedo/pi approximation (plus a
    0.04 dielectric-specular floor so the target never vanishes where the
    real BSDF doesn't) -- the cheap RIS/merge target (cfg.full_target)."""
    to_l = y_pos - pos
    dist2 = jnp.maximum(v3.dot(to_l, to_l), 1e-12)
    inv_d = jax.lax.rsqrt(dist2)
    wi_w = to_l * inv_d
    cos_surf = v3.dot(wi_w, ns)
    cos_l_raw = -v3.dot(wi_w, y_ng)
    cos_l = jnp.where(y_two, jnp.abs(cos_l_raw), cos_l_raw)
    if full:
        wi_l = frame.to_local(wi_w)
        f, _ = S.bsdf_eval(mat, wo_l, wi_l)
    else:
        inv_pi = 0.3183098861
        f = V3(
            (mat.base.x + 0.04) * inv_pi,
            (mat.base.y + 0.04) * inv_pi,
            (mat.base.z + 0.04) * inv_pi,
        )
    lum = v3.luminance(f * y_le) * cos_surf * cos_l / dist2
    ok = (cos_surf > 1e-6) & (cos_l > 1e-6)
    return jnp.where(ok, jnp.maximum(lum, 0.0), 0.0), wi_w, dist2, cos_surf, cos_l, f


# ---------------------------------------------------------------------------
# Initial candidates (Pallas kernel)
# ---------------------------------------------------------------------------


def _ris_kernel(scal_ref, gb_ref, lset_ref, u_ref, out_ref, srow_scr, *, rt, m0, trans, coat, full):
    i = pl.program_id(0)
    tile0 = scal_ref[1, 0]  # global tile index of this shard's first tile
    gi = tile0 + i  # global tile index (sharding-invariant RNG/set choice)
    gb = gb_ref[:]
    pos, ns, ng, wo, mat, valid = _surface_from_gbuf(gb, trans, coat)
    frame = S.make_frame(ns)
    wo_l = frame.to_local(wo)

    zero = jnp.zeros((rt,))

    # Full-set RIS: every pixel rates ALL PS=128 presampled entries of its
    # tile's set with the cheap albedo/pi target as one [PS, rt] broadcast
    # (the set entries were drawn iid from the power alias table, so this is
    # textbook RIS with M = 128 -- lower variance than any small-M0 loop),
    # picks its winner by inverse-CDF over the cumulative weights, and
    # fetches the winner with a SINGLE one-hot matmul. Replaces the
    # per-candidate fori whose 16 tiny HIGHEST-precision matmuls were
    # MXU-latency-bound (~2.8 ms per candidate).
    del m0  # the whole set is the candidate pool
    n_sets, _, ps = lset_ref.shape
    set_idx = jax.lax.rem(gi * 31, n_sets)
    srow_scr[:] = lset_ref[set_idx]
    lset = srow_scr[:]

    e_pos_x = lset[0][:, None]
    e_pos_y = lset[1][:, None]
    e_pos_z = lset[2][:, None]
    e_ng_x = lset[3][:, None]
    e_ng_y = lset[4][:, None]
    e_ng_z = lset[5][:, None]
    e_lum = (
        0.2126 * lset[6] + 0.7152 * lset[7] + 0.0722 * lset[8]
    )[:, None]  # luminance(Le) per entry
    e_pdf = lset[9][:, None]
    e_two = lset[10][:, None]

    to_x = e_pos_x - pos.x[None, :]
    to_y = e_pos_y - pos.y[None, :]
    to_z = e_pos_z - pos.z[None, :]
    dist2 = jnp.maximum(to_x * to_x + to_y * to_y + to_z * to_z, 1e-12)
    inv_d = jax.lax.rsqrt(dist2)
    cos_surf = (to_x * ns.x[None, :] + to_y * ns.y[None, :] + to_z * ns.z[None, :]) * inv_d
    cos_l_raw = -(to_x * e_ng_x + to_y * e_ng_y + to_z * e_ng_z) * inv_d
    cos_l = jnp.where(e_two > 0.5, jnp.abs(cos_l_raw), cos_l_raw)
    inv_pi = 0.3183098861
    base_l = (
        0.2126 * (mat.base.x + 0.04)
        + 0.7152 * (mat.base.y + 0.04)
        + 0.0722 * (mat.base.z + 0.04)
    ) * inv_pi  # [rt] approx-target albedo term (see _phat full=False)
    phat_all = base_l[None, :] * e_lum * cos_surf * cos_l / dist2
    ok = (cos_surf > 1e-6) & (cos_l > 1e-6)
    phat_all = jnp.where(ok, jnp.maximum(phat_all, 0.0), 0.0)
    w_all = jnp.where(
        valid[None, :] & (e_pdf > 0.0),
        phat_all / jnp.maximum(e_pdf, 1e-12), 0.0,
    )

    # prefix sum over the entry axis as one lower-triangular-ones matmul
    # (cumsum has no Pallas TPU lowering)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (ps, ps), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (ps, ps), 1)
    tril = (iota_r >= iota_c).astype(jnp.float32)
    cum = jax.lax.dot_general(
        tril, w_all, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [ps, rt]
    w_sum = cum[ps - 1]
    # selection uniform precomputed in XLA (see megakernel.bounce_uniforms:
    # in-kernel u32 hashing is the slow path on Mosaic)
    u = u_ref[0]
    target = u * w_sum
    iota_ps = jax.lax.broadcasted_iota(jnp.int32, (ps, rt), 0)
    sel = cum > target[None, :]
    idx = jnp.min(jnp.where(sel, iota_ps, ps - 1), axis=0)
    onehot = (iota_ps == idx[None, :]).astype(jnp.float32)
    # one-hot fetch of the winner (HIGH = bf16x3: exact enough for a
    # single-term selection sum, 2x fewer MXU passes than HIGHEST)
    srow = jax.lax.dot_general(
        lset, onehot, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    y_pos = v3.from_rows(srow, 0)
    y_ng = v3.from_rows(srow, 3)
    y_le = v3.from_rows(srow, 6)
    y_two_f = srow[10]
    y_phat = jnp.sum(jnp.where(onehot > 0.0, phat_all, 0.0), axis=0)

    m_count = jnp.full((rt,), float(ps))
    big_w = w_sum / jnp.maximum(m_count * y_phat, 1e-12)
    big_w = jnp.where(y_phat > 0.0, big_w, 0.0)

    out_ref[0, :] = y_pos.x
    out_ref[1, :] = y_pos.y
    out_ref[2, :] = y_pos.z
    out_ref[3, :] = y_ng.x
    out_ref[4, :] = y_ng.y
    out_ref[5, :] = y_ng.z
    out_ref[6, :] = y_le.x
    out_ref[7, :] = y_le.y
    out_ref[8, :] = y_le.z
    out_ref[9, :] = w_sum
    out_ref[10, :] = m_count
    out_ref[11, :] = big_w
    out_ref[12, :] = y_two_f
    out_ref[13, :] = y_phat
    out_ref[14, :] = zero
    out_ref[15, :] = zero


def initial_candidates(
    gbuf, light_sets, seed, cfg: ReSTIRConfig, rt=1024, interpret=False,
    trans=False, coat=False, pix0=0,
):
    """RIS over M0 presampled lights per pixel -> reservoir rows [16, N].

    ``pix0``: global flat index of this shard's first pixel (must be a
    multiple of ``rt`` for sharding-invariant results; 0 when unsharded).
    """
    n = gbuf.shape[1]
    n_pad = ((n + rt - 1) // rt) * rt
    gb = jnp.pad(gbuf, ((0, 0), (0, n_pad - n))) if n_pad != n else gbuf
    scal = jnp.stack([
        jnp.asarray(seed).astype(jnp.int32).reshape(()),
        (jnp.asarray(pix0) // rt).astype(jnp.int32).reshape(()),
    ]).reshape(2, 1)
    kernel = functools.partial(
        _ris_kernel, rt=rt, m0=cfg.num_candidates, trans=trans, coat=coat,
        full=cfg.full_target,
    )
    from ..core.rng import uniform4

    pix_ids = jnp.arange(n_pad, dtype=jnp.int32) + jnp.asarray(pix0)
    u_sel = uniform4(pix_ids, 0, seed, salt=0x51E5)[0][None, :]
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // rt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((G.ROWS, rt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rt), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R_ROWS, rt), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R_ROWS, n_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((LSET_ROWS, light_sets.shape[2]), jnp.float32)
        ],
        # the batched candidate matmul needs > the default 16M scoped VMEM;
        # v5e has 128M physical
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(scal, gb, light_sets, u_sel)
    return out[:, :n]


# ---------------------------------------------------------------------------
# Reservoir merging (XLA, image space)
# ---------------------------------------------------------------------------


def _merge(res_a, res_b, surf, u, m_cap=None, full=True):
    """Combine reservoir B into A, re-evaluating B's sample at ``surf``.

    surf = (pos, ns, mat, frame, wo_l, valid). Standard ReSTIR combine:
    treat B's sample as one candidate with weight phat_b_here * W_b * M_b.
    """
    pos, ns, mat, frame, wo_l, valid = surf
    yb_pos = v3.from_rows(res_b, 0)
    yb_ng = v3.from_rows(res_b, 3)
    yb_le = v3.from_rows(res_b, 6)
    yb_two = res_b[12] > 0.5
    m_b = res_b[10]
    if m_cap is not None:
        m_b = jnp.minimum(m_b, m_cap)
    phat_b, *_ = _phat(
        mat, frame, wo_l, pos, ns, yb_pos, yb_ng, yb_le, yb_two, full=full
    )
    w_b = phat_b * res_b[11] * m_b
    w_b = jnp.where(valid, w_b, 0.0)

    w_sum = res_a[9] + w_b
    take = u * w_sum < w_b
    out = jnp.where(take[None, :], res_b, res_a)  # copies y fields (+junk rows)
    y_phat = jnp.where(take, phat_b, res_a[13])
    m_new = res_a[10] + m_b
    big_w = jnp.where(
        y_phat > 0.0, w_sum / jnp.maximum(m_new * y_phat, 1e-12), 0.0
    )
    return stack_rows(res_a.shape[0], {
        9: w_sum, 10: m_new, 11: big_w, 13: y_phat,
    }, like=out)


def _gather_rows(arr, idx):
    """arr [R, N], idx [N] -> arr[:, idx] (one XLA gather)."""
    return jnp.take(arr, idx, axis=1)


def _take_src(src, idx, band, width, height, src_row0=0):
    """Reuse-pass gather with optional banded VMEM windows.

    ``band``: None = plain flat take (source assumed VMEM-resident);
    (band_rows, halo_rows) = core.gatherband windows for large single-chip
    resolutions (the 1080p gather-cliff mitigation). Returns (vals, ok)
    where ok is None in plain mode, else the window-hit mask to AND into
    the caller's reuse-validity test.
    """
    if band is None:
        return jnp.take(src, idx, axis=1), None
    from ..core.gatherband import take_rows

    return take_rows(
        src, idx, width=width, height=height, band_rows=band[0],
        halo_rows=band[1], src_row0=src_row0,
    )


def _take_multi(parts, idx, band, width, height, src_row0=0):
    """Gather several row tables with ONE take.

    A [N]-index XLA gather costs ~2.5 ms at 512^2 on v5e regardless of the
    row count (measured: 3 rows and 40 rows gather in the same time -- the
    cost is per index, not per byte). Every reuse pass therefore
    concatenates its reservoir + geometry fetches into a single gather.
    ``parts``: list of [R_i, N] arrays (uint32 parts ride bitcast as f32).
    Returns (list of gathered parts in original dtypes, ok-or-None).
    """
    views, dtypes, sizes = [], [], []
    for p in parts:
        dtypes.append(p.dtype)
        sizes.append(p.shape[0])
        views.append(
            p if p.dtype == jnp.float32
            else jax.lax.bitcast_convert_type(p, jnp.float32)
        )
    cat = jnp.concatenate(views, axis=0)
    vals, ok = _take_src(cat, idx, band, width, height, src_row0)
    outs = []
    off = 0
    for r, dt in zip(sizes, dtypes):
        o = vals[off:off + r]
        off += r
        if dt != jnp.float32:
            o = jax.lax.bitcast_convert_type(o, dt)
        outs.append(o)
    return outs, ok


# Slim geometry table for the spatial-reuse agreement test: the full 40-row
# G-buffer gather fetched 35 unused rows per neighbor (measured ~2x the
# pass cost at 512^2); the test needs only depth + shading normal + validity.
GEOM_DEPTH, GEOM_NS, GEOM_VALID = 0, 1, 4
_GEOM_SRC_ROWS = None  # built lazily from G below


def geom_table(gbuf):
    """[5, N] slim geometry rows (depth, ns.xyz, valid) for reuse tests."""
    return jnp.stack(
        [gbuf[G.DEPTH], gbuf[G.NS], gbuf[G.NS + 1], gbuf[G.NS + 2],
         gbuf[G.VALID]], 0,
    )


def geom_ok_slim(gbuf, nb_geom, ns, cfg):
    """Neighbor-agreement test against gathered slim geometry rows."""
    depth = gbuf[G.DEPTH]
    ns_nb = V3(nb_geom[GEOM_NS], nb_geom[GEOM_NS + 1], nb_geom[GEOM_NS + 2])
    return (
        (jnp.abs(nb_geom[GEOM_DEPTH] - depth)
         < cfg.depth_tolerance * jnp.maximum(depth, 1e-3))
        & (v3.dot(ns, ns_nb) > cfg.normal_tolerance)
        & (nb_geom[GEOM_VALID] > 0.5)
    )


def lvg_merge(
    res, gbuf, camera, lvg, seed, cfg, lvg_cfg, trans=False, coat=False,
    pix=None,
):
    """Merge light-voxel-grid candidates into each pixel's reservoir.

    The reference's *_LVG kernel variants draw initial candidates from the
    voxel grid instead of the global alias table (IndirectLighting.h:20-54,
    LightVoxelGrid.hlsli Sample); here the LVG contributes
    ``cfg.lvg_samples`` extra RIS candidates per pixel on top of the
    presampled-set stream -- spatially-aware candidates for many-light
    scenes without losing the full-set RIS baseline.
    """
    from .prelighting import sample_lvg

    from ..core.rng import uniform4

    n = res.shape[1]
    pos, ns, _ng, wo, mat, valid = _surface_from_gbuf(gbuf, trans, coat)
    frame = S.make_frame(ns)
    wo_l = frame.to_local(wo)
    surf = (pos, ns, mat, frame, wo_l, valid)
    ids = pix if pix is not None else jnp.arange(n, dtype=jnp.int32)
    for s in range(cfg.lvg_samples):
        rows, ok = sample_lvg(lvg, gbuf, camera, seed, lvg_cfg, salt=0x51AB + s)
        okf = ok.astype(jnp.float32)
        # wrap the candidate as a 1-sample reservoir: M=1, W=1/pdf_area
        # (so _merge's w = phat * W * M reduces to the RIS weight phat/pdf)
        res_b = stack_rows(R_ROWS, {
            **{i: rows[i] for i in range(9)},
            10: okf,
            11: okf / jnp.maximum(rows[9], 1e-9),
            12: rows[10],
        }, n=n)
        u = uniform4(ids, s, seed, salt=0x1B7A)[0]
        res = _merge(res, res_b, surf, u, full=cfg.full_target)
    return res


def reproject_prev(
    gbuf, prev_cam, width, height, prev_row0=0, prev_rows=None, pos_prev=None,
):
    """Shared temporal reprojection: the previous-frame flat index of each
    pixel's hit point + validity pieces. DI, GI, PT and SkyDI temporal
    reuse all reproject identically, so the frame computes this ONCE and
    fetches all their reservoir tables with one joint gather
    (frame.render_frame_restir). Returns (idx, inside, depth_prev_est)."""
    pos = v3.from_rows(gbuf, G.POS)
    p_world = (
        pos_prev if pos_prev is not None
        else v3.aos3(pos)
    )
    px, py, w_fwd = prev_cam.project(p_world, width, height)
    rel = p_world - jnp.asarray(prev_cam.eye)
    depth_prev_est = jnp.sqrt(jnp.maximum(jnp.sum(rel * rel, axis=-1), 1e-12))
    ix = jnp.clip(jnp.round(px).astype(jnp.int32), 0, width - 1)
    iy = jnp.clip(jnp.round(py).astype(jnp.int32), 0, height - 1)
    inside = (
        (px >= -0.5) & (px <= width - 0.5) & (py >= -0.5) & (py <= height - 0.5)
        & (w_fwd > 0.0)
    )
    if prev_rows is None:
        prev_rows = height
    ey = iy - prev_row0
    inside = inside & (ey >= 0) & (ey < prev_rows)
    ey = jnp.clip(ey, 0, prev_rows - 1)
    return ey * width + ix, inside, depth_prev_est


def temporal_reuse(
    res, prev_res, prev_gbuf, gbuf, prev_cam, width, height, seed, cfg,
    trans=False, coat=False, pix=None, prev_row0=0, prev_rows=None,
    pos_prev=None, band=None, prefetch=None,
):
    """Merge reprojected previous-frame reservoirs into the current ones.

    Sharding hooks (parallel.mesh): ``pix`` = global flat pixel indices of
    this shard's pixels (RNG streams stay bit-identical to the unsharded
    frame); ``prev_row0``/``prev_rows`` describe the halo-extended previous
    arrays (first row's global row index and row count) -- reprojections
    landing outside the halo simply reject reuse.

    ``pos_prev``: optional [N, 3] previous-frame world position of each
    pixel's hit point (animated geometry motion vectors, the reference's
    GBufferRT motion-vector plane); defaults to the current position
    (camera-only motion).
    """
    n = res.shape[1]
    pos, ns, _ng, wo, mat, valid = _surface_from_gbuf(gbuf, trans, coat)
    frame = S.make_frame(ns)
    wo_l = frame.to_local(wo)

    from .gbuffer_pack import depth_valid, unpack_normal

    # ``prev_gbuf`` is the PACKED temporal G-buffer (ops.gbuffer_pack: the
    # reference's oct16-snorm normal + R32F depth planes, the same
    # quantized values the reference's temporal kernel reads); reservoirs
    # ride packed too (reservoir_pack), and BOTH are fetched with ONE
    # gather (_take_multi: gather cost is per index, not per row).
    # ``prefetch`` = (prev_r_full, prev_g, inside, depth_prev_est, okb):
    # the frame's joint DI+GI gather already fetched everything.
    if prefetch is not None:
        prev_r, prev_g, inside, depth_prev_est, okb = prefetch
    else:
        idx, inside, depth_prev_est = reproject_prev(
            gbuf, prev_cam, width, height, prev_row0, prev_rows, pos_prev
        )
        if cfg.packed_reuse:
            from .reservoir_pack import DI_PACKED_ROWS, pack_di, unpack_di

            src = prev_res if prev_res.shape[0] == DI_PACKED_ROWS else pack_di(prev_res)
            (prev_p, prev_g), okb = _take_multi(
                [src, prev_gbuf], idx, band, width, height, prev_row0
            )
            prev_r = unpack_di(prev_p)
        else:
            (prev_r, prev_g), okb = _take_multi(
                [prev_res, prev_gbuf], idx, band, width, height, prev_row0
            )
    nx, ny, nz = unpack_normal(prev_g)
    ns_prev = V3(nx, ny, nz)
    depth_prev, prev_valid = depth_valid(prev_g)
    depth_ok = jnp.abs(depth_prev - depth_prev_est) < (
        cfg.depth_tolerance * jnp.maximum(depth_prev_est, 1e-3)
    )
    normal_ok = v3.dot(ns, ns_prev) > cfg.normal_tolerance
    ok = inside & depth_ok & normal_ok & prev_valid & valid
    if okb is not None:
        ok = ok & okb
    prev_r = stack_rows(prev_r.shape[0], {
        10: jnp.where(ok, prev_r[10], 0.0),
        11: jnp.where(ok, prev_r[11], 0.0),
    }, like=prev_r)

    from ..core.rng import uniform4

    if pix is None:
        pix = jnp.arange(n, dtype=jnp.int32)
    u = uniform4(pix, 0, seed, salt=0x7E17)[0]
    # initial reservoirs carry M = set size (full-set RIS), so the clamp
    # scale comes from the reservoir's own M row (set size is a config axis)
    m_cap = cfg.m_max_factor * jnp.maximum(res[10], 1.0)
    surf = (pos, ns, mat, frame, wo_l, valid)
    return _merge(res, prev_r, surf, u, m_cap=m_cap, full=cfg.full_target)


def spatial_step(
    res, gbuf, width, height, seed, it, cfg: ReSTIRConfig,
    trans=False, coat=False, pix=None, res_src=None, gbuf_src=None, src_row0=0,
    band=None, prefetch=None,
):
    """One spatial-reuse iteration.

    ``res_src``/``gbuf_src``: gather source arrays (halo-extended under
    sharding; default: ``res``/``gbuf`` themselves). ``src_row0`` is the
    global row index of the source's first row; ``pix`` the global flat
    pixel indices (defaults reproduce the single-device behavior exactly).
    """
    n = res.shape[1]
    pos, ns, _ng, wo, mat, valid = _surface_from_gbuf(gbuf, trans, coat)
    frame = S.make_frame(ns)
    wo_l = frame.to_local(wo)
    surf = (pos, ns, mat, frame, wo_l, valid)
    if res_src is None:
        res_src = res
    if gbuf_src is None:
        gbuf_src = gbuf

    from ..core.rng import uniform4

    if pix is None:
        pix = jnp.arange(n, dtype=jnp.int32)
    u = uniform4(pix, it, seed, salt=0x5A71)
    if prefetch is not None:
        # frame-level joint gather (same neighbor pick for DI + GI)
        nb, nb_geom, okb = prefetch
    else:
        nidx = _disk_neighbor(pix, width, height, u, cfg.spatial_radius, src_row0)
        if band is not None:
            band = (band[0], max(band[1], cfg.spatial_radius))
        # reservoir + slim neighbor geometry in ONE gather (_take_multi)
        if cfg.packed_reuse:
            from .reservoir_pack import pack_di, unpack_di

            (nb_p, nb_geom), okb = _take_multi(
                [pack_di(res_src), geom_table(gbuf_src)], nidx, band, width,
                height, src_row0,
            )
            nb = unpack_di(nb_p)
        else:
            (nb, nb_geom), okb = _take_multi(
                [res_src, geom_table(gbuf_src)], nidx, band, width, height,
                src_row0,
            )
    ok = geom_ok_slim(gbuf, nb_geom, ns, cfg)
    if okb is not None:
        ok = ok & okb
    nb = stack_rows(nb.shape[0], {
        10: jnp.where(ok, nb[10], 0.0),
        11: jnp.where(ok, nb[11], 0.0),
    }, like=nb)
    return _merge(res, nb, surf, u[2], full=cfg.full_target)


def _disk_neighbor(pix, width, height, u, radius, src_row0=0):
    """Disk-sampled neighbor flat index from a uniform4 row pair."""
    x = pix % width
    y = pix // width
    r = radius * jnp.sqrt(u[0])
    phi = 2.0 * jnp.pi * u[1]
    dx = jnp.round(r * jnp.cos(phi)).astype(jnp.int32)
    dy = jnp.round(r * jnp.sin(phi)).astype(jnp.int32)
    nx = jnp.clip(x + dx, 0, width - 1)
    ny = jnp.clip(y + dy, 0, height - 1)
    return (ny - src_row0) * width + nx


def _neighbor_pick(pix, width, height, seed, tag, cfg, src_row0):
    """Random disk neighbor of each pixel -> (source flat index, u_stream)."""
    from ..core.rng import uniform4

    x = pix % width
    y = pix // width
    u = uniform4(pix, tag, seed, salt=0x5A71)
    r = cfg.spatial_radius * jnp.sqrt(u[0])
    phi = 2.0 * jnp.pi * u[1]
    dx = jnp.round(r * jnp.cos(phi)).astype(jnp.int32)
    dy = jnp.round(r * jnp.sin(phi)).astype(jnp.int32)
    nx = jnp.clip(x + dx, 0, width - 1)
    ny = jnp.clip(y + dy, 0, height - 1)
    return (ny - src_row0) * width + nx, u[2]


def _geom_ok(gbuf, nb_g, ns, cfg):
    depth = gbuf[G.DEPTH]
    depth_nb = nb_g[G.DEPTH]
    return (
        (jnp.abs(depth_nb - depth) < cfg.depth_tolerance * jnp.maximum(depth, 1e-3))
        & (v3.dot(ns, v3.from_rows(nb_g, G.NS)) > cfg.normal_tolerance)
        & (nb_g[G.VALID] > 0.5)
    )


def spatial_step_pairwise(
    res, gbuf, width, height, seed, it, cfg: ReSTIRConfig,
    trans=False, coat=False, pix=None, res_src=None, gbuf_src=None, src_row0=0,
    band=None,
):
    """One pairwise-MIS spatial pass over ``cfg.spatial_neighbors`` defensive
    strategies (reference PairwiseMIS.hlsli; Bitterli 2022 dissertation).

    Unbiased: each neighbor sample y_i gets MIS weight
    m_i = M_i p_i(y_i) / (M_i p_i(y_i) + (M_c/k) p_c(y_i)) and the canonical
    sample accumulates the complements; the final W divides by (1 + k_eff)
    with k_eff = number of neighbors that passed the geometry test. Our
    reservoirs carry area-measure light points, so every shift Jacobian
    is 1 (no half-vector copy shift: that exists for the reference's BRDF
    lobe samples, which our DI candidates don't use).
    """
    from ..core.rng import uniform4

    n = res.shape[1]
    pos, ns, _ng, wo, mat, valid = _surface_from_gbuf(gbuf, trans, coat)
    frame = S.make_frame(ns)
    wo_l = frame.to_local(wo)
    if res_src is None:
        res_src = res
    if gbuf_src is None:
        gbuf_src = gbuf
    if pix is None:
        pix = jnp.arange(n, dtype=jnp.int32)
    k = cfg.spatial_neighbors

    # gather all neighbors + geometry validity first (k_eff drives the MIS
    # denominators, like the reference counting valid strategies up front)
    if band is not None:
        band = (band[0], max(band[1], cfg.spatial_radius))
    if cfg.packed_reuse:
        from .reservoir_pack import pack_di, unpack_di

        res_src_p = pack_di(res_src)
    nbs = []
    k_eff = jnp.zeros((n,))
    for i in range(k):
        nidx, u_stream = _neighbor_pick(
            pix, width, height, seed, it * 16 + i, cfg, src_row0
        )
        if cfg.packed_reuse:
            (nb_p, nb_g), okb = _take_multi(
                [res_src_p, gbuf_src], nidx, band, width, height, src_row0
            )
            nb = unpack_di(nb_p)
        else:
            (nb, nb_g), okb = _take_multi(
                [res_src, gbuf_src], nidx, band, width, height, src_row0
            )
        ok = _geom_ok(gbuf, nb_g, ns, cfg) & valid
        if okb is not None:
            ok = ok & okb
        k_eff = k_eff + ok.astype(jnp.float32)
        nbs.append((nb, nb_g, ok, u_stream))
    k_div = jnp.maximum(k_eff, 1.0)

    phat_c_yc = res[13]
    w_c_cap = res[11]
    m_c_count = res[10]
    m_c = jnp.ones((n,))

    out = res  # y rows replaced on take
    w_sum_s = jnp.zeros((n,))
    m_s = m_c_count
    phat_sel = phat_c_yc

    for nb, nb_g, ok, u_stream in nbs:
        y_pos = v3.from_rows(nb, 0)
        y_ng = v3.from_rows(nb, 3)
        y_le = v3.from_rows(nb, 6)
        y_two = nb[12] > 0.5
        m_i_count = nb[10]
        # p_c(y_i): neighbor's sample re-rated at the canonical surface
        phat_c_yi, *_ = _phat(
            mat, frame, wo_l, pos, ns, y_pos, y_ng, y_le, y_two,
            full=cfg.full_target,
        )
        phat_i_yi = nb[13]
        num_i = m_i_count * phat_i_yi
        den_i = num_i + (m_c_count / k_div) * phat_c_yi
        m_i = jnp.where(ok & (den_i > 0.0), num_i / jnp.maximum(den_i, 1e-12), 0.0)
        w_i = m_i * phat_c_yi * nb[11]

        w_sum_s = w_sum_s + w_i
        take = u_stream * jnp.maximum(w_sum_s, 1e-30) < w_i
        out = jnp.where(take[None, :], nb, out)
        phat_sel = jnp.where(take, phat_c_yi, phat_sel)

        # p_i(y_c): the canonical sample re-rated at the neighbor's surface
        pos_i, ns_i, _ngi, wo_i, mat_i, _vi = _surface_from_gbuf(
            nb_g, trans, coat
        )
        frame_i = S.make_frame(ns_i)
        yc_pos = v3.from_rows(res, 0)
        yc_ng = v3.from_rows(res, 3)
        yc_le = v3.from_rows(res, 6)
        yc_two = res[12] > 0.5
        phat_i_yc, *_ = _phat(
            mat_i, frame_i, frame_i.to_local(wo_i), pos_i, ns_i,
            yc_pos, yc_ng, yc_le, yc_two, full=cfg.full_target,
        )
        num_c = m_i_count * phat_i_yc
        den_c = num_c + (m_c_count / k_div) * phat_c_yc
        dm = jnp.where(den_c > 0.0, 1.0 - num_c / jnp.maximum(den_c, 1e-12), 1.0)
        m_c = m_c + jnp.where(ok, dm, 0.0)
        m_s = m_s + jnp.where(ok, m_i_count, 0.0)

    # canonical stream (PairwiseMIS::End)
    w_c = m_c * phat_c_yc * w_c_cap
    w_sum_s = w_sum_s + w_c
    u_end = uniform4(pix, it * 16 + 15, seed, salt=0x5A72)[0]
    take_c = u_end * jnp.maximum(w_sum_s, 1e-30) < w_c
    out = jnp.where(take_c[None, :], res, out)
    phat_sel = jnp.where(take_c, phat_c_yc, phat_sel)

    w_new = jnp.where(
        phat_sel > 0.0,
        w_sum_s / jnp.maximum(phat_sel * (1.0 + k_eff), 1e-12),
        0.0,
    )
    return stack_rows(out.shape[0], {
        9: w_sum_s, 10: m_s, 11: w_new, 13: phat_sel,
    }, like=out)


def spatial_reuse(
    res, gbuf, width, height, seed, cfg: ReSTIRConfig,
    trans=False, coat=False, pix=None, band=None,
):
    """Merge reservoirs from random nearby pixels (per-pixel offsets)."""
    step = (
        spatial_step_pairwise if cfg.spatial_mis == "pairwise" else spatial_step
    )
    out = res
    for it in range(cfg.spatial_iterations):
        out = step(
            out, gbuf, width, height, seed, it, cfg, trans, coat, pix,
            band=band,
        )
    return out


def visibility_reuse(scene, res, gbuf):
    """Zero the reservoir when its winner is occluded (original-paper
    'visibility reuse', reference: initial-candidate visibility option).
    Cleans the reservoirs *before* temporal feedback and spatial reuse so
    occluded winners don't spread shadow noise."""
    from ..accel.intersect import intersect_occluded

    pos = v3.from_rows(gbuf, G.POS)
    ng = v3.from_rows(gbuf, G.NG)
    y_pos = v3.from_rows(res, 0)
    to_l = y_pos - pos
    so = pos + ng * _EPS_RAY
    shadow_o = v3.aos3(so)
    seg = v3.aos3(to_l)
    occ = intersect_occluded(scene, shadow_o, seg, t_min=1e-3, t_max=1.0 - 1e-3)
    live = (gbuf[G.VALID] > 0.5) & (res[11] > 0.0) & ~occ
    keep = live.astype(jnp.float32)
    res = res.at[9].set(res[9] * keep)
    res = res.at[11].set(res[11] * keep)
    return res


# ---------------------------------------------------------------------------
# Final shading
# ---------------------------------------------------------------------------


def shade(scene, res, gbuf, interpret=False, trans=False, coat=False, rows_out=False):
    """Shadow-test the surviving sample and return direct radiance [N, 3]
    (plus directly-visible emissive from the G-buffer).
    ``rows_out``: return planar [3, N] rows (no lane-wasting transpose)."""
    from ..accel.intersect import intersect_occluded

    pos, ns, ng, wo, mat, valid = _surface_from_gbuf(gbuf, trans, coat)
    frame = S.make_frame(ns)
    wo_l = frame.to_local(wo)

    y_pos = v3.from_rows(res, 0)
    y_ng = v3.from_rows(res, 3)
    y_le = v3.from_rows(res, 6)
    y_two = res[12] > 0.5
    big_w = res[11]

    phat, wi_w, dist2, cos_surf, cos_l, f = _phat(
        mat, frame, wo_l, pos, ns, y_pos, y_ng, y_le, y_two
    )
    lit = valid & (phat > 0.0) & (big_w > 0.0)

    to_l = y_pos - pos
    shadow_o = v3.aos3((pos + ng * _EPS_RAY))
    seg = v3.aos3(to_l)
    occ = intersect_occluded(scene, shadow_o, seg, t_min=1e-3, t_max=1.0 - 1e-3)
    vis = lit & ~occ

    scale = jnp.where(vis, cos_surf * cos_l / jnp.maximum(dist2, 1e-12) * big_w, 0.0)
    contrib = f * y_le * scale
    emiss = v3.from_rows(gbuf, G.EMISS)
    out = contrib + emiss
    ax = 0 if rows_out else -1
    return v3.aos3(out, ax)
