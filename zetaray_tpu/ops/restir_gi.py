"""ReSTIR GI: reservoir resampling of one-bounce-anchored indirect light.

TPU-native rebuild of the reference's ReSTIR GI integrator
(IndirectLighting.h INTEGRATOR::ReSTIR_GI; 3-texture reservoirs h:291-301,
temporal+spatial resampling Resampling.hlsli). Per pixel, the sample is a
*reconnection vertex*: the secondary hit x2 with its normal n2 and the
outgoing radiance L2 it sends back toward the primary hit (computed by the
PT megakernel, excluding x2's own emission which the DI pass already
counts).

Measure choice: reservoir weights use the *area measure*
(p-hat_A = lum(f1 * L2 * cos1) * cos2 / d^2, source pdf_A = pdf_sa * cos2
/ d^2), so temporal/spatial reuse needs no reconnection Jacobian -- the
area density of a world-space vertex is pixel-independent (the solid-angle
formulation needs the |J| factor the reference's shift mapping computes).

Reservoir SoA rows [16, N]:
  0-2 x2 | 3-5 n2 | 6-8 L2 | 9 w_sum | 10 M | 11 W | 12 phat | 13-15 pad
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp

from ..core import vec3 as v3
from ..core.vec3 import V3
from ..core.rows import stack_rows
from ..accel.megakernel import G
from . import shading_soa as S

R_ROWS = 16
_EPS_RAY = 1e-3


@dataclass(frozen=True)
class ReSTIRGIConfig:
    temporal: bool = True
    full_target: bool = False  # see restir_di.ReSTIRConfig.full_target
    m_max: float = 10.0  # reference IndirectLighting DefaultParamVals::M_MAX
    spatial_iterations: int = 1
    spatial_radius: int = 12
    depth_tolerance: float = 0.1
    normal_tolerance: float = 0.9
    packed_reuse: bool = True  # see restir_di.ReSTIRConfig.packed_reuse
    # ReSTIR_GI_LVG variant (IndirectLighting.h:28): NEE at the GI path's
    # reconnection vertex draws its light candidate from the light voxel
    # grid (falling back to a power-sampled light off-grid), instead of the
    # in-kernel presampled-set candidate. Needs cfg.restir.lvg_samples > 0
    # (the reference likewise requires presampling+LVG enabled,
    # IndirectLighting.h:92-95).
    lvg: bool = False
    # Boiling suppression (Resampling.hlsli:530-536, BOILING_SUPPRESSION):
    # after temporal reuse, a reservoir whose w_sum dwarfs its
    # neighborhood's gets M reset to 1 so later merges dilute it. The
    # reference defaults this ON and so do we (the pinned goldens were
    # regenerated with suppression on in round 4).
    boiling_suppression: bool = True


def _surf(gbuf, trans: bool = False, coat: bool = False):
    pos = v3.from_rows(gbuf, G.POS)
    ns = v3.from_rows(gbuf, G.NS)
    ng = v3.from_rows(gbuf, G.NG)
    wo = v3.from_rows(gbuf, G.WO)
    mat = S.MatSoA(
        base=v3.from_rows(gbuf, G.BASE), metallic=gbuf[G.METAL],
        roughness=gbuf[G.ROUGH], ior=gbuf[G.IOR],
        transmission=gbuf[G.TRANS] if trans else None,
        eta=gbuf[G.ETA] if trans else None,
        coat=gbuf[G.COATW] if coat else None,
        coat_roughness=gbuf[G.COATR] if coat else None,
    )
    frame = S.make_frame(ns)
    return pos, ns, ng, wo, mat, frame, gbuf[G.VALID] > 0.5


def _phat_area(mat, frame, wo_l, pos, ns, x2: V3, n2: V3, l2: V3, full=True):
    """Area-measure target + the shading factors it is built from.

    ``full=False``: albedo/pi approximate target for candidates and reuse
    merges (restir_di._phat rationale); shade always uses full=True."""
    to2 = x2 - pos
    d2 = jnp.maximum(v3.dot(to2, to2), 1e-12)
    inv = jax.lax.rsqrt(d2)
    wi = to2 * inv
    cos1 = v3.dot(wi, ns)
    cos2 = jnp.maximum(-v3.dot(wi, n2), 0.0)
    if full:
        f, _ = S.bsdf_eval(mat, wo_l, frame.to_local(wi))
    else:
        inv_pi = 0.3183098861
        f = V3(
            (mat.base.x + 0.04) * inv_pi,
            (mat.base.y + 0.04) * inv_pi,
            (mat.base.z + 0.04) * inv_pi,
        )
    geom = cos1 * cos2 / d2
    phat = jnp.maximum(v3.luminance(f * l2) * geom, 0.0)
    ok = cos1 > 1e-6
    return jnp.where(ok, phat, 0.0), f, geom, wi


# Reconnection vertices for rays that escape to the sky sit on a far sphere:
# the area-measure reservoir machinery then handles environment GI with no
# special cases (phat ~ 1/d^2 and pdf_area ~ 1/d^2 cancel; f32-safe at 1e4).
SKY_DIST = 1.0e4


def _nee_emissive_lvg(
    scene, lvg, camera, pos2, ns2, ng2, mat2, wo2, live, seed, lvg_cfg,
):
    """NEE at the reconnection vertex x2 with an LVG light candidate.

    The ReSTIR_GI_LVG variant's defining change (ReSTIR_GI_NEE.hlsli
    NEE_Emissive_LVG): the light sample at the GI path's vertex comes from
    the camera-space light voxel grid (spatially-aware reservoirs), falling
    back to a power-sampled light when the voxel is empty/off-grid; the
    estimate is MIS-weighted against the BSDF sampler exactly like the
    presampled-set NEE. Runs OUTSIDE the megakernel: the inner trace
    disables its bounce-0 NEE (min_nee_bounce=1) and this term replaces it.

    pos2/ns2/ng2/wo2: V3 rows at x2 (wo2 points back toward x1);
    mat2: MatSoA at x2; live: bool [N]. Returns V3 radiance (zeros where
    not live).
    """
    from ..core.rng import uniform4
    from ..core.sampling import sample_alias, square_to_triangle
    from ..accel.intersect import intersect_occluded
    from ..scene.scene import EA
    from .prelighting import sample_lvg_at

    n = ns2.x.shape[0]
    zero = jnp.zeros(n)
    if scene.num_emissives == 0:
        return V3(zero, zero, zero)
    pix = jnp.arange(n, dtype=jnp.int32)
    p_aos = v3.aos3(pos2)
    rows_l, valid_l = sample_lvg_at(
        lvg, p_aos, live, camera, seed, lvg_cfg, salt=0x6B21
    )

    # fallback: power-sampled (alias-table) light -- the out-of-kernel
    # equivalent of the reference's presampled-set fallback
    e = scene.num_emissives
    u = uniform4(pix, 7, seed, salt=0x6B22)
    idx = sample_alias(scene.em_prob[:e], scene.em_alias[:e], u[0], u[1])
    row = scene.em_attrs[idx]
    bary = square_to_triangle(jnp.stack([u[2], u[3]], -1))
    lp_f = (
        row[:, EA.V0 : EA.V0 + 3]
        + bary[:, :1] * row[:, EA.E1 : EA.E1 + 3]
        + bary[:, 1:2] * row[:, EA.E2 : EA.E2 + 3]
    )
    area = 0.5 * jnp.linalg.norm(
        jnp.cross(row[:, EA.E1 : EA.E1 + 3], row[:, EA.E2 : EA.E2 + 3]),
        axis=-1,
    )
    pdf_f = scene.em_pdf[idx] / jnp.maximum(area, 1e-12)

    use_lvg = valid_l
    lp = v3.where(use_lvg, v3.from_rows(rows_l, 0), V3(*lp_f.T))
    lng = v3.where(
        use_lvg, v3.from_rows(rows_l, 3), V3(*row[:, EA.NG : EA.NG + 3].T)
    )
    lle = v3.where(
        use_lvg, v3.from_rows(rows_l, 6), V3(*row[:, EA.LE : EA.LE + 3].T)
    )
    lpdf = jnp.where(use_lvg, rows_l[9], pdf_f)
    l2s = jnp.where(use_lvg, rows_l[10], row[:, EA.TWO_SIDED]) > 0.5

    to_l = lp - pos2
    dist2 = jnp.maximum(v3.dot(to_l, to_l), 1e-12)
    wi = to_l * jax.lax.rsqrt(dist2)
    cos_s = v3.dot(wi, ns2)
    cos_l_raw = -v3.dot(wi, lng)
    cos_l = jnp.where(l2s, jnp.abs(cos_l_raw), cos_l_raw)
    frame2 = S.make_frame(ns2)
    f2, pdf_b = S.bsdf_eval(mat2, frame2.to_local(wo2), frame2.to_local(wi))
    pdf_l_sa = lpdf * dist2 / jnp.maximum(cos_l, 1e-8)
    cand = live & (cos_s > 1e-6) & (cos_l > 1e-6) & (lpdf > 0.0)
    occ = intersect_occluded(
        scene, v3.aos3(pos2 + ng2 * _EPS_RAY), v3.aos3(to_l),
        t_min=1e-3, t_max=1.0 - 1e-3,
    )
    mis = S.power_heuristic(pdf_l_sa, pdf_b)
    gain = jnp.where(
        cand & ~occ, cos_s * mis / jnp.maximum(pdf_l_sa, 1e-12), 0.0
    )
    return V3(f2.x * lle.x * gain, f2.y * lle.y * gain, f2.z * lle.z * gain)


def initial_samples(scene, gbuf, key, pt_cfg, seed, trans=False, coat=False, pix=None, pix0=0, rt=1024, full_target=False, textures=None, spread_angle=0.0, lvg=None, lvg_cam=None, lvg_cfg=None):
    """Generate one GI sample per pixel.

    Samples a BSDF direction at the primary hit, finds x2/n2 with one
    closest-hit query, and evaluates L2 = outgoing radiance at x2 (PT from
    the secondary ray, emission at x2 excluded). Rays that miss into a sky
    (pt_cfg.sky) become far-sphere reconnection vertices carrying the sky
    radiance, so environment light participates in GI reuse. Returns
    reservoir rows.

    ``lvg``/``lvg_cam``/``lvg_cfg``: the ReSTIR_GI_LVG variant
    (IndirectLighting.h:28) -- the NEE at x2 moves out of the inner trace
    and draws its light candidate from the light voxel grid
    (:func:`_nee_emissive_lvg`).
    """
    from ..core.rng import uniform4
    from ..scene.scene import A
    from .pathtracer import trace

    n = gbuf.shape[1]
    pos, ns, ng, wo, mat, frame, valid = _surf(gbuf, trans, coat)
    wo_l = frame.to_local(wo)
    if pix is None:
        pix = jnp.arange(n, dtype=jnp.int32)
    u = uniform4(pix, 101, seed, salt=0x61AA)
    wi_l, _, pdf_sa = S.bsdf_sample(mat, wo_l, u[0], u[1], u[2])
    wi = frame.to_world(wi_l)
    geo_ok = v3.dot(wi, ng) > 1e-6
    live = valid & (pdf_sa > 0.0) & geo_ok

    o2 = v3.aos3((pos + ng * _EPS_RAY))
    d2 = v3.aos3(wi)

    smb_kill = None
    if pt_cfg.stochastic_multi_bounce and pt_cfg.max_bounces > 1:
        # Resampling.hlsli:545-550: half the paths stop at x2 (rough
        # primaries only; specular surfaces keep the full bounce budget)
        u_smb = uniform4(pix, 97, seed, salt=0x53B0)[0]
        smb_kill = (u_smb < 0.5) & (mat.roughness >= 0.1)

    # L2: radiance arriving from direction d2 (excludes x2's own emission,
    # which the DI pass owns as "emissive at bounce 1")
    use_lvg = lvg is not None and lvg_cam is not None and lvg_cfg is not None
    l2_cfg = replace(
        pt_cfg,
        max_bounces=max(pt_cfg.max_bounces - 1, 0),
        min_emissive_bounce=max(pt_cfg.min_emissive_bounce - 1, 1),
        # LVG variant: x2's NEE runs outside the kernel with LVG candidates
        min_nee_bounce=1 if use_lvg else 0,
    )
    from .pathtracer import megakernel_eligible

    if megakernel_eligible(scene):
        # fused path: the trace's bounce-0 closest hit IS the x2 query, so
        # the split trace kernel's surface output replaces the separate
        # intersect_closest_shaded sweep (one full sweep saved per frame)
        from ..accel.megakernel import trace_with_first_hit
        from ..core.rng import seed_from_key

        l2_rows, surf2, alive2 = trace_with_first_hit(
            scene, o2, d2, seed_from_key(key), l2_cfg, pix0=pix0, rt=rt,
            textures=textures, spread_angle=spread_angle, smb_kill=smb_kill,
        )
        l2 = V3(l2_rows[0], l2_rows[1], l2_rows[2])
        x2_hit = alive2 > 0.5
        hit = x2_hit & live
        x2 = V3(surf2[0], surf2[1], surf2[2])
        n2 = V3(surf2[6], surf2[7], surf2[8])
        if use_lvg:
            # ReSTIR_GI_LVG: x2's NEE with an LVG candidate (the in-kernel
            # bounce-0 NEE was disabled via l2_cfg.min_nee_bounce)
            mat2 = S.MatSoA(
                base=V3(surf2[9], surf2[10], surf2[11]),
                metallic=surf2[12], roughness=surf2[13], ior=surf2[14],
                transmission=surf2[15] if trans else None,
                eta=surf2[16] if trans else None,
                coat=surf2[17] if coat else None,
                coat_roughness=surf2[18] if coat else None,
            )
            l2 = l2 + _nee_emissive_lvg(
                scene, lvg, lvg_cam, x2, V3(surf2[3], surf2[4], surf2[5]),
                n2, mat2, V3(-wi.x, -wi.y, -wi.z), hit, seed, lvg_cfg,
            )
    else:
        # streaming/oracle path: the trace's bounce-0 closest hit IS the x2
        # query (return_first_hit), saving one full traversal sweep -- and
        # dead lanes are parked so the stream prepass culls them
        # (pathtracer._park).
        from .pathtracer import _park, trace_reference

        o2p, d2p = _park(live, o2, d2)
        l2_rgb, sh = trace_reference(
            scene, o2p, d2p, key, l2_cfg, pix0=pix0, textures=textures,
            spread_angle=spread_angle, smb_kill=smb_kill,
            return_first_hit=True,
        )
        x2_hit = sh.valid
        hit = sh.valid & live
        x2 = V3(*(o2 + sh.t[:, None] * d2).T)
        n2_raw = V3(*sh.attrs[:, A.NG : A.NG + 3].T)
        # face n2 toward x1
        flip = v3.dot(n2_raw, V3(*d2.T)) > 0.0
        n2 = v3.where(flip, -n2_raw, n2_raw)
        l2 = V3(*l2_rgb.T)
        if use_lvg:
            at2 = sh.attrs.T
            ior2 = jnp.maximum(at2[A.IOR], 1.01)
            front2 = ~flip
            mat2 = S.MatSoA(
                base=v3.from_rows(at2, A.BASE), metallic=at2[A.METAL],
                roughness=at2[A.ROUGH], ior=ior2,
                transmission=at2[A.TRANS] if trans else None,
                eta=jnp.where(front2, 1.0 / ior2, ior2) if trans else None,
                coat=at2[A.COATW] if coat else None,
                coat_roughness=at2[A.COATR] if coat else None,
            )
            l2 = l2 + _nee_emissive_lvg(
                scene, lvg, lvg_cam, x2, n2, n2, mat2,
                V3(-wi.x, -wi.y, -wi.z), hit, seed, lvg_cfg,
            )

    if pt_cfg.sky is not None:
        # escaped rays: reconnection vertex on the far sphere, L2 = sky
        # radiance (sun disk excluded -- the primary sun-NEE term owns it)
        from . import sky as SK

        sky_miss = live & ~x2_hit
        env = SK.sky_radiance(V3(*d2.T), pt_cfg.sky, with_disk=False)
        wi_v = V3(*d2.T)
        x2 = v3.where(sky_miss, V3(*(o2.T)) + wi_v * SKY_DIST, x2)
        n2 = v3.where(sky_miss, -wi_v, n2)
        l2 = v3.where(sky_miss, env, l2)
        hit = hit | sky_miss

    phat, _, _, _ = _phat_area(mat, frame, wo_l, pos, ns, x2, n2, l2, full=full_target)
    # source pdf in area measure
    to2 = x2 - pos
    dist2 = jnp.maximum(v3.dot(to2, to2), 1e-12)
    cos2 = jnp.maximum(-v3.dot(to2 * jax.lax.rsqrt(dist2), n2), 1e-6)
    pdf_area = pdf_sa * cos2 / dist2
    w = jnp.where(hit & (pdf_area > 0.0), phat / jnp.maximum(pdf_area, 1e-12), 0.0)

    big_w = jnp.where(phat > 0.0, w / jnp.maximum(phat, 1e-12), 0.0)
    return stack_rows(R_ROWS, {
        0: x2.x, 1: x2.y, 2: x2.z,
        3: n2.x, 4: n2.y, 5: n2.z,
        6: l2.x, 7: l2.y, 8: l2.z,
        9: w, 10: jnp.where(hit, 1.0, 0.0), 11: big_w, 12: phat,
    }, n=n)


def _merge(res_a, res_b, surf, u, m_cap=None, full=True):
    pos, ns, ng, wo, mat, frame, valid = surf
    wo_l = frame.to_local(wo)
    xb = v3.from_rows(res_b, 0)
    nb = v3.from_rows(res_b, 3)
    lb = v3.from_rows(res_b, 6)
    m_b = res_b[10]
    if m_cap is not None:
        m_b = jnp.minimum(m_b, m_cap)
    phat_b, _, _, _ = _phat_area(mat, frame, wo_l, pos, ns, xb, nb, lb, full=full)
    w_b = jnp.where(valid, phat_b * res_b[11] * m_b, 0.0)
    w_sum = res_a[9] + w_b
    take = u * w_sum < w_b
    out = jnp.where(take[None, :], res_b, res_a)
    y_phat = jnp.where(take, phat_b, res_a[12])
    m_new = res_a[10] + m_b
    big_w = jnp.where(y_phat > 0.0, w_sum / jnp.maximum(m_new * y_phat, 1e-12), 0.0)
    return stack_rows(R_ROWS, {
        9: w_sum, 10: m_new, 11: big_w, 12: y_phat,
    }, like=out)


def suppress_outlier_reservoirs(res, group: int = 32, w_sum_row: int = 9,
                                m_row: int = 10):
    """Boiling suppression (Resampling.hlsli SuppressOutlierReservoirs):
    reservoirs whose w_sum exceeds 25x the mean of the rest of their
    neighborhood get M reset to 1 (W and w_sum untouched -- this frame's
    shade is unchanged; the outlier just loses its mass in later merges).
    The reference's neighborhood is the 32-lane wave; here it is ``group``
    consecutive pixels of the row-major image."""
    n = res.shape[1]
    w = res[w_sum_row]
    pad = (-n) % group
    g = jnp.pad(w, (0, pad)).reshape(-1, group)
    avg_others = (g.sum(axis=1, keepdims=True) - g) / (group - 1)
    outlier = (g > 25.0 * avg_others).reshape(-1)[:n]
    m_new = jnp.where(outlier, jnp.minimum(res[m_row], 1.0), res[m_row])
    return stack_rows(res.shape[0], {m_row: m_new}, like=res)


def temporal_reuse(
    res, prev_res, prev_gbuf, gbuf, prev_cam, width, height, seed, cfg,
    trans=False, coat=False, pix=None, prev_row0=0, prev_rows=None,
    pos_prev=None, band=None, prefetch=None,
):
    from ..core.rng import uniform4

    n = res.shape[1]
    surf = _surf(gbuf, trans, coat)
    ns = surf[1]
    from .restir_di import _take_multi, reproject_prev

    if prefetch is not None:
        prev_r, prev_g, inside, depth_est, okb = prefetch
    else:
        idx, inside, depth_est = reproject_prev(
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
    # prev_gbuf is the PACKED temporal G-buffer (ops.gbuffer_pack)
    from .gbuffer_pack import temporal_geom_ok

    ok = inside & temporal_geom_ok(
        prev_g, ns, depth_est, cfg.depth_tolerance, cfg.normal_tolerance
    )
    if okb is not None:
        ok = ok & okb
    prev_r = stack_rows(R_ROWS, {
        10: jnp.where(ok, prev_r[10], 0.0),
        11: jnp.where(ok, prev_r[11], 0.0),
    }, like=prev_r)
    if pix is None:
        pix = jnp.arange(n, dtype=jnp.int32)
    u = uniform4(pix, 102, seed, salt=0x6E31)[0]
    out = _merge(res, prev_r, surf, u, m_cap=cfg.m_max, full=cfg.full_target)
    if cfg.boiling_suppression:
        out = suppress_outlier_reservoirs(out)
    return out


def spatial_step(
    res, gbuf, width, height, seed, it, cfg,
    trans=False, coat=False, pix=None, res_src=None, gbuf_src=None, src_row0=0,
    band=None, prefetch=None,
):
    """One GI spatial-reuse iteration (sharding hooks as restir_di.spatial_step)."""
    from ..core.rng import uniform4

    n = res.shape[1]
    surf = _surf(gbuf, trans, coat)
    ns = surf[1]
    if res_src is None:
        res_src = res
    if gbuf_src is None:
        gbuf_src = gbuf
    if pix is None:
        pix = jnp.arange(n, dtype=jnp.int32)
    u = uniform4(pix, 103 + it, seed, salt=0x51A7)
    from .restir_di import _disk_neighbor, _take_multi, geom_ok_slim, geom_table

    if prefetch is not None:
        nb, nb_geom, okb = prefetch
    else:
        nidx = _disk_neighbor(pix, width, height, u, cfg.spatial_radius, src_row0)
        if band is not None:
            band = (band[0], max(band[1], cfg.spatial_radius))
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
    nb = stack_rows(R_ROWS, {
        10: jnp.where(ok, nb[10], 0.0),
        11: jnp.where(ok, nb[11], 0.0),
    }, like=nb)
    return _merge(res, nb, surf, u[2], full=cfg.full_target)


def spatial_reuse(res, gbuf, width, height, seed, cfg, trans=False, coat=False, pix=None, band=None):
    out = res
    for it in range(cfg.spatial_iterations):
        out = spatial_step(
            out, gbuf, width, height, seed, it, cfg, trans, coat, pix,
            band=band,
        )
    return out


def shade(scene, res, gbuf, trans=False, coat=False, rows_out=False):
    """Indirect radiance from the surviving sample (+ visibility ray).
    ``rows_out``: return planar [3, N] rows."""
    from ..accel.intersect import intersect_occluded

    pos, ns, ng, wo, mat, frame, valid = _surf(gbuf, trans, coat)
    wo_l = frame.to_local(wo)
    x2 = v3.from_rows(res, 0)
    n2 = v3.from_rows(res, 3)
    l2 = v3.from_rows(res, 6)
    big_w = res[11]
    phat, f, geom, wi = _phat_area(mat, frame, wo_l, pos, ns, x2, n2, l2)
    lit = valid & (phat > 0.0) & (big_w > 0.0)
    so = pos + ng * _EPS_RAY
    seg = x2 - so
    occ = intersect_occluded(
        scene,
        v3.aos3(so),
        v3.aos3(seg),
        t_min=1e-3, t_max=1.0 - 1e-3,
    )
    gain = jnp.where(lit & ~occ, geom * big_w, 0.0)
    out = f * l2 * gain
    ax = 0 if rows_out else -1
    return v3.aos3(out, ax)
