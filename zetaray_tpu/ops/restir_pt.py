"""ReSTIR PT: reservoir path reuse with reconnection shift.

TPU-native rebuild of the reference's flagship integrator
(IndirectLighting.h:29-54 INTEGRATOR::ReSTIR_PT: 7-texture path reservoirs,
sort -> replay -> reconnect kernel chain, shift-mapping Jacobians). The
sample is a FULL PATH beyond the primary hit, represented by its
*reconnection vertex* x_rc plus a frozen suffix:

  rows: x_rc | n_rc | Le_rc | w_s (suffix dir) | L_s (pdf-folded suffix
  radiance) | rc material (base, metallic, roughness) | w_sum M W phat dist

The path contribution at pixel q re-evaluates BOTH pixel-side terms:

  f(q) = f1_q(wo_q -> d_rc) * G_A(x1_q, x_rc) * [Le_rc + f_rc(-d_rc, w_s) * L_s]

with L_s = L_raw(w_s) * cos_s / pdf(w_s | original prefix) frozen at
generation. This is the key difference from restir_gi (which freezes the
whole outgoing radiance at x2 and therefore cannot re-evaluate the BSDF at
the reconnection vertex when the path is shifted): here shifts are exact
GRIS reconnection shifts. In AREA measure the reconnection Jacobian is 1
(the vertex's area density is pixel-independent), so no |J| factor appears.

Hybrid-shift validity (IndirectLighting's reconnection conditions): a shift
is valid only when the reconnection vertex is far enough (relative distance
threshold) and the rc BSDF is rough enough. When the conditions FAIL, the
replay fallback (cfg.replay; reference ReSTIR_PT_Replay) re-samples the
first path segment at the destination with the source's RNG stream and
reconnects at the stored second vertex x3 -- see _replay_shift for the
Jacobian/convention bookkeeping. EVERY reservoir stays replay-eligible
across takes, like the reference's deeper chains (IndirectLighting.h:
32-52): fresh candidates carry their generating identity; replay-taken
(case-B) reservoirs re-anchor with PDFA updated and PDFS3 consumed; and
reconnection-taken (case-A) reservoirs keep their rows VERBATIM -- the
reconnection shift is identity on the path vertices (area-Jacobian 1), so
the stored SRCPIX/SRCSEED + PDFA + x3 block remain the fresh path's exact
replay state regardless of which pixel currently holds the path.

The reference's Sort kernels emulate shader-execution reordering with
thread maps; on TPU the sort is GENUINE ray reordering: suffix rays are
argsorted by (rc material, direction octant) so the suffix-trace wavefront
is coherent (feeds the streaming traversal's tile culling on large scenes).

Reservoir SoA rows [PR.ROWS, N], all f32.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp

from ..accel.megakernel import G
from ..core import vec3 as v3
from ..core.rows import set3, stack_rows
from ..core.vec3 import V3
from . import shading_soa as S

_EPS_RAY = 1e-3
SKY_DIST = 1.0e4


class PR:
    X = 0  # 3: reconnection vertex position
    N = 3  # 3: normal at rc (faces the prefix side)
    LE = 6  # 3: emitted radiance at rc toward the prefix side
    WS = 9  # 3: suffix direction (unit, world)
    LS = 12  # 3: L_raw * cos_s / pdf_s (frozen suffix radiance)
    BASE = 15  # 3: rc material base color
    METAL = 18
    ROUGH = 19
    WSUM = 20
    M = 21
    W = 22
    PHAT = 23
    DIST = 24  # |x1 - x_rc| at generation (reconnection-validity test)
    # -- replay-shift data (reference: ReSTIR_PT_Replay kernel family,
    # IndirectLighting.h:32-52). The path's generating RNG identity lets a
    # destination pixel re-run the prefix sample with the SOURCE's random
    # stream (counter-based pcg4d makes the stored seed sufficient -- the
    # reference likewise replays from the reservoir's stored RNG state),
    # and the second path vertex x3 is stored so the replayed prefix can
    # RECONNECT there (hybrid shift: replay segment 1, reconnect at x3).
    SRCPIX = 25  # generating pixel id (exact in f32)
    SRCSEED = 26  # generating frame seed (u32 bitcast)
    PDFA = 27  # area pdf of x_rc given the generating pixel (Jacobian)
    HAS3 = 28  # x3 exists (suffix hit a surface)
    X3 = 29  # 3: second path vertex
    N3 = 32  # 3
    LE3 = 35  # 3: emission at x3 toward x2
    B3 = 38  # 3: x3 material
    M3 = 41
    R3 = 42
    WS3 = 43  # 3: suffix direction at x3
    LS3 = 46  # 3: pdf-folded suffix radiance beyond x3
    PDFS3 = 49  # area pdf of x3 given x2 (folded/area convention bridge)
    # rc-side transmission + coat (the reference re-evaluates the FULL
    # BSDF at the reconnection vertex incl. glass, IndirectLighting's
    # rc material data; eta is frozen at generation orientation)
    TRANS = 50
    ETA = 51
    COATW = 52
    COATR = 53
    # x3-side transmission + coat: the replay reconnect re-evaluates the
    # FULL BSDF at the stored second vertex too (glass/coated suffixes
    # survive replay; ior3 is recovered from eta3's magnitude)
    TRANS3 = 54
    ETA3 = 55
    COATW3 = 56
    COATR3 = 57
    ROWS = 58


@dataclass(frozen=True)
class ReSTIRPTConfig:
    temporal: bool = True
    m_max: float = 10.0  # reference IndirectLighting DefaultParamVals::M_MAX
    spatial_iterations: int = 1
    spatial_radius: int = 12
    depth_tolerance: float = 0.1
    normal_tolerance: float = 0.9
    # hybrid-shift reconnection validity (reference: distance + roughness
    # conditions before a reconnection shift is attempted)
    min_reconnect_dist: float = 0.05  # relative to primary-hit depth
    min_reconnect_rough: float = 0.1  # rc roughness below this -> no shift
    # Replay fallback (reference ReSTIR_PT_Replay): when the reconnection
    # at x2 is invalid at the destination, re-sample the first path segment
    # with the source's RNG stream (one closest-hit trace per merge) and
    # reconnect at the stored second vertex x3. False drops reuse instead
    # (unbiased either way; replay preserves reuse on glossy/near rc).
    replay: bool = True
    # Testing hook: route EVERY merge through the replay shift (case A
    # treated as invalid) so the replay path can be validated end-to-end.
    force_replay: bool = False
    full_target: bool = False  # see restir_di.ReSTIRConfig.full_target
    sort_suffix: bool = True  # reorder suffix rays by (material, octant)
    packed_reuse: bool = True  # see restir_di.ReSTIRConfig.packed_reuse
    # Spatial search (reference ReSTIR_PT_SpatialSearch kernel): probe up
    # to this many candidate neighbors with the CHEAP 5-row geometry
    # table and reuse the first that passes the reuse-validity test, so
    # pixels at depth/normal edges still find a partner. 1 = single
    # random neighbor (no search). Each extra probe costs one image-wide
    # gather (~2.5 ms at 512^2 on v5e), so this is quality-tier opt-in.
    spatial_search: int = 1
    # see restir_gi.ReSTIRGIConfig.boiling_suppression (the reference also
    # applies it in the ReSTIR PT temporal chain, ReSTIR_PT_Reconnect_StC)
    boiling_suppression: bool = True


def _surf(gbuf, trans=False, coat=False):
    from .restir_di import _surface_from_gbuf

    pos, ns, ng, wo, mat, valid = _surface_from_gbuf(gbuf, trans, coat)
    frame = S.make_frame(ns)
    return pos, ns, ng, wo, mat, frame, valid


def _rc_mat(res, trans=False, coat=False):
    """Reconnection-vertex material from reservoir rows. ``trans``/``coat``
    statically include the transmission / coat lobes (glass suffixes can be
    re-evaluated under shifts, the reference's rc material data); the
    relative IOR is frozen at the generation orientation."""
    return S.MatSoA(
        base=v3.from_rows(res, PR.BASE),
        metallic=res[PR.METAL],
        roughness=res[PR.ROUGH],
        ior=jnp.full_like(res[PR.METAL], 1.5),
        transmission=res[PR.TRANS] if trans else None,
        eta=res[PR.ETA] if trans else None,
        coat=res[PR.COATW] if coat else None,
        coat_roughness=res[PR.COATR] if coat else None,
    )


def _phat_pt(surf, res, full=False, trans=False, coat=False):
    """Target + shading factors of a path sample re-anchored at ``surf``.

    Returns (phat, f1 [V3], lout [V3], geom, wi [V3], dist2).
    phat is the area-measure target: lum(f1 * L_out) * cos1 * cos_rc / d^2.
    """
    pos, ns, ng, wo, mat, frame, valid = surf
    x_rc = v3.from_rows(res, PR.X)
    n_rc = v3.from_rows(res, PR.N)
    le = v3.from_rows(res, PR.LE)
    w_s = v3.from_rows(res, PR.WS)
    l_s = v3.from_rows(res, PR.LS)

    to = x_rc - pos
    dist2 = jnp.maximum(v3.dot(to, to), 1e-12)
    inv = jax.lax.rsqrt(dist2)
    wi = to * inv
    cos1 = v3.dot(wi, ns)
    cos_rc_raw = -v3.dot(wi, n_rc)
    # transmissive rc: the destination may view the vertex from the
    # transmission side (glass reconnection re-evaluates through the lobe)
    cos_rc = jnp.abs(cos_rc_raw) if trans else jnp.maximum(cos_rc_raw, 0.0)

    # pixel-side BSDF (approx target unless full; shade always passes full)
    if full:
        f1, _ = S.bsdf_eval(mat, frame.to_local(wo), frame.to_local(wi))
    else:
        inv_pi = 0.3183098861
        f1 = V3(
            (mat.base.x + 0.04) * inv_pi,
            (mat.base.y + 0.04) * inv_pi,
            (mat.base.z + 0.04) * inv_pi,
        )

    # reconnection-vertex BSDF re-evaluated for the shifted incoming
    # direction (always the real lobe: it is part of the integrand)
    rc_frame = S.make_frame(n_rc)
    f_rc, _ = S.bsdf_eval(
        _rc_mat(res, trans, coat),
        rc_frame.to_local(V3(-wi.x, -wi.y, -wi.z)),
        rc_frame.to_local(w_s),
    )
    lout = le + f_rc * l_s

    geom = cos1 * cos_rc / dist2
    phat = jnp.maximum(v3.luminance(f1 * lout) * geom, 0.0)
    ok = cos1 > 1e-6
    return jnp.where(ok, phat, 0.0), f1, lout, geom, wi, dist2


def _shift_valid(surf, res, cfg: ReSTIRPTConfig):
    """Hybrid-shift reconnection conditions at the destination pixel: the
    reconnection vertex must stay far enough (relative to the generating
    pixel's connection length) and the rc lobe rough enough -- otherwise
    the reconnection shift is ill-conditioned (the reference replays those
    paths instead; here the shifted target is 0, which is unbiased)."""
    pos = surf[0]
    x_rc = v3.from_rows(res, PR.X)
    to = x_rc - pos
    dist = jnp.sqrt(jnp.maximum(v3.dot(to, to), 1e-12))
    far_enough = dist > cfg.min_reconnect_dist * jnp.maximum(res[PR.DIST], 1e-3)
    rough_enough = res[PR.ROUGH] >= cfg.min_reconnect_rough
    return far_enough & rough_enough


def _sort_perm(keys):
    """Stable ascending permutation + its inverse."""
    perm = jnp.argsort(keys)
    inv = jnp.zeros_like(perm).at[perm].set(jnp.arange(perm.shape[0], dtype=perm.dtype))
    return perm, inv


def initial_samples(
    scene, gbuf, key, pt_cfg, seed, cfg: ReSTIRPTConfig,
    trans=False, coat=False, pix=None, pix0=0, rt=1024,
    textures=None, spread_angle=0.0,
):
    """Generate one path sample per pixel and wrap it in a reservoir.

    Prefix: BSDF sample at the primary hit -> closest hit = reconnection
    vertex. Suffix: BSDF sample at rc -> L_raw = trace (emission at the
    first suffix hit included with MIS weight 1, NEE beyond -- exactly the
    PT estimator restarted at rc). Escaped prefix rays become far-sphere
    sky vertices (Le = sky radiance, empty suffix).
    """
    from ..accel.intersect import (
        intersect_closest_shaded,
        intersect_closest_shaded_dense,
    )
    from ..core.rng import uniform4
    from ..scene.scene import A
    from .pathtracer import trace

    # VMEM-resident scenes: the pure-XLA dense trace fuses into the frame
    # (the trace-only Pallas kernel costs ~7x its standalone price
    # mid-frame -- see intersect_closest_shaded_dense)
    if scene.cluster_aabb is None and not scene.has_cutout:
        closest = lambda oo, dd: intersect_closest_shaded_dense(scene, oo, dd)
    else:
        closest = lambda oo, dd: intersect_closest_shaded(scene, oo, dd)

    n = gbuf.shape[1]
    pos, ns, ng, wo, mat, frame, valid = _surf(gbuf, trans, coat)
    wo_l = frame.to_local(wo)
    if pix is None:
        pix = jnp.arange(n, dtype=jnp.int32)

    # -- prefix: BSDF direction at the primary hit
    u = uniform4(pix, 201, seed, salt=0x9717)
    wi_l, _, pdf_sa = S.bsdf_sample(mat, wo_l, u[0], u[1], u[2])
    wi = frame.to_world(wi_l)
    live = valid & (pdf_sa > 0.0) & (v3.dot(wi, ng) > 1e-6)

    o2 = v3.aos3((pos + ng * _EPS_RAY))
    d2 = v3.aos3(wi)
    sh = closest(o2, d2)
    hit = sh.valid & live
    at = sh.attrs.T
    x_rc = V3(*(o2 + sh.t[:, None] * d2).T)
    n_raw = v3.from_rows(at, A.NG)
    front = -v3.dot(V3(*d2.T), n_raw) > 0.0
    sgn = jnp.where(front, 1.0, -1.0)
    n_rc = n_raw * sgn
    # NO emission at the reconnection vertex: bounce-1 emission is direct
    # light and the ReSTIR DI pass owns it (same composition as restir_gi /
    # the pt indirect trace's min_emissive_bounce=2)
    zero_n = jnp.zeros(n)
    le = V3(zero_n, zero_n, zero_n)
    rc_base = v3.from_rows(at, A.BASE)
    rc_metal = at[A.METAL]
    rc_rough = at[A.ROUGH]
    if textures:
        # secondary-vertex texturing (RT.hlsli per-vertex map fetches):
        # base color at the reconnection vertex with ray-cone mips
        from ..scene.textures import base_color_at

        w0b = 1.0 - sh.u - sh.v
        uv_rc = jnp.stack([
            w0b * at[A.UV0] + sh.u * at[A.UV1] + sh.v * at[A.UV2],
            w0b * at[A.UV0 + 1] + sh.u * at[A.UV1 + 1] + sh.v * at[A.UV2 + 1],
        ], -1)
        cone_rc = (gbuf[G.DEPTH] + sh.t) * spread_angle
        f_rc_tex = base_color_at(
            textures, uv_rc, jnp.where(sh.valid, at[A.TEXID], -1.0),
            cone_rc, at[A.UVDENS],
        )
        if f_rc_tex is not None:
            rc_base = V3(rc_base.x * f_rc_tex[0], rc_base.y * f_rc_tex[1],
                         rc_base.z * f_rc_tex[2])

    # -- suffix: BSDF sample at rc, then the first suffix vertex x3 is
    # resolved EXPLICITLY (closest hit + local shading) so its data can be
    # stored for the replay shift's reconnect-at-x3 case; only the radiance
    # beyond x3 is folded by a recursive trace. NEE at x3 is disabled
    # (min_nee_bounce shifts one vertex deeper): its contribution depends
    # on the incoming direction, which a shifted prefix changes -- exactly
    # the term that cannot be frozen (the reference's replay re-traces it).
    rc_ior = jnp.maximum(at[A.IOR], 1.01)
    rc_trans = at[A.TRANS]
    rc_eta = jnp.where(front, 1.0 / rc_ior, rc_ior)
    rc_coatw = at[A.COATW]
    rc_coatr = at[A.COATR]
    rc_mat = S.MatSoA(
        base=rc_base, metallic=rc_metal, roughness=rc_rough, ior=rc_ior,
        transmission=rc_trans if trans else None,
        eta=rc_eta if trans else None,
        coat=rc_coatw if coat else None,
        coat_roughness=rc_coatr if coat else None,
    )
    rc_frame = S.make_frame(n_rc)
    wo_rc_l = rc_frame.to_local(V3(-wi.x, -wi.y, -wi.z))
    u2 = uniform4(pix, 202, seed, salt=0x5F17)
    ws_l, _, pdf_s = S.bsdf_sample(rc_mat, wo_rc_l, u2[0], u2[1], u2[2])
    w_s = rc_frame.to_world(ws_l)
    # transmitted suffixes leave below the surface (glass reconnection)
    ws_down = ws_l.z < 0.0
    side_s = v3.dot(w_s, n_rc)
    suffix_ok = hit & (pdf_s > 0.0) & (
        (ws_down & (side_s < -1e-6)) | (~ws_down & (side_s > 1e-6))
    )
    offs_s = jnp.where(ws_down, -_EPS_RAY, _EPS_RAY)
    o3_v = x_rc + n_rc * offs_s
    o3 = v3.aos3(o3_v)
    d3 = v3.aos3(w_s)
    if cfg.sort_suffix:
        # genuine shader-execution reordering (the reference's Sort stage,
        # IndirectLighting ReSTIR_PT_Sort): group suffix rays by rc material
        # and direction octant so the trace wavefront is coherent
        octant = (
            (d3[:, 0] > 0).astype(jnp.int32)
            + 2 * (d3[:, 1] > 0).astype(jnp.int32)
            + 4 * (d3[:, 2] > 0).astype(jnp.int32)
        )
        keys = at[A.MATID].astype(jnp.int32) * 8 + octant
        perm, inv_perm = _sort_perm(keys)
    else:
        perm = inv_perm = None

    # x3 = first suffix hit (explicit)
    if perm is not None:
        sh3_p = closest(o3[perm], d3[perm])
        sh3 = jax.tree_util.tree_map(lambda a: a[inv_perm], sh3_p)
    else:
        sh3 = closest(o3, d3)
    at3 = sh3.attrs.T
    has3 = suffix_ok & sh3.valid
    x3 = V3(*(o3 + sh3.t[:, None] * d3).T)
    n3_raw = v3.from_rows(at3, A.NG)
    front3 = -v3.dot(V3(*d3.T), n3_raw) > 0.0
    n3 = n3_raw * jnp.where(front3, 1.0, -1.0)
    two3 = at3[A.DOUBLE] > 0.5
    le3_gain = jnp.where(has3 & (two3 | front3), 1.0, 0.0)
    le3 = v3.from_rows(at3, A.EMISS) * le3_gain
    b3 = v3.from_rows(at3, A.BASE)
    m3 = at3[A.METAL]
    r3 = at3[A.ROUGH]
    if textures:
        w0c = 1.0 - sh3.u - sh3.v
        uv_3 = jnp.stack([
            w0c * at3[A.UV0] + sh3.u * at3[A.UV1] + sh3.v * at3[A.UV2],
            w0c * at3[A.UV0 + 1] + sh3.u * at3[A.UV1 + 1]
            + sh3.v * at3[A.UV2 + 1],
        ], -1)
        cone_3 = (gbuf[G.DEPTH] + sh.t + sh3.t) * spread_angle
        f_3_tex = base_color_at(
            textures, uv_3, jnp.where(sh3.valid, at3[A.TEXID], -1.0),
            cone_3, at3[A.UVDENS],
        )
        if f_3_tex is not None:
            b3 = V3(b3.x * f_3_tex[0], b3.y * f_3_tex[1], b3.z * f_3_tex[2])

    # suffix continuation at x3 (stream 203) + folded radiance beyond
    mat3 = S.MatSoA(base=b3, metallic=m3, roughness=r3,
                    ior=jnp.maximum(at3[A.IOR], 1.01))
    frame3 = S.make_frame(n3)
    wo3_l = frame3.to_local(V3(*(-d3).T))
    u3 = uniform4(pix, 203, seed, salt=0x3A19)
    ws3_l, _, pdf3 = S.bsdf_sample(mat3, wo3_l, u3[0], u3[1], u3[2])
    ws3 = frame3.to_world(ws3_l)
    suffix3_ok = has3 & (pdf3 > 0.0) & (v3.dot(ws3, n3) > 1e-6)
    o4 = v3.aos3((x3 + n3 * _EPS_RAY))
    d4 = v3.aos3(ws3)
    l4_cfg = replace(
        pt_cfg,
        max_bounces=max(pt_cfg.max_bounces - 3, 0),
        min_emissive_bounce=0,
        min_nee_bounce=0,
    )
    if pt_cfg.max_bounces >= 3:
        if perm is not None:
            l4 = trace(
                scene, o4[perm], d4[perm], key, l4_cfg, pix0=pix0, rt=rt,
                textures=textures, spread_angle=spread_angle,
            )[inv_perm]
        else:
            l4 = trace(
                scene, o4, d4, key, l4_cfg, pix0=pix0, rt=rt,
                textures=textures, spread_angle=spread_angle,
            )
    else:
        l4 = jnp.zeros((n, 3))
    cos3 = jnp.maximum(v3.dot(ws3, n3), 0.0)
    gain3 = jnp.where(suffix3_ok, cos3 / jnp.maximum(pdf3, 1e-12), 0.0)
    ls3 = V3(l4[:, 0] * gain3, l4[:, 1] * gain3, l4[:, 2] * gain3)

    # L_s at the rc vertex: (Le3 + f3 * Ls3) folded by the rc sample pdf
    f3, _ = S.bsdf_eval(mat3, wo3_l, ws3_l)
    lout3 = le3 + f3 * ls3
    cos_s = jnp.abs(v3.dot(w_s, n_rc))
    gain_s = jnp.where(suffix_ok, cos_s / jnp.maximum(pdf_s, 1e-12), 0.0)
    l_s = V3(lout3.x * gain_s, lout3.y * gain_s, lout3.z * gain_s)
    zero = jnp.zeros(n)
    l_s = v3.where(has3, l_s, V3(zero, zero, zero))
    if pt_cfg.sky is not None:
        # suffix first segment escaped: sky radiance (+ sun disk, matching
        # the trace oracle's bounce-0 miss on a specular-counted ray)
        from . import sky as SK

        sky_s = suffix_ok & ~sh3.valid
        env_s = SK.sky_radiance(V3(*d3.T), pt_cfg.sky, with_disk=False)
        disk_s = SK.sun_disk(d3, pt_cfg.sky)
        l_sky = V3(
            (env_s.x + disk_s[:, 0]) * gain_s,
            (env_s.y + disk_s[:, 1]) * gain_s,
            (env_s.z + disk_s[:, 2]) * gain_s,
        )
        l_s = v3.where(sky_s, l_sky, l_s)

    # -- escaped prefix rays: sky vertex on the far sphere
    if pt_cfg.sky is not None:
        from . import sky as SK

        sky_miss = live & ~sh.valid
        env = SK.sky_radiance(V3(*d2.T), pt_cfg.sky, with_disk=False)
        wi_v = V3(*d2.T)
        x_rc = v3.where(sky_miss, V3(*(o2.T)) + wi_v * SKY_DIST, x_rc)
        n_rc = v3.where(sky_miss, -wi_v, n_rc)
        le = v3.where(sky_miss, env, le)
        zero = jnp.zeros(n)
        l_s = v3.where(sky_miss, V3(zero, zero, zero), l_s)
        rc_rough = jnp.where(sky_miss, 1.0, rc_rough)
        hit = hit | sky_miss

    # Build the reservoir rows with ONE stacked write per stage (see
    # core/rows.py). phat is evaluated on the geometric/material subset
    # exactly as the reference's target uses only rc-side state.
    to = x_rc - pos
    vals = {}
    set3(vals, PR.X, x_rc)
    set3(vals, PR.N, n_rc)
    set3(vals, PR.LE, le)
    set3(vals, PR.WS, w_s)
    set3(vals, PR.LS, l_s)
    set3(vals, PR.BASE, rc_base)
    vals[PR.METAL] = rc_metal
    vals[PR.ROUGH] = rc_rough
    vals[PR.DIST] = jnp.sqrt(jnp.maximum(v3.dot(to, to), 1e-12))
    res_phat = stack_rows(PR.ROWS, vals, n=n)

    surf = (pos, ns, ng, wo, mat, frame, valid)
    phat, *_ = _phat_pt(surf, res_phat, full=cfg.full_target, trans=trans, coat=coat)
    # source pdf in area measure (prefix BSDF pdf projected onto rc)
    dist2 = jnp.maximum(v3.dot(to, to), 1e-12)
    cos_rc = jnp.maximum(-v3.dot(to * jax.lax.rsqrt(dist2), n_rc), 1e-6)
    pdf_area = pdf_sa * cos_rc / dist2
    w = jnp.where(hit & (pdf_area > 0.0), phat / jnp.maximum(pdf_area, 1e-12), 0.0)
    big_w = jnp.where(phat > 0.0, w / jnp.maximum(phat, 1e-12), 0.0)
    vals[PR.WSUM] = w
    vals[PR.M] = jnp.where(hit, 1.0, 0.0)
    vals[PR.W] = big_w
    vals[PR.PHAT] = phat

    # replay-shift identity + the second vertex (reconnect-at-x3 target)
    vals[PR.SRCPIX] = pix.astype(jnp.float32)
    vals[PR.SRCSEED] = jax.lax.bitcast_convert_type(
        jnp.full((n,), jnp.asarray(seed).astype(jnp.uint32)), jnp.float32
    )
    vals[PR.PDFA] = jnp.where(hit, pdf_area, 0.0)
    vals[PR.HAS3] = has3.astype(jnp.float32)
    set3(vals, PR.X3, x3)
    set3(vals, PR.N3, n3)
    set3(vals, PR.LE3, le3)
    set3(vals, PR.B3, b3)
    vals[PR.M3] = m3
    vals[PR.R3] = r3
    set3(vals, PR.WS3, ws3)
    set3(vals, PR.LS3, ls3)
    # p_A(x3 | x2): converts this sample's pdf-folded suffix convention to
    # the area convention the replay shift evaluates in (see _merge)
    to23 = x3 - x_rc
    d23_2 = jnp.maximum(v3.dot(to23, to23), 1e-12)
    cos3_to2 = jnp.maximum(jnp.abs(v3.dot(to23 * jax.lax.rsqrt(d23_2), n3)), 1e-6)
    pdfs3 = pdf_s * cos3_to2 / d23_2
    vals[PR.PDFS3] = jnp.where(has3, pdfs3, 0.0)
    vals[PR.TRANS] = rc_trans
    vals[PR.ETA] = rc_eta
    vals[PR.COATW] = rc_coatw
    vals[PR.COATR] = rc_coatr
    ior3 = jnp.maximum(at3[A.IOR], 1.01)
    vals[PR.TRANS3] = at3[A.TRANS]
    vals[PR.ETA3] = jnp.where(front3, 1.0 / ior3, ior3)
    vals[PR.COATW3] = at3[A.COATW]
    vals[PR.COATR3] = at3[A.COATR]
    return stack_rows(PR.ROWS, vals, n=n)


def _replay_shift(scene, surf, res_b, cfg: ReSTIRPTConfig, trans=False, coat=False):
    """Replay + reconnect-at-x3 shift (reference ReSTIR_PT_Replay).

    Re-samples the candidate's FIRST path segment at the destination
    surface with the candidate's own RNG stream (SRCPIX/SRCSEED rows --
    counter-based pcg4d makes the stored seed a full replay state, like
    the reference replaying from the reservoir's RNG), traces one closest
    hit to find the replayed vertex x2', and reconnects x2' to the stored
    second vertex x3. Any reservoir with HAS3 set replays: fresh paths,
    case-B (replay-taken) paths whose identity re-anchored, and case-A
    (reconnection-taken) paths whose rows are verbatim copies of the
    fresh state -- matching the reference's chained replays
    (IndirectLighting.h:32-52).

    Returns (phat_B, w_factor, rows_B, ok_B):
      phat_B   area-convention target of the replayed path at this pixel
      w_factor multiplies W_b * m_b in the resampling weight:
               J * (1 / PDFS3) with J = p_A(x2'|dest) / p_A(x2|src)
      rows_B   the re-canonicalized reservoir rows of the replayed path
      ok_B     shift validity
    """
    from ..accel.intersect import intersect_closest_shaded
    from ..core.rng import uniform4
    from ..scene.scene import A

    pos, ns, ng, wo, mat, frame, valid = surf
    n = res_b.shape[1]
    src_pix = res_b[PR.SRCPIX].astype(jnp.int32)
    src_seed = jax.lax.bitcast_convert_type(res_b[PR.SRCSEED], jnp.uint32)
    u = uniform4(src_pix, 201, src_seed, salt=0x9717)
    wo_l = frame.to_local(wo)
    wi_l, _, pdf_sa = S.bsdf_sample(mat, wo_l, u[0], u[1], u[2])
    wi = frame.to_world(wi_l)
    live = (
        valid & (res_b[PR.HAS3] > 0.5) & (res_b[PR.PDFA] > 0.0)
        & (pdf_sa > 0.0) & (v3.dot(wi, ng) > 1e-6)
    )
    o2 = v3.aos3((pos + ng * _EPS_RAY))
    d2 = v3.aos3(wi)
    if scene.cluster_aabb is None and not scene.has_cutout:
        # VMEM-resident scene: the PURE-XLA dense trace fuses into the
        # frame; the trace-only Pallas kernel costs ~7x its standalone
        # price mid-frame (290 -> 74.6 ms/frame, see
        # intersect_closest_shaded_dense)
        from ..accel.intersect import intersect_closest_shaded_dense

        sh = intersect_closest_shaded_dense(scene, o2, d2)
    else:
        sh = intersect_closest_shaded(scene, o2, d2)
    hit = sh.valid & live
    at = sh.attrs.T
    x2p = V3(*(o2 + sh.t[:, None] * d2).T)
    n2_raw = v3.from_rows(at, A.NG)
    front2 = -v3.dot(V3(*d2.T), n2_raw) > 0.0
    n2 = n2_raw * jnp.where(front2, 1.0, -1.0)

    # reconnection x2' -> x3 (stored second vertex)
    x3 = v3.from_rows(res_b, PR.X3)
    n3 = v3.from_rows(res_b, PR.N3)
    le3 = v3.from_rows(res_b, PR.LE3)
    ws3 = v3.from_rows(res_b, PR.WS3)
    ls3 = v3.from_rows(res_b, PR.LS3)
    to3 = x3 - x2p
    d23_2 = jnp.maximum(v3.dot(to3, to3), 1e-12)
    inv23 = jax.lax.rsqrt(d23_2)
    dir23 = to3 * inv23
    cos2_raw = v3.dot(dir23, n2)  # at x2' toward x3
    # transmissive x2': the reconnection may exit the back side
    cos2 = jnp.abs(cos2_raw) if trans else cos2_raw
    cos3 = jnp.maximum(-v3.dot(dir23, n3), 0.0)  # at x3 toward x2'
    to_q = x2p - pos
    dq2 = jnp.maximum(v3.dot(to_q, to_q), 1e-12)
    dist_q = jnp.sqrt(dq2)
    dist23 = jnp.sqrt(d23_2)
    # hybrid conditions at the NEW reconnection vertex pair
    far3 = dist23 > cfg.min_reconnect_dist * jnp.maximum(dist_q, 1e-3)
    rough2 = at[A.ROUGH] >= cfg.min_reconnect_rough
    ok = hit & far3 & rough2 & (cos2 > 1e-6) & (cos3 > 1e-6)

    # BSDF at x2' for (in from pixel, out to x3)
    ior2 = jnp.maximum(at[A.IOR], 1.01)
    front2b = -v3.dot(V3(*d2.T), v3.from_rows(at, A.NG)) > 0.0
    mat2 = S.MatSoA(
        base=v3.from_rows(at, A.BASE), metallic=at[A.METAL],
        roughness=at[A.ROUGH], ior=ior2,
        transmission=at[A.TRANS] if trans else None,
        eta=jnp.where(front2b, 1.0 / ior2, ior2) if trans else None,
        coat=at[A.COATW] if coat else None,
        coat_roughness=at[A.COATR] if coat else None,
    )
    frame2 = S.make_frame(n2)
    f2, _ = S.bsdf_eval(
        mat2, frame2.to_local(V3(-wi.x, -wi.y, -wi.z)), frame2.to_local(dir23)
    )
    # BSDF at x3 for (in from x2', out to the stored suffix) -- full
    # material incl. transmission/coat (ior recovered from |eta|)
    eta3 = res_b[PR.ETA3]
    ior3 = jnp.maximum(
        jnp.maximum(eta3, 1.0 / jnp.maximum(eta3, 1e-3)), 1.01
    )
    mat3 = S.MatSoA(
        base=v3.from_rows(res_b, PR.B3), metallic=res_b[PR.M3],
        roughness=res_b[PR.R3], ior=ior3,
        transmission=res_b[PR.TRANS3] if trans else None,
        eta=eta3 if trans else None,
        coat=res_b[PR.COATW3] if coat else None,
        coat_roughness=res_b[PR.COATR3] if coat else None,
    )
    frame3 = S.make_frame(n3)
    f3, _ = S.bsdf_eval(
        mat3, frame3.to_local(V3(-dir23.x, -dir23.y, -dir23.z)),
        frame3.to_local(ws3),
    )
    lout3 = le3 + f3 * ls3

    # area-convention target: f1 * f2' * Lout3 * G(q,x2') * G(x2',x3)
    wi_v = wi
    cos1 = v3.dot(wi_v, ns)
    cos_rc = jnp.maximum(-v3.dot(wi_v, n2), 0.0)
    if cfg.full_target:
        f1, _ = S.bsdf_eval(mat, wo_l, wi_l)
    else:
        inv_pi = 0.3183098861
        f1 = V3((mat.base.x + 0.04) * inv_pi, (mat.base.y + 0.04) * inv_pi,
                (mat.base.z + 0.04) * inv_pi)
    g_q2 = cos1 * cos_rc / dq2
    g_23 = cos2 * cos3 / d23_2
    phat_b = jnp.maximum(v3.luminance(f1 * f2 * lout3) * g_q2 * g_23, 0.0)
    phat_b = jnp.where(ok & (cos1 > 1e-6), phat_b, 0.0)

    # weight factor: replay Jacobian x folded->area convention bridge
    pdfa_new = pdf_sa * cos_rc / dq2
    jac = pdfa_new / jnp.maximum(res_b[PR.PDFA], 1e-20)
    w_factor = jnp.where(
        ok, jac / jnp.maximum(res_b[PR.PDFS3], 1e-20), 0.0
    )

    # re-canonicalized rows: rc = x2', area-folded suffix via x3.
    # LE stays 0 (bounce-1 emission belongs to the DI pass). ONE stacked
    # write -- see core/rows.py for why chained .at[].set is pathological.
    ls_new = lout3 * g_23  # so _phat_pt's f_rc*LS*G(r,x2') is the area target
    vals = {}
    set3(vals, PR.X, x2p)
    set3(vals, PR.N, n2)
    set3(vals, PR.WS, dir23)
    set3(vals, PR.LS, ls_new)
    set3(vals, PR.BASE, mat2.base)
    vals[PR.METAL] = mat2.metallic
    vals[PR.ROUGH] = mat2.roughness
    vals[PR.DIST] = dist_q
    vals[PR.TRANS] = at[A.TRANS]
    vals[PR.ETA] = jnp.where(front2b, 1.0 / ior2, ior2)
    vals[PR.COATW] = at[A.COATW]
    vals[PR.COATR] = at[A.COATR]
    # The replayed path IS the stream-generated path at this pixel, so its
    # replay identity stays valid: a later pixel may replay it AGAIN
    # (g_q(stream) -> g_r(stream) is a primary-sample-space copy with
    # Jacobian pdfa_r / pdfa_q). Carry the identity + frozen x3 suffix
    # forward; PDFA re-anchors to this pixel and PDFS3 becomes 1 (the
    # folded->area bridge was consumed by this shift -- W is henceforth
    # computed against the area-convention target). Reconnection (case-A)
    # takes keep their rows verbatim in _merge, so they stay eligible too.
    vals[PR.SRCPIX] = res_b[PR.SRCPIX]
    vals[PR.SRCSEED] = res_b[PR.SRCSEED]
    vals[PR.PDFA] = jnp.where(ok, pdfa_new, 0.0)
    vals[PR.PDFS3] = jnp.where(ok, 1.0, 0.0)
    vals[PR.HAS3] = ok.astype(jnp.float32)
    set3(vals, PR.X3, x3)
    set3(vals, PR.N3, n3)
    set3(vals, PR.LE3, le3)
    set3(vals, PR.B3, v3.from_rows(res_b, PR.B3))
    vals[PR.M3] = res_b[PR.M3]
    vals[PR.R3] = res_b[PR.R3]
    set3(vals, PR.WS3, ws3)
    set3(vals, PR.LS3, ls3)
    vals[PR.TRANS3] = res_b[PR.TRANS3]
    vals[PR.ETA3] = res_b[PR.ETA3]
    vals[PR.COATW3] = res_b[PR.COATW3]
    vals[PR.COATR3] = res_b[PR.COATR3]
    rows = stack_rows(PR.ROWS, vals, n=n)
    return phat_b, w_factor, rows, ok


def _merge(res_a, res_b, surf, u, cfg: ReSTIRPTConfig, m_cap=None, scene=None,
           trans=False, coat=False):
    """GRIS combine with the hybrid shift: reconnection at the stored rc
    vertex when the conditions hold at this pixel, else (cfg.replay, with
    ``scene`` provided) replay-and-reconnect-at-x3; invalid shifts
    contribute 0 (unbiased)."""
    valid = surf[6]
    m_b = res_b[PR.M]
    if m_cap is not None:
        m_b = jnp.minimum(m_b, m_cap)
    phat_b, *_ = _phat_pt(surf, res_b, full=cfg.full_target, trans=trans, coat=coat)
    shift_a = _shift_valid(surf, res_b, cfg)
    if cfg.force_replay:
        shift_a = shift_a & jnp.zeros_like(shift_a)
    phat_b = jnp.where(shift_a, phat_b, 0.0)
    w_b = jnp.where(valid, phat_b * res_b[PR.W] * m_b, 0.0)

    use_replay = cfg.replay and scene is not None
    if use_replay:
        phat_r, w_factor, rows_r, ok_r = _replay_shift(
            scene, surf, res_b, cfg, trans=trans, coat=coat
        )
        case_b = ~shift_a & ok_r
        phat_b = jnp.where(case_b, phat_r, phat_b)
        w_b = jnp.where(
            case_b & valid, phat_r * res_b[PR.W] * w_factor * m_b, w_b
        )

    w_sum = res_a[PR.WSUM] + w_b
    take = u * w_sum < w_b
    out = jnp.where(take[None, :], res_b, res_a)
    if use_replay:
        # case-B takes store the re-canonicalized (replayed) path, which
        # carries a still-valid replay identity (see _replay_shift)
        tb = take & case_b
        out = jnp.where(tb[None, :], rows_r, out)
    # A case-A (reconnection) take keeps res_b's rows VERBATIM: the shift
    # is identity on the path vertices (area-Jacobian 1), so the stored
    # replay identity (SRCPIX/SRCSEED), the x3 suffix block, and the
    # densities (PDFA in the source stream's measure, PDFS3 bridge) remain
    # exactly the fresh path's state -- the path stays replay-eligible like
    # the reference's deeper chains (IndirectLighting.h:32-52). A later
    # replay re-maps the source u through the new pixel's BSDF with
    # jac = pdfa_new / PDFA(stored), well-defined for any holder pixel.
    y_phat = jnp.where(take, phat_b, res_a[PR.PHAT])
    m_new = res_a[PR.M] + m_b
    big_w = jnp.where(
        y_phat > 0.0, w_sum / jnp.maximum(m_new * y_phat, 1e-12), 0.0
    )
    return stack_rows(PR.ROWS, {
        PR.WSUM: w_sum, PR.M: m_new, PR.W: big_w, PR.PHAT: y_phat,
    }, like=out)


def temporal_reuse(
    res, prev_res, prev_gbuf, gbuf, prev_cam, width, height, seed, cfg,
    trans=False, coat=False, pix=None, prev_row0=0, prev_rows=None,
    pos_prev=None, band=None, scene=None, prefetch=None,
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
            from .reservoir_pack import PT_PACKED_ROWS, pack_pt, unpack_pt

            src = prev_res if prev_res.shape[0] == PT_PACKED_ROWS else pack_pt(prev_res)
            (prev_p, prev_g), okb = _take_multi(
                [src, prev_gbuf], idx, band, width, height, prev_row0
            )
            prev_r = unpack_pt(prev_p)
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
    prev_r = stack_rows(PR.ROWS, {
        PR.M: jnp.where(ok, prev_r[PR.M], 0.0),
        PR.W: jnp.where(ok, prev_r[PR.W], 0.0),
    }, like=prev_r)
    if pix is None:
        pix = jnp.arange(n, dtype=jnp.int32)
    u = uniform4(pix, 203, seed, salt=0x4A31)[0]
    out = _merge(res, prev_r, surf, u, cfg, m_cap=cfg.m_max, scene=scene,
                 trans=trans, coat=coat)
    if cfg.boiling_suppression:
        from .restir_gi import suppress_outlier_reservoirs

        out = suppress_outlier_reservoirs(
            out, w_sum_row=PR.WSUM, m_row=PR.M
        )
    return out


def spatial_step(
    res, gbuf, width, height, seed, it, cfg,
    trans=False, coat=False, pix=None, res_src=None, gbuf_src=None, src_row0=0,
    band=None, scene=None,
):
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
    x = pix % width
    y = pix // width
    u = uniform4(pix, 204 + it, seed, salt=0x77A1)

    def pick(uu, vv):
        r = cfg.spatial_radius * jnp.sqrt(uu)
        phi = 2.0 * jnp.pi * vv
        nx = jnp.clip(
            x + jnp.round(r * jnp.cos(phi)).astype(jnp.int32), 0, width - 1
        )
        ny = jnp.clip(
            y + jnp.round(r * jnp.sin(phi)).astype(jnp.int32), 0, height - 1
        )
        return (ny - src_row0) * width + nx

    nidx = pick(u[0], u[1])
    from .restir_di import _take_multi, geom_ok_slim, geom_table

    if band is not None:
        band = (band[0], max(band[1], cfg.spatial_radius))

    if cfg.spatial_search > 1:
        # ReSTIR_PT_SpatialSearch: probe candidates with the cheap
        # geometry table; keep the first valid neighbor per pixel
        gt_src = geom_table(gbuf_src)
        (g0,), okb0 = _take_multi([gt_src], nidx, band, width, height,
                                  src_row0)
        found = geom_ok_slim(gbuf, g0, ns, cfg)
        if okb0 is not None:
            found = found & okb0
        for k in range(1, cfg.spatial_search):
            uk = uniform4(pix, 204 + it, seed, salt=0x77A1 + k * 0x1013)
            cand = pick(uk[0], uk[1])
            (gk,), okbk = _take_multi([gt_src], cand, band, width, height,
                                      src_row0)
            ok_k = geom_ok_slim(gbuf, gk, ns, cfg)
            if okbk is not None:
                ok_k = ok_k & okbk
            nidx = jnp.where(~found & ok_k, cand, nidx)
            found = found | ok_k
    if cfg.packed_reuse:
        from .reservoir_pack import pack_pt, unpack_pt

        (nb_p, nb_geom), okb = _take_multi(
            [pack_pt(res_src), geom_table(gbuf_src)], nidx, band, width,
            height, src_row0,
        )
        nb = unpack_pt(nb_p)
    else:
        (nb, nb_geom), okb = _take_multi(
            [res_src, geom_table(gbuf_src)], nidx, band, width, height,
            src_row0,
        )
    ok = geom_ok_slim(gbuf, nb_geom, ns, cfg)
    if okb is not None:
        ok = ok & okb
    nb = stack_rows(PR.ROWS, {
        PR.M: jnp.where(ok, nb[PR.M], 0.0),
        PR.W: jnp.where(ok, nb[PR.W], 0.0),
    }, like=nb)
    return _merge(res, nb, surf, u[2], cfg, scene=scene, trans=trans,
                  coat=coat)


def spatial_reuse(res, gbuf, width, height, seed, cfg, trans=False, coat=False, pix=None, band=None, scene=None):
    out = res
    for it in range(cfg.spatial_iterations):
        if it:
            # materialize between iterations -- XLA otherwise fuses the
            # previous iteration's 58-row producer chain into this
            # iteration's gathers and recomputes it per consumer (see
            # render/frame.py restir_pt stage barriers: 232 -> 69 ms)
            out = jax.lax.optimization_barrier(out)
        out = spatial_step(
            out, gbuf, width, height, seed, it, cfg, trans, coat, pix,
            band=band, scene=scene,
        )
    return out


def shade(scene, res, gbuf, cfg: ReSTIRPTConfig, trans=False, coat=False, rows_out=False):
    """Path radiance of the surviving sample (+ reconnection visibility)."""
    from ..accel.intersect import intersect_occluded

    surf = _surf(gbuf, trans, coat)
    pos, ns, ng, wo, mat, frame, valid = surf
    phat, f1, lout, geom, wi, dist2 = _phat_pt(
        surf, res, full=True, trans=trans, coat=coat
    )
    big_w = res[PR.W]
    lit = valid & (phat > 0.0) & (big_w > 0.0)
    x_rc = v3.from_rows(res, PR.X)
    so = pos + ng * _EPS_RAY
    seg = x_rc - so
    occ = intersect_occluded(
        scene,
        v3.aos3(so),
        v3.aos3(seg),
        t_min=1e-3, t_max=1.0 - 1e-3,
    )
    gain = jnp.where(lit & ~occ, geom * big_w, 0.0)
    out = f1 * lout * gain
    ax = 0 if rows_out else -1
    return v3.aos3(out, ax)
