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
threshold) and the rc BSDF is rough enough -- otherwise the shifted target
is 0 and the candidate simply does not transfer (unbiased; the reference
falls back to random replay for those paths, which is a planned extension).

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
    ROWS = 32


@dataclass(frozen=True)
class ReSTIRPTConfig:
    temporal: bool = True
    m_max: float = 30.0
    spatial_iterations: int = 1
    spatial_radius: int = 12
    depth_tolerance: float = 0.1
    normal_tolerance: float = 0.9
    # hybrid-shift reconnection validity (reference: distance + roughness
    # conditions before a reconnection shift is attempted)
    min_reconnect_dist: float = 0.05  # relative to primary-hit depth
    min_reconnect_rough: float = 0.1  # rc roughness below this -> no shift
    full_target: bool = False  # see restir_di.ReSTIRConfig.full_target
    sort_suffix: bool = True  # reorder suffix rays by (material, octant)


def _surf(gbuf, trans=False, coat=False):
    from .restir_di import _surface_from_gbuf

    pos, ns, ng, wo, mat, valid = _surface_from_gbuf(gbuf, trans, coat)
    frame = S.make_frame(ns)
    return pos, ns, ng, wo, mat, frame, valid


def _rc_mat(res):
    """Reconnection-vertex material from reservoir rows (opaque GGX+diffuse;
    rc-side transmission/coat are a planned extension)."""
    return S.MatSoA(
        base=v3.from_rows(res, PR.BASE),
        metallic=res[PR.METAL],
        roughness=res[PR.ROUGH],
        ior=jnp.full_like(res[PR.METAL], 1.5),
    )


def _phat_pt(surf, res, full=False):
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
    cos_rc = jnp.maximum(-v3.dot(wi, n_rc), 0.0)

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
        _rc_mat(res), rc_frame.to_local(V3(-wi.x, -wi.y, -wi.z)),
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
):
    """Generate one path sample per pixel and wrap it in a reservoir.

    Prefix: BSDF sample at the primary hit -> closest hit = reconnection
    vertex. Suffix: BSDF sample at rc -> L_raw = trace (emission at the
    first suffix hit included with MIS weight 1, NEE beyond -- exactly the
    PT estimator restarted at rc). Escaped prefix rays become far-sphere
    sky vertices (Le = sky radiance, empty suffix).
    """
    from ..accel.intersect import intersect_closest_shaded
    from ..core.rng import uniform4
    from ..scene.scene import A
    from .pathtracer import trace

    n = gbuf.shape[1]
    pos, ns, ng, wo, mat, frame, valid = _surf(gbuf, trans, coat)
    wo_l = frame.to_local(wo)
    if pix is None:
        pix = jnp.arange(n, dtype=jnp.int32)

    # -- prefix: BSDF direction at the primary hit
    u = uniform4(pix, 201, seed, salt=0x9717)
    wi_l, _, pdf_sa = S.bsdf_sample(mat, wo_l, u[:, 0], u[:, 1], u[:, 2])
    wi = frame.to_world(wi_l)
    live = valid & (pdf_sa > 0.0) & (v3.dot(wi, ng) > 1e-6)

    o2 = jnp.stack([(pos + ng * _EPS_RAY).x, (pos + ng * _EPS_RAY).y,
                    (pos + ng * _EPS_RAY).z], -1)
    d2 = jnp.stack([wi.x, wi.y, wi.z], -1)
    sh = intersect_closest_shaded(scene, o2, d2)
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

    # -- suffix: BSDF sample at rc + L_raw trace
    rc_mat = S.MatSoA(base=rc_base, metallic=rc_metal, roughness=rc_rough,
                      ior=jnp.maximum(at[A.IOR], 1.01))
    rc_frame = S.make_frame(n_rc)
    wo_rc_l = rc_frame.to_local(V3(-wi.x, -wi.y, -wi.z))
    u2 = uniform4(pix, 202, seed, salt=0x5F17)
    ws_l, _, pdf_s = S.bsdf_sample(rc_mat, wo_rc_l, u2[:, 0], u2[:, 1], u2[:, 2])
    w_s = rc_frame.to_world(ws_l)
    suffix_ok = hit & (pdf_s > 0.0) & (v3.dot(w_s, n_rc) > 1e-6)

    o3 = jnp.stack([(x_rc + n_rc * _EPS_RAY).x, (x_rc + n_rc * _EPS_RAY).y,
                    (x_rc + n_rc * _EPS_RAY).z], -1)
    d3 = jnp.stack([w_s.x, w_s.y, w_s.z], -1)
    # suffix trace: emission at bounce 0 fully weighted (the suffix's first
    # segment was BSDF-sampled with no competing NEE at rc), NEE beyond
    l_cfg = replace(
        pt_cfg,
        max_bounces=max(pt_cfg.max_bounces - 2, 0),
        min_emissive_bounce=0,
        min_nee_bounce=0,
    )
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
        l_raw = trace(scene, o3[perm], d3[perm], key, l_cfg, pix0=pix0, rt=rt)[inv_perm]
    else:
        l_raw = trace(scene, o3, d3, key, l_cfg, pix0=pix0, rt=rt)
    cos_s = jnp.maximum(v3.dot(w_s, n_rc), 0.0)
    gain_s = jnp.where(suffix_ok, cos_s / jnp.maximum(pdf_s, 1e-12), 0.0)
    l_s = V3(l_raw[:, 0] * gain_s, l_raw[:, 1] * gain_s, l_raw[:, 2] * gain_s)

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

    res = jnp.zeros((PR.ROWS, n))
    res = res.at[PR.X].set(x_rc.x).at[PR.X + 1].set(x_rc.y).at[PR.X + 2].set(x_rc.z)
    res = res.at[PR.N].set(n_rc.x).at[PR.N + 1].set(n_rc.y).at[PR.N + 2].set(n_rc.z)
    res = res.at[PR.LE].set(le.x).at[PR.LE + 1].set(le.y).at[PR.LE + 2].set(le.z)
    res = res.at[PR.WS].set(w_s.x).at[PR.WS + 1].set(w_s.y).at[PR.WS + 2].set(w_s.z)
    res = res.at[PR.LS].set(l_s.x).at[PR.LS + 1].set(l_s.y).at[PR.LS + 2].set(l_s.z)
    res = res.at[PR.BASE].set(rc_base.x).at[PR.BASE + 1].set(rc_base.y)
    res = res.at[PR.BASE + 2].set(rc_base.z)
    res = res.at[PR.METAL].set(rc_metal).at[PR.ROUGH].set(rc_rough)
    to = x_rc - pos
    res = res.at[PR.DIST].set(jnp.sqrt(jnp.maximum(v3.dot(to, to), 1e-12)))

    surf = (pos, ns, ng, wo, mat, frame, valid)
    phat, *_ = _phat_pt(surf, res, full=cfg.full_target)
    # source pdf in area measure (prefix BSDF pdf projected onto rc)
    dist2 = jnp.maximum(v3.dot(to, to), 1e-12)
    cos_rc = jnp.maximum(-v3.dot(to * jax.lax.rsqrt(dist2), n_rc), 1e-6)
    pdf_area = pdf_sa * cos_rc / dist2
    w = jnp.where(hit & (pdf_area > 0.0), phat / jnp.maximum(pdf_area, 1e-12), 0.0)
    big_w = jnp.where(phat > 0.0, w / jnp.maximum(phat, 1e-12), 0.0)
    res = res.at[PR.WSUM].set(w)
    res = res.at[PR.M].set(jnp.where(hit, 1.0, 0.0))
    res = res.at[PR.W].set(big_w)
    res = res.at[PR.PHAT].set(phat)
    return res


def _merge(res_a, res_b, surf, u, cfg: ReSTIRPTConfig, m_cap=None):
    """GRIS combine with reconnection shift: phat of B's path re-anchored at
    this pixel, zeroed when the shift is invalid (hybrid conditions)."""
    valid = surf[6]
    m_b = res_b[PR.M]
    if m_cap is not None:
        m_b = jnp.minimum(m_b, m_cap)
    phat_b, *_ = _phat_pt(surf, res_b, full=cfg.full_target)
    phat_b = jnp.where(_shift_valid(surf, res_b, cfg), phat_b, 0.0)
    w_b = jnp.where(valid, phat_b * res_b[PR.W] * m_b, 0.0)
    w_sum = res_a[PR.WSUM] + w_b
    take = u * w_sum < w_b
    out = jnp.where(take[None, :], res_b, res_a)
    y_phat = jnp.where(take, phat_b, res_a[PR.PHAT])
    m_new = res_a[PR.M] + m_b
    big_w = jnp.where(
        y_phat > 0.0, w_sum / jnp.maximum(m_new * y_phat, 1e-12), 0.0
    )
    out = out.at[PR.WSUM].set(w_sum).at[PR.M].set(m_new)
    out = out.at[PR.W].set(big_w).at[PR.PHAT].set(y_phat)
    return out


def temporal_reuse(
    res, prev_res, prev_gbuf, gbuf, prev_cam, width, height, seed, cfg,
    trans=False, coat=False, pix=None, prev_row0=0, prev_rows=None,
    pos_prev=None,
):
    from ..core.rng import uniform4

    n = res.shape[1]
    surf = _surf(gbuf, trans, coat)
    pos, ns = surf[0], surf[1]
    # pos_prev: previous-frame hit position (animated geometry), see
    # restir_di.temporal_reuse
    p_world = (
        pos_prev if pos_prev is not None
        else jnp.stack([pos.x, pos.y, pos.z], -1)
    )
    px, py, w_fwd = prev_cam.project(p_world, width, height)
    rel = p_world - jnp.asarray(prev_cam.eye)
    depth_est = jnp.sqrt(jnp.maximum(jnp.sum(rel * rel, -1), 1e-12))
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
    idx = ey * width + ix
    prev_r = jnp.take(prev_res, idx, axis=1)
    # prev_gbuf is the PACKED temporal G-buffer (ops.gbuffer_pack)
    from .gbuffer_pack import temporal_geom_ok

    prev_g = jnp.take(prev_gbuf, idx, axis=1)
    ok = inside & temporal_geom_ok(
        prev_g, ns, depth_est, cfg.depth_tolerance, cfg.normal_tolerance
    )
    prev_r = prev_r.at[PR.M].set(jnp.where(ok, prev_r[PR.M], 0.0))
    prev_r = prev_r.at[PR.W].set(jnp.where(ok, prev_r[PR.W], 0.0))
    if pix is None:
        pix = jnp.arange(n, dtype=jnp.int32)
    u = uniform4(pix, 203, seed, salt=0x4A31)[:, 0]
    return _merge(res, prev_r, surf, u, cfg, m_cap=cfg.m_max)


def spatial_step(
    res, gbuf, width, height, seed, it, cfg,
    trans=False, coat=False, pix=None, res_src=None, gbuf_src=None, src_row0=0,
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
    r = cfg.spatial_radius * jnp.sqrt(u[:, 0])
    phi = 2.0 * jnp.pi * u[:, 1]
    nx = jnp.clip(x + jnp.round(r * jnp.cos(phi)).astype(jnp.int32), 0, width - 1)
    ny = jnp.clip(y + jnp.round(r * jnp.sin(phi)).astype(jnp.int32), 0, height - 1)
    nidx = (ny - src_row0) * width + nx
    nb = jnp.take(res_src, nidx, axis=1)
    nb_g = jnp.take(gbuf_src, nidx, axis=1)
    depth = gbuf[G.DEPTH]
    ok = (
        (jnp.abs(nb_g[G.DEPTH] - depth) < cfg.depth_tolerance * jnp.maximum(depth, 1e-3))
        & (v3.dot(ns, v3.from_rows(nb_g, G.NS)) > cfg.normal_tolerance)
        & (nb_g[G.VALID] > 0.5)
    )
    nb = nb.at[PR.M].set(jnp.where(ok, nb[PR.M], 0.0))
    nb = nb.at[PR.W].set(jnp.where(ok, nb[PR.W], 0.0))
    return _merge(res, nb, surf, u[:, 2], cfg)


def spatial_reuse(res, gbuf, width, height, seed, cfg, trans=False, coat=False, pix=None):
    out = res
    for it in range(cfg.spatial_iterations):
        out = spatial_step(out, gbuf, width, height, seed, it, cfg, trans, coat, pix)
    return out


def shade(scene, res, gbuf, cfg: ReSTIRPTConfig, trans=False, coat=False, rows_out=False):
    """Path radiance of the surviving sample (+ reconnection visibility)."""
    from ..accel.intersect import intersect_occluded

    surf = _surf(gbuf, trans, coat)
    pos, ns, ng, wo, mat, frame, valid = surf
    phat, f1, lout, geom, wi, dist2 = _phat_pt(surf, res, full=True)
    big_w = res[PR.W]
    lit = valid & (phat > 0.0) & (big_w > 0.0)
    x_rc = v3.from_rows(res, PR.X)
    so = pos + ng * _EPS_RAY
    seg = x_rc - so
    occ = intersect_occluded(
        scene,
        jnp.stack([so.x, so.y, so.z], -1),
        jnp.stack([seg.x, seg.y, seg.z], -1),
        t_min=1e-3, t_max=1.0 - 1e-3,
    )
    gain = jnp.where(lit & ~occ, geom * big_w, 0.0)
    out = f1 * lout * gain
    ax = 0 if rows_out else -1
    return jnp.stack([out.x, out.y, out.z], ax)
