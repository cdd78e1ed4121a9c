"""SkyDI: reservoir-based direct sun + sky lighting.

Counterpart of the reference's SkyDI pass (DirectLighting/Sky/SkyDI.h:1-137,
SkyDI_Temporal.hlsl RIS_InitialCandidates): a per-pixel reservoir over
*directions* toward the sky dome, fed by three candidate strategies --
a sun-cone sample, a cosine-hemisphere sample, and a BSDF sample -- combined
with the balance heuristic over the three source pdfs, then temporal and
spatial reuse exactly like ReSTIR DI (directions are translation-invariant,
so reuse needs no Jacobian), and a final visibility ray at shading.

Replaces the "SkyDI-lite" sun-NEE approximation (render.frame._sky_direct)
with full sky-dome NEE: ambient sky light at primary hits is sampled
directly instead of only arriving through GI bounces.

Reservoir rows (same slot convention as ops.restir_di): 0-2 wi, 3-5 Le(wi)
(sky + sun radiance, cached at candidate time), 9 w_sum, 10 M, 11 W,
13 phat. Rows 6-8/12 unused (kept for shared-width merges).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..accel.megakernel import G
from ..core import vec3 as v3
from ..core.rng import uniform4
from ..core.vec3 import V3
from ..core.rows import stack_rows
from . import shading_soa as S
from . import sky as SK
from .restir_di import _gather_rows, _geom_ok, _surface_from_gbuf

R_ROWS = 16


@dataclass(frozen=True)
class SkyDIConfig:
    temporal: bool = True
    m_max: float = 20.0  # temporal M clamp (reference M_MAX)
    spatial_iterations: int = 1
    spatial_radius: int = 16
    depth_tolerance: float = 0.1
    normal_tolerance: float = 0.9
    # number of (sun, cosine, bsdf) candidate triplets per pixel
    rounds: int = 1
    # "biased" = M-capped naive combine; "pairwise" = pairwise MIS
    # (the reference applies PairwiseMIS.hlsli in SkyDI_Spatial.hlsl too)
    spatial_mis: str = "biased"
    spatial_neighbors: int = 3  # per pairwise pass (reference default)


def _sun_basis(sky):
    sun = np.asarray(sky.sun_dir, np.float64)
    sun = sun / np.linalg.norm(sun)
    a = np.array([1.0, 0, 0]) if abs(sun[0]) < 0.9 else np.array([0, 1.0, 0])
    t = np.cross(sun, a)
    t /= np.linalg.norm(t)
    b = np.cross(sun, t)
    return sun.astype(np.float32), t.astype(np.float32), b.astype(np.float32)


def _le_dir(wi: V3, sky):
    """Sky + sun radiance along directions (V3 of [N])."""
    env = SK.sky_radiance(wi, sky, with_disk=False)
    d_aos = v3.aos3(wi)
    disk = SK.sun_disk(d_aos, sky).T  # [3, N]
    return V3(env.x + disk[0], env.y + disk[1], env.z + disk[2])


def _pdfs(wi: V3, ns: V3, mat, frame, wo_l, sky):
    """Balance-heuristic source pdf of a direction under the 3 strategies."""
    sun, _, _ = _sun_basis(sky)
    cos_r = float(np.cos(sky.sun_angular_radius))
    omega = 2.0 * np.pi * (1.0 - cos_r)
    c_sun = wi.x * sun[0] + wi.y * sun[1] + wi.z * sun[2]
    p_sun = jnp.where(c_sun >= cos_r, 1.0 / max(omega, 1e-12), 0.0)
    cos_s = v3.dot(wi, ns)
    p_cos = jnp.maximum(cos_s, 0.0) / jnp.pi
    _, p_bsdf = S.bsdf_eval(mat, wo_l, frame.to_local(wi))
    return (p_sun + p_cos + p_bsdf) / 3.0


def _phat_dir(wi: V3, le: V3, ns: V3, mat, frame, wo_l):
    cos_s = v3.dot(wi, ns)
    f, _ = S.bsdf_eval(mat, wo_l, frame.to_local(wi))
    lum = v3.luminance(f * le) * jnp.maximum(cos_s, 0.0)
    return jnp.where(cos_s > 1e-6, jnp.maximum(lum, 0.0), 0.0)


def _stream(res, wi: V3, le: V3, w, phat, u):
    w_sum = res[9] + w
    take = u * jnp.maximum(w_sum, 1e-30) < w
    return stack_rows(R_ROWS, {
        0: jnp.where(take, wi.x, res[0]),
        1: jnp.where(take, wi.y, res[1]),
        2: jnp.where(take, wi.z, res[2]),
        3: jnp.where(take, le.x, res[3]),
        4: jnp.where(take, le.y, res[4]),
        5: jnp.where(take, le.z, res[5]),
        9: w_sum,
        13: jnp.where(take, phat, res[13]),
    }, like=res)


def _finalize(res, m):
    phat = res[13]
    big_w = jnp.where(
        phat > 0.0, res[9] / jnp.maximum(m * phat, 1e-12), 0.0
    )
    return stack_rows(R_ROWS, {10: m, 11: big_w}, like=res)


def initial_candidates(gbuf, sky, seed, cfg: SkyDIConfig,
                       trans=False, coat=False, pix=None):
    """RIS over sun-cone + cosine + BSDF direction candidates -> [16, N]."""
    n = gbuf.shape[1]
    pos, ns, _ng, wo, mat, valid = _surface_from_gbuf(gbuf, trans, coat)
    frame = S.make_frame(ns)
    wo_l = frame.to_local(wo)
    ids = pix if pix is not None else jnp.arange(n, dtype=jnp.int32)
    sun, t, b = _sun_basis(sky)
    cos_r = float(np.cos(sky.sun_angular_radius))

    res = jnp.zeros((R_ROWS, n))
    m = jnp.zeros((n,))
    for rd in range(cfg.rounds):
        u = uniform4(ids, rd, seed, salt=0x50D1)
        u2 = uniform4(ids, rd, seed, salt=0x50D2)
        # reservoir-selection stream, independent of candidate generation
        # (a shared stream biases the pick toward its own candidate)
        u3 = uniform4(ids, rd, seed, salt=0x50D3)

        # -- sun cone (uniform solid angle)
        cz = 1.0 - u[0] * (1.0 - cos_r)
        sz = jnp.sqrt(jnp.maximum(1.0 - cz * cz, 0.0))
        ph = 2.0 * jnp.pi * u[1]
        wi_s = V3(
            sun[0] * cz + (t[0] * jnp.cos(ph) + b[0] * jnp.sin(ph)) * sz,
            sun[1] * cz + (t[1] * jnp.cos(ph) + b[1] * jnp.sin(ph)) * sz,
            sun[2] * cz + (t[2] * jnp.cos(ph) + b[2] * jnp.sin(ph)) * sz,
        )
        # -- cosine hemisphere about the shading normal
        wi_c = frame.to_world(S._cosine_hemisphere(u[2], u[3]))
        # -- BSDF sample
        wi_b_l, _wgt, _pdf = S.bsdf_sample(mat, wo_l, u2[0], u2[1], u2[2])
        wi_b = frame.to_world(wi_b_l)

        for wi, uu in ((wi_s, u3[0]), (wi_c, u3[1]), (wi_b, u3[2])):
            le = _le_dir(wi, sky)
            phat = _phat_dir(wi, le, ns, mat, frame, wo_l)
            p_src = _pdfs(wi, ns, mat, frame, wo_l, sky)
            ok = valid & (p_src > 1e-12) & (wi.y > -0.999)
            w = jnp.where(ok, phat / jnp.maximum(p_src, 1e-12), 0.0)
            res = _stream(res, wi, le, w, phat, uu)
            m = m + 1.0
    return _finalize(res, m)


def temporal_reuse(res, prev_res, prev_gbuf, gbuf, prev_cam, width, height,
                   seed, cfg: SkyDIConfig, sky, trans=False, coat=False,
                   pix=None, prev_row0=0, prev_rows=None, pos_prev=None,
                   band=None):
    """Merge the reprojected previous-frame direction reservoir."""
    n = res.shape[1]
    pos, ns, _ng, wo, mat, valid = _surface_from_gbuf(gbuf, trans, coat)
    frame = S.make_frame(ns)
    wo_l = frame.to_local(wo)
    p_world = (
        pos_prev if pos_prev is not None
        else v3.aos3(pos)
    )
    px, py, w_fwd = prev_cam.project(p_world, width, height)
    rel = p_world - jnp.asarray(prev_cam.eye)
    depth_est = jnp.sqrt(jnp.maximum(jnp.sum(rel * rel, -1), 1e-12))
    ix = jnp.clip(jnp.round(px).astype(jnp.int32), 0, width - 1)
    rows = prev_rows if prev_rows is not None else height
    iy = jnp.clip(jnp.round(py).astype(jnp.int32) - prev_row0, 0, rows - 1)
    inside = (
        (px >= -0.5) & (px <= width - 0.5) & (py >= -0.5) & (py <= height - 0.5)
        & (w_fwd > 0.0)
        & (jnp.round(py).astype(jnp.int32) - prev_row0 >= 0)
        & (jnp.round(py).astype(jnp.int32) - prev_row0 <= rows - 1)
    )
    nidx = iy * width + ix
    from .restir_di import _take_multi

    (nb, nb_g), okb = _take_multi(
        [prev_res, prev_gbuf], nidx, band, width, height, prev_row0
    )
    # prev_gbuf is the PACKED temporal G-buffer (ops.gbuffer_pack)
    from .gbuffer_pack import temporal_geom_ok

    ok = inside & valid & temporal_geom_ok(
        nb_g, ns, depth_est, cfg.depth_tolerance, cfg.normal_tolerance
    )
    if okb is not None:
        ok = ok & okb
    wi_b = v3.from_rows(nb, 0)
    le_b = v3.from_rows(nb, 3)
    m_b = jnp.minimum(nb[10], cfg.m_max * jnp.maximum(res[10], 1.0))
    m_b = jnp.where(ok, m_b, 0.0)
    phat_b = _phat_dir(wi_b, le_b, ns, mat, frame, wo_l)
    w_b = jnp.where(ok, phat_b * nb[11] * m_b, 0.0)

    ids = pix if pix is not None else jnp.arange(n, dtype=jnp.int32)
    u = uniform4(ids, 0, seed, salt=0x50D7)[0]
    out = _stream(res, wi_b, le_b, w_b, phat_b, u)
    return _finalize(out, res[10] + m_b)


def spatial_step(res, gbuf, width, height, seed, it, cfg: SkyDIConfig,
                 trans=False, coat=False, pix=None, res_src=None,
                 gbuf_src=None, src_row0=0, band=None):
    from .restir_di import _neighbor_pick

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
    nidx, u_stream = _neighbor_pick(
        pix, width, height, seed, it + 64, cfg, src_row0
    )
    from .restir_di import _take_multi, geom_ok_slim, geom_table

    if band is not None:
        band = (band[0], max(band[1], cfg.spatial_radius))
    (nb, nb_geom), okb = _take_multi(
        [res_src, geom_table(gbuf_src)], nidx, band, width, height, src_row0
    )
    ok = geom_ok_slim(gbuf, nb_geom, ns, cfg) & valid
    if okb is not None:
        ok = ok & okb
    wi_b = v3.from_rows(nb, 0)
    le_b = v3.from_rows(nb, 3)
    m_b = jnp.where(ok, nb[10], 0.0)
    phat_b = _phat_dir(wi_b, le_b, ns, mat, frame, wo_l)
    w_b = jnp.where(ok, phat_b * nb[11] * m_b, 0.0)
    out = _stream(res, wi_b, le_b, w_b, phat_b, u_stream)
    return _finalize(out, res[10] + m_b)


def spatial_step_pairwise(res, gbuf, width, height, seed, it,
                          cfg: SkyDIConfig, trans=False, coat=False,
                          pix=None, res_src=None, gbuf_src=None,
                          src_row0=0, band=None):
    """Pairwise-MIS spatial pass for directional reservoirs (reference
    SkyDI_Spatial.hlsl via the shared PairwiseMIS.hlsli).

    Directions are translation-invariant, so the shift between pixels is
    the identity with Jacobian 1: re-rating a neighbor's sample at the
    canonical surface is just re-evaluating the BSDF*cos target with the
    cached sky radiance. Structure mirrors
    ops.restir_di.spatial_step_pairwise.
    """
    from .restir_di import _neighbor_pick, _take_multi, _geom_ok

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
    if band is not None:
        band = (band[0], max(band[1], cfg.spatial_radius))

    nbs = []
    k_eff = jnp.zeros((n,))
    for i in range(k):
        nidx, u_stream = _neighbor_pick(
            pix, width, height, seed, it * 16 + i + 64, cfg, src_row0
        )
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

    out = res
    w_sum_s = jnp.zeros((n,))
    m_s = m_c_count
    phat_sel = phat_c_yc

    yc_wi = v3.from_rows(res, 0)
    yc_le = v3.from_rows(res, 3)

    for nb, nb_g, ok, u_stream in nbs:
        wi_i = v3.from_rows(nb, 0)
        le_i = v3.from_rows(nb, 3)
        m_i_count = nb[10]
        # p_c(y_i): neighbor's direction re-rated at the canonical surface
        phat_c_yi = _phat_dir(wi_i, le_i, ns, mat, frame, wo_l)
        phat_i_yi = nb[13]
        num_i = m_i_count * phat_i_yi
        den_i = num_i + (m_c_count / k_div) * phat_c_yi
        m_i = jnp.where(
            ok & (den_i > 0.0), num_i / jnp.maximum(den_i, 1e-12), 0.0
        )
        w_i = m_i * phat_c_yi * nb[11]

        w_sum_s = w_sum_s + w_i
        take = u_stream * jnp.maximum(w_sum_s, 1e-30) < w_i
        out = jnp.where(take[None, :], nb, out)
        phat_sel = jnp.where(take, phat_c_yi, phat_sel)

        # p_i(y_c): the canonical direction re-rated at the neighbor surface
        _pi, ns_i, _ngi, wo_i, mat_i, _vi = _surface_from_gbuf(
            nb_g, trans, coat
        )
        frame_i = S.make_frame(ns_i)
        phat_i_yc = _phat_dir(
            yc_wi, yc_le, ns_i, mat_i, frame_i, frame_i.to_local(wo_i)
        )
        num_c = m_i_count * phat_i_yc
        den_c = num_c + (m_c_count / k_div) * phat_c_yc
        dm = jnp.where(
            den_c > 0.0, 1.0 - num_c / jnp.maximum(den_c, 1e-12), 1.0
        )
        m_c = m_c + jnp.where(ok, dm, 0.0)
        m_s = m_s + jnp.where(ok, m_i_count, 0.0)

    # canonical stream (PairwiseMIS::End)
    w_c = m_c * phat_c_yc * w_c_cap
    w_sum_s = w_sum_s + w_c
    u_end = uniform4(pix, it * 16 + 79, seed, salt=0x5A73)[0]
    take_c = u_end * jnp.maximum(w_sum_s, 1e-30) < w_c
    out = jnp.where(take_c[None, :], res, out)
    phat_sel = jnp.where(take_c, phat_c_yc, phat_sel)

    w_new = jnp.where(
        phat_sel > 0.0,
        w_sum_s / jnp.maximum(phat_sel * (1.0 + k_eff), 1e-12),
        0.0,
    )
    return stack_rows(R_ROWS, {
        9: w_sum_s, 10: m_s, 11: w_new, 13: phat_sel,
    }, like=out)


def spatial_reuse(res, gbuf, width, height, seed, cfg: SkyDIConfig,
                  trans=False, coat=False, pix=None, band=None):
    step = (
        spatial_step_pairwise if cfg.spatial_mis == "pairwise"
        else spatial_step
    )
    out = res
    for it in range(cfg.spatial_iterations):
        out = step(out, gbuf, width, height, seed, it, cfg,
                   trans, coat, pix, band=band)
    return out


def shade(scene, res, gbuf, trans=False, coat=False):
    """Visibility-test the winning direction; returns planar [3, N] direct
    sky radiance (f * Le * cos * W * vis)."""
    from ..accel.intersect import intersect_occluded

    pos, ns, ng, wo, mat, valid = _surface_from_gbuf(gbuf, trans, coat)
    frame = S.make_frame(ns)
    wo_l = frame.to_local(wo)
    wi = v3.from_rows(res, 0)
    le = v3.from_rows(res, 3)
    cos_s = jnp.maximum(v3.dot(wi, ns), 0.0)
    f, _ = S.bsdf_eval(mat, wo_l, frame.to_local(wi))
    so = pos + ng * 1e-3
    occ = intersect_occluded(
        scene,
        v3.aos3(so),
        v3.aos3(wi),
        t_min=1e-3, t_max=1e8,
    )
    gain = jnp.where(valid & ~occ & (res[11] > 0.0), cos_s * res[11], 0.0)
    out = f * le * gain
    return v3.aos3(out, 0)
