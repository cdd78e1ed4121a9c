"""Unidirectional path tracer with NEE + MIS + Russian roulette.

TPU-native counterpart of the reference's ``PathTracer`` integrator
(IndirectLighting.h INTEGRATOR::UNIDIRECTIONAL_PT + the kernels it shares
with ReSTIR: NEE against the emissive alias table, power-heuristic MIS,
Russian roulette -- IndirectLighting.h:231-244 DefaultParamVals).

Design: a *wavefront* over a flat ray batch [N]. Each bounce is one fused
closest-hit+attribute-fetch (accel.intersect_closest_shaded: Woop matmuls +
one-hot gather, all in VMEM on TPU) + arithmetic-only shading + one fused
occlusion query for the NEE shadow ray. Dead lanes stay masked rather than
compacted -- on TPU the dense masked formulation beats compaction until
depth gets large; material sorting (the reference's ReSTIR_PT sort kernels)
is the planned optimization for deep/divergent paths.

Randomness is counter-based pcg4d (core.rng) keyed by (pixel, bounce, frame)
-- the reference's per-pixel PCG pattern (Sampling.hlsli:12-74) without
per-lane state, ~20x cheaper than threefry on TPU.

The bounce loop is a static Python unroll (max_bounces is small and static),
so bounce 0 can skip MIS and XLA sees one straight-line program.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..accel.intersect import intersect_closest_shaded, intersect_occluded
from ..core import rng as R
from ..scene.scene import A
from . import bsdf as B
from . import lights as L

_EPS_RAY = 1e-3  # ray-offset epsilon (scene units; Cornell box is ~2 units)


@dataclass(frozen=True)
class PTConfig:
    max_bounces: int = 4  # number of path segments after the primary hit
    rr_start: int = 3  # bounce index where Russian roulette kicks in
    nee: bool = True  # next-event estimation against emissive lights
    t_min: float = 1e-4
    firefly_clamp: float = 0.0  # 0 = off; else clamp per-sample radiance
    # Lighting-component masks for integrator composition (the reference's
    # DirectLighting / IndirectLighting split, composited in
    # Compositing.hlsl). Emission at bounce < min_emissive_bounce and NEE at
    # bounce < min_nee_bounce are skipped:
    #   full PT:                (0, 0)
    #   indirect-only (DI done by ReSTIR):       (2, 1)
    #   GI-sample radiance (exclude own emission): (1, 0)
    min_emissive_bounce: int = 0
    min_nee_bounce: int = 0

    @property
    def skip_direct(self) -> bool:
        return self.min_emissive_bounce >= 2 and self.min_nee_bounce >= 1
    # Sun + sky environment (reference: Sky pass + SkyDI). None = no sky.
    # Miss rays pick up analytic sky radiance; ``sun_nee`` adds one shadow
    # ray toward the sun per bounce (delta-light NEE, the SkyDI-lite path).
    sky: object = None  # ops.sky.SkyParams | None
    sun_nee: bool = True
    # Presampled-set scale for the fused megakernel's NEE (PreLighting's
    # PresampleEmissives). Defaults fit VMEM comfortably; the reference's
    # scale is 128 sets x 512 samples (DefaultRendererImpl.h:37-38).
    light_ns: int = 64
    light_ps: int = 128
    # The reference's WPS/WoPS kernel axis (IndirectLighting.h:20-54):
    # "wps" = NEE candidates from the shared presampled sets (VMEM, one
    # one-hot fetch); "wops" = per-pixel power-alias-table sampling inside
    # the kernel (independent per-lane light samples -- lower correlation,
    # one extra one-hot matmul over the emissive table; best when the
    # emissive count is small enough to sit in VMEM).
    nee_mode: str = "wps"
    # Path options (reference IndirectLighting.h DefaultParamVals:231-244).
    # stochastic_multi_bounce: with probability 1/2 a path stops extending
    # after its first indirect vertex (uncompensated, like the reference's
    # globals.maxNumBounces override -- inside ReSTIR the trace only defines
    # the resampling target p-hat, so this trades target quality for speed,
    # not unbiasedness of the outer estimator). Applied only where the
    # primary surface has roughness >= 0.1 (the reference also escapes via
    # CameraStatic; that toggle would force a re-jit per camera state here).
    stochastic_multi_bounce: bool = False
    # path_regularization: clamp GGX alpha at every vertex past the first
    # (BSDF.hlsli ShadingData::Regularize, alpha < 0.25 ->
    # clamp(2*alpha, 0.1, 0.25)); kills long-tail fireflies from
    # near-specular chains at the cost of slight over-blur. The reference's
    # anyGlossyBounces gate is commented out at every call site
    # (ReSTIR_PT_PathTrace.hlsl:258, Shift.hlsli:427), so the plain
    # bounce>=1 gate here is the live behavior, not a simplification.
    path_regularization: bool = False


def _surface_from(o, d, sh, has_coat=False):
    """Arithmetic-only surface reconstruction from a ShadedHit."""
    w0 = 1.0 - sh.u - sh.v
    at = sh.attrs
    ng_raw = at[:, A.NG : A.NG + 3]
    ns = (
        w0[:, None] * at[:, A.N0 : A.N0 + 3]
        + sh.u[:, None] * at[:, A.N1 : A.N1 + 3]
        + sh.v[:, None] * at[:, A.N2 : A.N2 + 3]
    )
    ns = ns / jnp.maximum(jnp.linalg.norm(ns, axis=-1, keepdims=True), 1e-20)
    uv = (
        w0[:, None] * at[:, A.UV0 : A.UV0 + 2]
        + sh.u[:, None] * at[:, A.UV1 : A.UV1 + 2]
        + sh.v[:, None] * at[:, A.UV2 : A.UV2 + 2]
    )
    front = jnp.sum(d * ng_raw, axis=-1) < 0.0
    sign = jnp.where(front, 1.0, -1.0)[:, None]
    ng = ng_raw * sign
    ns = ns * sign
    flip_ns = jnp.sum(ns * ng, axis=-1, keepdims=True) < 0.0
    ns = jnp.where(flip_ns, -ns, ns)
    pos = o + sh.t[:, None] * d
    mat = B.MatParams(
        base_color=at[:, A.BASE : A.BASE + 3],
        metallic=at[:, A.METAL],
        roughness=at[:, A.ROUGH],
        ior=jnp.maximum(at[:, A.IOR], 1.01),
        transmission=at[:, A.TRANS],
        coat=at[:, A.COATW] if has_coat else None,
        coat_roughness=at[:, A.COATR] if has_coat else None,
    )
    return pos, ng, ns, uv, front, mat, ng_raw


def megakernel_eligible(scene) -> bool:
    """True when the dense VMEM-resident bounce megakernel applies."""
    return (
        jax.default_backend() != "cpu"
        and scene.cluster_aabb is None
        and not scene.has_cutout
        and scene.woop.shape[1] // 3 <= 8192
    )


def trace(scene, o, d, key, cfg: PTConfig = PTConfig(), pix0=0, rt=1024, rows_out=False, textures=None, spread_angle=0.0, smb_kill=None):
    """Path-trace radiance for rays (o, d) [N,3]. Returns [N,3] linear HDR.

    On TPU this dispatches to the fused bounce megakernel
    (accel.megakernel); the XLA wavefront below is the CPU/test oracle.
    ``pix0``: global flat index of the first ray (nonzero under pixel-tile
    sharding so per-pixel RNG streams match the unsharded frame).
    """
    # Dispatch: small scenes (whole Woop + attr tables VMEM-resident) use
    # the fused bounce megakernel; clustered scenes (scene.cluster_aabb set)
    # use the XLA wavefront whose intersection queries stream BVH clusters
    # from HBM with tile culling (accel.stream).
    if megakernel_eligible(scene):
        from ..accel.megakernel import trace_megakernel

        return trace_megakernel(
            scene, o, d, R.seed_from_key(key), cfg, rt=rt, pix0=pix0,
            rows_out=rows_out, textures=textures, spread_angle=spread_angle,
            smb_kill=smb_kill,
        )
    out = trace_reference(
        scene, o, d, key, cfg, pix0=pix0, textures=textures, smb_kill=smb_kill,
        spread_angle=spread_angle,
    )
    return out.T if rows_out else out


_PARK = 3.0e7  # dead-ray parking point: far outside any scene AABB, so the
# streaming overlap prepass culls whole dead subtiles (the sort groups them)
# -- TPU-native ray compaction with static shapes (no gather/scatter).
_PARK_DIR = (1.0, 0.0, 0.0)


def _park(mask, o, d):
    """Rays where ``mask`` is False are parked outside the scene: after the
    shaft sort they cluster into subtiles whose frustum misses every
    cluster AABB, so the streaming traversal never visits them. All their
    outputs are already gated by the same mask at every use site."""
    pd = jnp.asarray(_PARK_DIR)
    return (
        jnp.where(mask[:, None], o, _PARK),
        jnp.where(mask[:, None], d, pd),
    )


def trace_reference(scene, o, d, key, cfg: PTConfig = PTConfig(), pix0=0,
                    textures=None, spread_angle=0.0, smb_kill=None,
                    return_first_hit=False):
    """XLA-staged wavefront path tracer (oracle / large-scene fallback).

    ``smb_kill``: optional [N] bool -- paths to stop extending after the
    trace's first hit vertex (stochastic multi-bounce, decided by the
    caller from the primary surface; see PTConfig.stochastic_multi_bounce).

    ``return_first_hit``: also return the bounce-0 ShadedHit (the clustered
    GI path reuses it as the x2 query, saving one full traversal sweep --
    the streaming analog of megakernel.trace_with_first_hit).
    """
    n = o.shape[0]
    seed = R.seed_from_key(key)
    cone_w = jnp.zeros((n,))  # accumulated ray-cone width (texturing)
    pixel = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0] + pix0
    radiance = jnp.zeros((n, 3))
    throughput = jnp.ones((n, 3))
    alive = jnp.ones((n,), bool)
    prev_pdf = jnp.zeros((n,))  # BSDF pdf of the ray that got us here (SA)
    spec_bounce = jnp.ones((n,), bool)  # primary rays count as "specular"
    has_lights = scene.num_emissives > 0

    sh0 = None
    for bounce in range(cfg.max_bounces + 1):
        sh = intersect_closest_shaded(scene, o, d, t_min=cfg.t_min)
        if bounce == 0:
            sh0 = sh
        found = sh.valid & alive
        pos, ng, ns, uv, front, mat, ng_raw = _surface_from(o, d, sh, scene.has_coat)
        if cfg.path_regularization and bounce > 0:
            # BSDF.hlsli ShadingData::Regularize at secondary vertices
            alpha = mat.roughness * mat.roughness
            alpha_r = jnp.where(
                alpha < 0.25, jnp.clip(2.0 * alpha, 0.1, 0.25), alpha
            )
            mat = mat._replace(roughness=jnp.sqrt(alpha_r))
        if textures:
            # secondary-bounce texturing (RT.hlsli per-vertex fetches)
            from ..scene.textures import base_color_at

            cone_w = cone_w + jnp.where(alive & sh.valid, sh.t, 0.0) * spread_angle
            factor = base_color_at(
                textures, uv,
                jnp.where(sh.valid, sh.attrs[:, A.TEXID], -1.0),
                cone_w, sh.attrs[:, A.UVDENS],
            )
            if factor is not None:
                mat = mat._replace(base_color=mat.base_color * factor.T)

        # -- environment (sun + sky) on miss rays
        if cfg.sky is not None:
            from ..core.vec3 import V3
            from . import sky as SK

            miss = alive & ~sh.valid
            env = SK.sky_radiance(
                V3(d[:, 0], d[:, 1], d[:, 2]), cfg.sky, with_disk=False
            )
            env_rgb = jnp.stack([env.x, env.y, env.z], -1)
            disk = SK.sun_disk(d, cfg.sky)
            if cfg.sun_nee:
                disk = disk * spec_bounce[:, None].astype(disk.dtype)
            radiance = radiance + jnp.where(
                miss[:, None], throughput * (env_rgb + disk), 0.0
            )

        # -- emitted radiance at the hit (MIS against NEE of the prev vertex)
        if has_lights and bounce >= cfg.min_emissive_bounce:
            wo_dot_ng = -jnp.sum(d * ng_raw, axis=-1)
            two_sided = sh.attrs[:, A.DOUBLE] > 0.5
            visible_side = two_sided | (wo_dot_ng > 0.0)
            le = jnp.where(
                visible_side[:, None], sh.attrs[:, A.EMISS : A.EMISS + 3], 0.0
            )
            if cfg.nee and bounce > 0:
                pdf_l_sa = L.pdf_area_to_solid_angle(
                    sh.attrs[:, A.EM_PDF_AREA], sh.t * sh.t, jnp.abs(wo_dot_ng)
                )
                mis = jnp.where(
                    spec_bounce, 1.0, L.power_heuristic(prev_pdf, pdf_l_sa)
                )
            else:
                mis = jnp.ones((n,))
            radiance = radiance + jnp.where(
                found[..., None], throughput * le * mis[..., None], 0.0
            )

        alive = found
        if bounce == cfg.max_bounces:
            break

        # -- local frame
        t_ax, b_ax = B.make_frame(ns)
        wo_l = B.to_local(ns, t_ax, b_ax, -d)
        eta = jnp.where(front, 1.0 / mat.ior, mat.ior)

        # -- NEE: one shadow ray toward an emissive sample
        if cfg.nee and has_lights and bounce >= cfg.min_nee_bounce:
            u_l = R.uniform4(pixel, bounce, seed, salt=1)
            ls = L.sample_emissive(scene, u_l)
            to_l = ls.pos - pos
            dist2 = jnp.maximum(jnp.sum(to_l * to_l, -1), 1e-12)
            inv_dist = jax.lax.rsqrt(dist2)
            wi_w = to_l * inv_dist[..., None]
            cos_surf = jnp.sum(wi_w * ns, -1)
            cos_light_raw = -jnp.sum(wi_w * ls.ng, -1)
            cos_light = jnp.where(
                ls.two_sided, jnp.abs(cos_light_raw), cos_light_raw
            )
            wi_l = B.to_local(ns, t_ax, b_ax, wi_w)
            f, pdf_b = B.bsdf_eval(mat, wo_l, wi_l, eta=eta)
            pdf_l_sa = L.pdf_area_to_solid_angle(ls.pdf_area, dist2, cos_light)
            candidate = alive & (cos_surf > 1e-6) & (cos_light > 1e-6)
            # Shadow ray with the *unnormalized* segment as direction: the
            # light sits at t == 1 for every lane, so t_max stays a scalar.
            # Non-candidate lanes are parked (see _park).
            shadow_o, shadow_d = _park(candidate, pos + ng * _EPS_RAY, to_l)
            occluded = intersect_occluded(
                scene, shadow_o, shadow_d, t_min=1e-3, t_max=1.0 - 1e-3
            )
            vis = candidate & ~occluded
            mis = L.power_heuristic(pdf_l_sa, pdf_b)
            contrib = (
                throughput
                * f
                * ls.le
                * (cos_surf * mis / jnp.maximum(pdf_l_sa, 1e-12))[..., None]
            )
            if cfg.firefly_clamp > 0.0:
                contrib = jnp.minimum(contrib, cfg.firefly_clamp)
            radiance = radiance + jnp.where(vis[..., None], contrib, 0.0)

        # -- sun NEE (delta light, SkyDI-lite)
        if cfg.sky is not None and cfg.sun_nee:
            import numpy as _np
            from . import sky as SK

            sun = _np.asarray(cfg.sky.sun_dir, _np.float64)
            sun = (sun / _np.linalg.norm(sun)).astype(_np.float32)
            sdir = jnp.broadcast_to(jnp.asarray(sun), (n, 3))
            cos_s = jnp.sum(sdir * ns, -1)
            f_s, _ = B.bsdf_eval(mat, wo_l, B.to_local(ns, t_ax, b_ax, sdir))
            sun_cand = alive & (cos_s > 1e-6)
            so_s, sd_s = _park(sun_cand, pos + ng * _EPS_RAY, sdir)
            occ_s = intersect_occluded(
                scene, so_s, sd_s, t_min=1e-3, t_max=1e8
            )
            e_sun = jnp.asarray(SK.sun_irradiance(cfg.sky))
            sun_ok = sun_cand & ~occ_s
            radiance = radiance + jnp.where(
                sun_ok[:, None], throughput * f_s * e_sun * cos_s[:, None], 0.0
            )

        # -- BSDF sample for the next bounce
        u_b = R.uniform4(pixel, bounce, seed, salt=2)
        wi_l, weight, pdf = B.bsdf_sample(mat, wo_l, jnp.stack(u_b[:3], -1), eta=eta)
        wi_w = B.to_world(ns, t_ax, b_ax, wi_l)
        # geometric-side consistency: reflected rays leave above the
        # geometric surface, transmitted rays below it
        transmitted = wi_l[:, 2] < 0.0
        if textures:
            # refraction cone update approximation: scale width by eta
            cone_w = cone_w * jnp.where(transmitted, eta, 1.0)
        side = jnp.sum(wi_w * ng, -1)
        geo_ok = jnp.where(transmitted, side < -1e-6, side > 1e-6)
        alive = alive & (pdf > 0.0) & geo_ok
        throughput = throughput * weight
        prev_pdf = pdf
        spec_bounce = jnp.zeros((n,), bool)  # no perfectly-specular lobes yet
        if smb_kill is not None and bounce == 0:
            # stochastic multi-bounce: full shading at the trace's first
            # vertex, no extension past it (the reference breaks after li
            # accumulation, PathTracing.hlsli:51 "remaining code won't
            # affect li"; decision made by the GI pass, Resampling.hlsli:545)
            alive = alive & ~smb_kill

        # -- Russian roulette (reference: RussianRoulette default on)
        if bounce >= cfg.rr_start:
            q = jnp.clip(jnp.max(throughput, axis=-1), 0.05, 0.95)
            u_rr = R.uniform4(pixel, bounce, seed, salt=3)[0]
            survive = u_rr < q
            alive = alive & survive
            throughput = throughput / q[..., None]

        offset_sign = jnp.where(transmitted, -1.0, 1.0)[:, None]
        o, d = _park(alive, pos + ng * _EPS_RAY * offset_sign, wi_w)

    if return_first_hit:
        return radiance, sh0
    return radiance


def render_spp(scene, camera, width, height, key, cfg: PTConfig = PTConfig(), spp: int = 1):
    """Render ``spp`` samples/pixel, returns [H*W, 3] averaged HDR radiance."""
    o, d = camera.generate_rays(width, height)

    def one(acc, i):
        acc = acc + trace(scene, o, d, jax.random.fold_in(key, i), cfg)
        return acc, None

    if spp == 1:
        return trace(scene, o, d, key, cfg)
    acc, _ = jax.lax.scan(one, jnp.zeros((width * height, 3)), jnp.arange(spp))
    return acc / spp
