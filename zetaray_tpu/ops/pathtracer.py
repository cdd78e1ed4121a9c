"""Unidirectional path tracer with NEE + MIS + Russian roulette.

TPU-native counterpart of the reference's ``PathTracer`` integrator
(IndirectLighting.h INTEGRATOR::UNIDIRECTIONAL_PT + the kernels it shares
with ReSTIR: NEE against the emissive alias table, power-heuristic MIS,
Russian roulette -- IndirectLighting.h:231-244 DefaultParamVals).

Design: a *wavefront* over a flat ray batch [N]. Each bounce is one dense
intersect (accel.intersect, MXU) + gathered shading + one shadow-ray
occlusion test. Dead lanes stay masked rather than compacted -- on TPU the
dense masked formulation beats compaction until depth gets large, because
every op is regular and fuses; compaction (sort by alive/material like the
reference's ReSTIR_PT sort kernels) is the planned optimization for deep
paths.

The bounce loop is a static Python unroll (max_bounces is small and static),
so bounce 0 can skip MIS and XLA sees one straight-line program.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..accel.intersect import intersect_closest, intersect_any, hit_surface
from . import bsdf as B
from . import lights as L

_EPS_RAY = 1e-3  # ray-offset epsilon (scene units; Cornell box is ~2 units)


@dataclass(frozen=True)
class PTConfig:
    max_bounces: int = 4  # number of path segments after the primary hit
    rr_start: int = 3  # bounce index where Russian roulette kicks in
    nee: bool = True  # next-event estimation against emissive lights
    t_min: float = 1e-4


def _uniforms(key, salt: int, n: int, m: int):
    return jax.random.uniform(jax.random.fold_in(key, salt), (n, m))


def trace(scene, o, d, key, cfg: PTConfig = PTConfig()):
    """Path-trace radiance for rays (o, d) [N,3]. Returns [N,3] linear HDR."""
    n = o.shape[0]
    radiance = jnp.zeros((n, 3))
    throughput = jnp.ones((n, 3))
    alive = jnp.ones((n,), bool)
    prev_pdf = jnp.zeros((n,))  # BSDF pdf of the ray that got us here (SA)
    spec_bounce = jnp.ones((n,), bool)  # primary rays count as "specular"

    has_lights = scene.num_emissives > 0

    for bounce in range(cfg.max_bounces + 1):
        hit = intersect_closest(scene, o, d, t_min=cfg.t_min)
        found = hit.valid & alive

        surf = hit_surface(scene, o, d, hit)
        mat = B.gather_mat(scene, surf.mat_id)

        # -- emitted radiance at the hit (MIS against NEE of the prev vertex)
        if has_lights:
            ng_raw = scene.ng[jnp.maximum(hit.tri, 0)]
            wo_dot_ng = -jnp.sum(d * ng_raw, axis=-1)
            le = L.emitted_radiance(scene, hit.tri, wo_dot_ng)
            if cfg.nee and bounce > 0:
                pdf_l_area = L.light_pdf_area(scene, hit.tri)
                dist2 = hit.t * hit.t
                pdf_l_sa = L.pdf_area_to_solid_angle(
                    pdf_l_area, dist2, jnp.abs(wo_dot_ng)
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
        t_ax, b_ax = B.make_frame(surf.ns)
        wo_l = B.to_local(surf.ns, t_ax, b_ax, -d)

        # -- NEE: one shadow ray toward an emissive sample
        if cfg.nee and has_lights:
            u_l = _uniforms(key, 7919 * bounce + 1, n, 4)
            ls = L.sample_emissive(scene, u_l)
            to_l = ls.pos - surf.pos
            dist2 = jnp.maximum(jnp.sum(to_l * to_l, -1), 1e-12)
            dist = jnp.sqrt(dist2)
            wi_w = to_l / dist[..., None]
            cos_surf = jnp.sum(wi_w * surf.ns, -1)
            cos_light_raw = -jnp.sum(wi_w * ls.ng, -1)
            cos_light = jnp.where(
                ls.two_sided, jnp.abs(cos_light_raw), cos_light_raw
            )
            wi_l = B.to_local(surf.ns, t_ax, b_ax, wi_w)
            f, pdf_b = B.bsdf_eval(mat, wo_l, wi_l)
            pdf_l_sa = L.pdf_area_to_solid_angle(ls.pdf_area, dist2, cos_light)
            candidate = (
                alive & (cos_surf > 1e-6) & (cos_light > 1e-6) & (ls.tri >= 0)
            )
            # Shadow ray with the *unnormalized* segment as direction: the
            # light sits at t == 1 for every lane, so t_max stays a scalar
            # (keeps the occlusion kernel free of per-ray bounds).
            shadow_o = surf.pos + surf.ng * _EPS_RAY
            occluded = intersect_any(
                scene, shadow_o, to_l, t_min=1e-3, t_max=1.0 - 1e-3
            )
            vis = candidate & ~occluded
            mis = L.power_heuristic(pdf_l_sa, pdf_b)
            contrib = (
                throughput
                * f
                * ls.le
                * (cos_surf * mis / jnp.maximum(pdf_l_sa, 1e-12))[..., None]
            )
            radiance = radiance + jnp.where(vis[..., None], contrib, 0.0)

        # -- BSDF sample for the next bounce
        u_b = _uniforms(key, 7919 * bounce + 2, n, 3)
        wi_l, weight, pdf = B.bsdf_sample(mat, wo_l, u_b)
        wi_w = B.to_world(surf.ns, t_ax, b_ax, wi_l)
        # keep the sampled direction above the *geometric* surface too
        geo_ok = jnp.sum(wi_w * surf.ng, -1) > 1e-6
        alive = alive & (pdf > 0.0) & geo_ok
        throughput = throughput * weight
        prev_pdf = pdf
        spec_bounce = jnp.zeros((n,), bool)  # no perfectly-specular lobes yet

        # -- Russian roulette (reference: RussianRoulette default on)
        if bounce >= cfg.rr_start:
            q = jnp.clip(jnp.max(throughput, axis=-1), 0.05, 0.95)
            u_rr = _uniforms(key, 7919 * bounce + 3, n, 1)[..., 0]
            survive = u_rr < q
            alive = alive & survive
            throughput = throughput / q[..., None]

        o = surf.pos + surf.ng * _EPS_RAY
        d = wi_w

    return radiance


def render_spp(scene, camera, width, height, key, cfg: PTConfig = PTConfig(), spp: int = 1):
    """Render ``spp`` samples/pixel, returns [H*W, 3] averaged HDR radiance.

    Each sample re-jitters the camera through a folded key; the spp loop is a
    lax.scan so compile time stays flat in spp.
    """
    o, d = camera.generate_rays(width, height)

    def one(carry, i):
        acc = carry
        k = jax.random.fold_in(key, i)
        # sub-pixel jitter via tiny direction perturbation is handled by the
        # caller re-building the camera; here we vary only the RNG stream.
        acc = acc + trace(scene, o, d, k, cfg)
        return acc, None

    if spp == 1:
        return trace(scene, o, d, key, cfg)
    acc, _ = jax.lax.scan(one, jnp.zeros((width * height, 3)), jnp.arange(spp))
    return acc / spp
