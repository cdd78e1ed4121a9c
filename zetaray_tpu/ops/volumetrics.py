"""Froxel volumetric inscattering: the reference's Sky Inscattering pass.

Counterpart of Sky/Inscattering.hlsl (Sky.h:38-82) + Volumetric.hlsli: a
frustum-aligned voxel grid (X x Y screen tiles, Z exponentially-spaced
depth slices). Each froxel samples atmosphere density at its altitude,
sun transmittance, and a sun-shadow visibility ray; in-scattered radiance
and view-path transmittance accumulate front-to-back along each (x, y)
ray. The reference does the accumulation with wave prefix sums +
groupshared cross-wave fixup (Inscattering.hlsl:94-196); here it is one
``jnp.cumsum`` over the slice axis -- XLA's scan is the TPU-native prefix
sum. Compositing samples the grid trilinearly per pixel and applies
``color * Tr + Ls`` (Compositing.hlsl:89-95).

Scene scale: the atmosphere works in km; ``unit_to_km`` converts scene
units. For room-scale scenes physical air is invisible, so
``density_scale`` boosts the medium (the reference exposes the same knobs
as tweakables: g, sigma scales).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from .sky import _BETA_M, _BETA_R, _MIE_G, _MIE_H, _RAYLEIGH_H, _phase_mie


@dataclass(frozen=True)
class VolumetricsConfig:
    grid: tuple = (24, 16, 32)  # (X, Y, Z slices); reference 192x108xN
    near: float = 0.05
    far: float = 30.0  # scene units
    depth_exp: float = 2.0  # exponential slice spacing (DepthMappingExp)
    unit_to_km: float = 0.001  # scene units -> km
    density_scale: float = 1.0  # artistic medium boost for small scenes
    sun_shadows: bool = True  # one occlusion ray per froxel (god rays)
    mie_only: bool = False  # skip Rayleigh (pure fog look)


def _phase_rayleigh(c):
    return 3.0 / (16.0 * np.pi) * (1.0 + c * c)


def _slice_depths(cfg: VolumetricsConfig):
    z = cfg.grid[2]
    k = jnp.arange(z + 1, dtype=jnp.float32)
    return cfg.near + ((k / z) ** cfg.depth_exp) * (cfg.far - cfg.near)


def build_froxels(scene, camera, sky, cfg: VolumetricsConfig, frame_idx=0):
    """-> {"ls": [Z, Y, X, 3] in-scattered radiance camera->slice-end,
           "tr": [Z, Y, X, 3] view transmittance camera->slice-end}."""
    from ..accel.intersect import intersect_occluded
    from ..core.sampling import halton

    x, y, z = cfg.grid
    n = x * y
    o, d = camera.generate_rays(x, y)  # froxel-center rays [N, 3]
    fwd = jnp.asarray(camera.forward)
    cosz = jnp.maximum(d @ fwd, 1e-3)

    edges = _slice_depths(cfg)  # [Z+1] view-forward depths
    z0 = edges[:-1][:, None] / cosz[None, :]  # [Z, N] ray-parameter t
    ds = (edges[1:] - edges[:-1])[:, None] / cosz[None, :]
    # per-frame Halton jitter of the sample point inside the slice
    # (Inscattering.hlsl Halton[FrameNum & 7])
    off = float(halton(int(frame_idx) % 8 + 1, 0))
    t_mid = z0 + off * ds
    pos = o[None, :, :] + d[None, :, :] * t_mid[..., None]  # [Z, N, 3]

    # atmosphere density at altitude (exponential profiles, sky.py model)
    h_km = jnp.maximum(pos[..., 1] * cfg.unit_to_km, 0.0)
    dens_r = jnp.exp(-h_km / _RAYLEIGH_H) * cfg.density_scale
    if cfg.mie_only:
        dens_r = dens_r * 0.0
    dens_m = jnp.exp(-h_km / _MIE_H) * cfg.density_scale

    sun = np.asarray(sky.sun_dir, np.float64)
    sun = (sun / np.linalg.norm(sun)).astype(np.float32)
    sun_mu = max(float(sun[1]), 1e-2)
    # flat-atmosphere sun transmittance from the sample altitude (the same
    # closed form the analytic sky path uses, sky.py)
    sun_path_r = _RAYLEIGH_H / sun_mu * dens_r
    sun_path_m = _MIE_H / sun_mu * dens_m
    beta_r = jnp.asarray(_BETA_R)
    beta_m = jnp.asarray(_BETA_M)
    tr_sun = jnp.exp(
        -(beta_r[None, None, :] * sun_path_r[..., None]
          + beta_m[None, None, :] * sun_path_m[..., None])
    )  # [Z, N, 3]

    if cfg.sun_shadows:
        sd = jnp.broadcast_to(jnp.asarray(sun)[None, :], (z * n, 3))
        occ = intersect_occluded(
            scene, pos.reshape(-1, 3), sd, t_min=1e-3, t_max=1e8
        ).reshape(z, n)
        tr_sun = tr_sun * (~occ)[..., None].astype(jnp.float32)

    ds_km = ds * cfg.unit_to_km
    # view-path optical thickness per slice + cumulative transmittance
    dtau = (
        beta_r[None, None, :] * dens_r[..., None]
        + beta_m[None, None, :] * dens_m[..., None]
    ) * ds_km[..., None]
    tau = jnp.cumsum(dtau, axis=0)
    tr = jnp.exp(-tau)  # camera -> slice end
    tr_mid = jnp.exp(-(tau - 0.5 * dtau))  # midpoint (slice's own sample)

    cos_theta = d @ jnp.asarray(sun)  # angle sun -> view ray
    ph_r = _phase_rayleigh(cos_theta)[None, :, None]
    ph_m = _phase_mie(cos_theta, _MIE_G)[None, :, None]
    sigma_s = (
        beta_r[None, None, :] * dens_r[..., None] * ph_r
        + beta_m[None, None, :] * dens_m[..., None] * ph_m
    )
    # directional-light inscatter uses the sun *irradiance* (radiance x
    # disk solid angle), consistent with surface NEE (sky.sun_irradiance)
    from .sky import sun_irradiance

    e_sun = jnp.asarray(sun_irradiance(sky))
    s_slice = e_sun[None, None, :] * tr_sun * sigma_s * ds_km[..., None] * tr_mid
    ls = jnp.cumsum(s_slice, axis=0)  # camera -> slice end

    return {
        "ls": ls.reshape(z, y, x, 3),
        "tr": tr.reshape(z, y, x, 3),
    }


def _trilinear(grid, u, v, s):
    """grid [Z, Y, X, 3]; u, v in [0,1] screen coords, s fractional slice
    index in [0, Z-1]. Returns [N, 3]."""
    zn, yn, xn, _ = grid.shape
    fx = jnp.clip(u * xn - 0.5, 0.0, xn - 1.0)
    fy = jnp.clip(v * yn - 0.5, 0.0, yn - 1.0)
    fz = jnp.clip(s, 0.0, zn - 1.0)
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    z0 = jnp.floor(fz).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, xn - 1)
    y1 = jnp.minimum(y0 + 1, yn - 1)
    z1 = jnp.minimum(z0 + 1, zn - 1)
    wx = (fx - x0)[:, None]
    wy = (fy - y0)[:, None]
    wz = (fz - z0)[:, None]
    flat = grid.reshape(-1, 3)

    def at(zi, yi, xi):
        return flat[(zi * yn + yi) * xn + xi]

    c00 = at(z0, y0, x0) * (1 - wx) + at(z0, y0, x1) * wx
    c01 = at(z0, y1, x0) * (1 - wx) + at(z0, y1, x1) * wx
    c10 = at(z1, y0, x0) * (1 - wx) + at(z1, y0, x1) * wx
    c11 = at(z1, y1, x0) * (1 - wx) + at(z1, y1, x1) * wx
    c0 = c00 * (1 - wy) + c01 * wy
    c1 = c10 * (1 - wy) + c11 * wy
    return c0 * (1 - wz) + c1 * wz


def slice_of_depth(zv, cfg: VolumetricsConfig):
    """View-forward depth -> fractional slice index (inverse exp mapping)."""
    z = cfg.grid[2]
    t = jnp.clip((zv - cfg.near) / max(cfg.far - cfg.near, 1e-6), 0.0, 1.0)
    return t ** (1.0 / cfg.depth_exp) * z - 0.5


def apply_inscattering(hdr, gbuf, camera, froxels, cfg: VolumetricsConfig,
                       width, height, row0=0, height_full=None):
    """hdr [3, h, w] += fog: color * Tr(depth) + Ls(depth). Misses use the
    grid far plane. ``row0``/``height_full``: sharded row-band support."""
    from ..accel.megakernel import G

    hf = height_full if height_full is not None else height
    _, h, w = hdr.shape
    n = h * w
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    ys = (jnp.arange(h, dtype=jnp.float32) + row0 + 0.5) / hf
    u = jnp.tile(xs, h)
    v = jnp.repeat(ys, w)

    depth_t = gbuf[G.DEPTH]
    valid = gbuf[G.VALID] > 0.5
    # stored depth is the Euclidean ray parameter; view-forward z = t * cos
    wo = gbuf[G.WO : G.WO + 3]
    fwd = jnp.asarray(camera.forward)
    cosz = jnp.maximum(-(wo[0] * fwd[0] + wo[1] * fwd[1] + wo[2] * fwd[2]), 1e-3)
    zv = jnp.where(valid, depth_t * cosz, cfg.far)
    s = slice_of_depth(zv, cfg)

    tr = _trilinear(froxels["tr"], u, v, s)  # [N, 3]
    ls = _trilinear(froxels["ls"], u, v, s)
    out = hdr.reshape(3, n) * tr.T + ls.T
    return out.reshape(3, h, w)
