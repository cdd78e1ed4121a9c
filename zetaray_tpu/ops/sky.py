"""Sun + sky: single-scattering atmosphere (LUT) and an analytic fast path.

Counterpart of the reference's Sky pass (Sky.h:26-112: Hillaire-style
transmittance + 256x128 sky-view LUT + sun disk; Volumetric.hlsli phase
functions). Two evaluators:

  - ``build_sky_view_lut`` + ``sample_sky_lut``: numerical single
    scattering (Rayleigh + Mie, exponential atmosphere) into a lat/long
    LUT, rebuilt when the sun moves -- the reference's SkyViewLUT.
  - ``sky_radiance``: closed-form approximation of the same model (pure
    VPU math, no gathers) usable *inside* Pallas kernels for miss rays.

Units: radiance is arbitrary-but-consistent "sun = sun_intensity" scale,
matching how the reference exposes SunIlluminance as a tweakable.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..core import vec3 as v3
from ..core.vec3 import V3

# Earth-ish constants (km), as in the reference's defaults
_PLANET_R = 6360.0
_ATMOS_R = 6460.0
_RAYLEIGH_H = 8.0
_MIE_H = 1.2
_BETA_R = np.array([5.802e-3, 13.558e-3, 33.1e-3], np.float32)  # /km
_BETA_M = np.array([3.996e-3, 3.996e-3, 3.996e-3], np.float32)
_MIE_G = 0.8


@dataclass(frozen=True)
class SkyParams:
    sun_dir: tuple = (0.32, 0.92, 0.22)  # unit-ish, toward the sun
    sun_intensity: float = 20.0
    sun_angular_radius: float = 0.00465  # radians (~0.266 deg)
    ground_albedo: float = 0.3


def _phase_rayleigh(c):
    return 3.0 / (16.0 * jnp.pi) * (1.0 + c * c)


def _phase_mie(c, g=_MIE_G):
    g2 = g * g
    den = 1.0 + g2 - 2.0 * g * c
    return (1.0 - g2) / (4.0 * jnp.pi * den * jnp.sqrt(jnp.maximum(den, 1e-6)))


def _atmosphere_intersect(h0, mu):
    """March distance from altitude h0 along cos-zenith mu: to the
    atmosphere top, or to the ground for below-horizon rays."""
    r = _PLANET_R + h0
    b = r * mu
    disc_a = b * b - (r * r - _ATMOS_R * _ATMOS_R)
    t_atm = -b + jnp.sqrt(jnp.maximum(disc_a, 0.0))
    disc_g = b * b - (r * r - _PLANET_R * _PLANET_R)
    t_gnd = -b - jnp.sqrt(jnp.maximum(disc_g, 0.0))
    hits_ground = (disc_g > 0.0) & (t_gnd > 0.0)
    return jnp.where(hits_ground, t_gnd, t_atm)


def build_sky_view_lut(params: SkyParams, width=256, height=128, steps=32):
    """Numerical single-scattering sky-view LUT [height, width, 3].

    Rows = view zenith (0=up), cols = azimuth relative to the sun.
    """
    sun = np.asarray(params.sun_dir, np.float64)
    sun = sun / np.linalg.norm(sun)
    cos_sun_z = sun[1]

    vz = jnp.linspace(0.0, jnp.pi, height)  # view zenith angle
    az = jnp.linspace(0.0, 2.0 * jnp.pi, width)  # azimuth from sun
    zz, aa = jnp.meshgrid(vz, az, indexing="ij")
    mu = jnp.cos(zz)
    # view dir with sun in the x/y plane: sun azimuth = 0
    sun_xz = np.sqrt(max(1e-12, 1.0 - cos_sun_z * cos_sun_z))
    cos_view_sun = mu * cos_sun_z + jnp.sin(zz) * jnp.cos(aa) * sun_xz

    h0 = 0.2  # camera altitude km
    t_max = _atmosphere_intersect(h0, mu)
    beta_r = jnp.asarray(_BETA_R)
    beta_m = jnp.asarray(_BETA_M)

    def body(i, acc):
        l_acc, tr = acc
        t = (i + 0.5) / steps * t_max
        r = jnp.sqrt(
            (_PLANET_R + h0) ** 2 + t * t + 2.0 * (_PLANET_R + h0) * t * mu
        )
        h = jnp.maximum(r - _PLANET_R, 0.0)
        dens_r = jnp.exp(-h / _RAYLEIGH_H)
        dens_m = jnp.exp(-h / _MIE_H)
        dt = t_max / steps
        ext = (
            beta_r[None, None, :] * dens_r[..., None]
            + beta_m[None, None, :] * 1.11 * dens_m[..., None]
        )
        tr_step = jnp.exp(-ext * dt[..., None])
        # sun transmittance from the sample (flat-ish approx along sun dir)
        sun_mu = jnp.clip(cos_sun_z, 0.02, 1.0)
        sun_path_r = _RAYLEIGH_H / sun_mu * dens_r
        sun_path_m = _MIE_H / sun_mu * dens_m
        tr_sun = jnp.exp(
            -(
                beta_r[None, None, :] * sun_path_r[..., None]
                + beta_m[None, None, :] * 1.11 * sun_path_m[..., None]
            )
        )
        scat = (
            beta_r[None, None, :] * dens_r[..., None] * _phase_rayleigh(cos_view_sun)[..., None]
            + beta_m[None, None, :] * dens_m[..., None] * _phase_mie(cos_view_sun)[..., None]
        )
        l_acc = l_acc + tr * tr_sun * scat * dt[..., None]
        return (l_acc, tr * tr_step)

    zero = jnp.zeros((height, width, 3))
    l, _ = jax.lax.fori_loop(0, steps, body, (zero, jnp.ones((height, width, 3))))
    return l * params.sun_intensity


def sample_sky_lut(lut, d: jnp.ndarray, params: SkyParams):
    """Sample the LUT for directions [N, 3] (XLA path, bilinear-nearest)."""
    h, w, _ = lut.shape
    sun = np.asarray(params.sun_dir, np.float64)
    sun = sun / np.linalg.norm(sun)
    up = jnp.asarray([0.0, 1.0, 0.0])
    zen = jnp.arccos(jnp.clip(d[:, 1], -1.0, 1.0))
    # azimuth relative to sun
    sun_flat = jnp.asarray([sun[0], 0.0, sun[2]])
    sun_flat = sun_flat / jnp.maximum(jnp.linalg.norm(sun_flat), 1e-6)
    d_flat = jnp.stack([d[:, 0], jnp.zeros_like(zen), d[:, 2]], -1)
    d_norm = jnp.maximum(jnp.linalg.norm(d_flat, axis=-1), 1e-6)
    cos_az = jnp.clip((d_flat @ sun_flat) / d_norm, -1.0, 1.0)
    az = jnp.arccos(cos_az)
    iy = jnp.clip((zen / jnp.pi * (h - 1)).astype(jnp.int32), 0, h - 1)
    ix = jnp.clip((az / jnp.pi * 0.5 * (w - 1)).astype(jnp.int32), 0, w - 1)
    base = lut[iy, ix]
    return base + sun_disk(d, params)


# Sun disk radiance = intensity * this scale; chosen so the sun's direct
# irradiance (radiance x disk solid angle) is a few x the total sky ambient,
# matching a clear-day direct/diffuse ratio.
SUN_RADIANCE_SCALE = 2500.0
SUN_COLOR = (1.0, 0.96, 0.9)


def sun_irradiance(params: SkyParams) -> np.ndarray:
    """Irradiance from the sun disk on a surface facing it [3]."""
    omega = np.pi * params.sun_angular_radius**2
    return (
        params.sun_intensity * SUN_RADIANCE_SCALE * omega * np.asarray(SUN_COLOR)
    ).astype(np.float32)


def sun_disk(d: jnp.ndarray, params: SkyParams):
    """Direct sun radiance for directions [N, 3] (smooth-edged disk)."""
    sun = np.asarray(params.sun_dir, np.float64)
    sun = (sun / np.linalg.norm(sun)).astype(np.float32)
    c = d @ jnp.asarray(sun)
    cos_r = float(np.cos(params.sun_angular_radius))
    edge = jnp.clip((c - cos_r) / max(1e-6, 1.0 - cos_r) * 4.0, 0.0, 1.0)
    disk = edge * params.sun_intensity * SUN_RADIANCE_SCALE
    return disk[:, None] * jnp.asarray(SUN_COLOR)


def sky_radiance(d: V3, params: SkyParams, with_disk: bool = True):
    """Analytic sky approximation in SoA form (kernel-safe, no gathers).

    Rayleigh-gradient + Mie forward glow + optional sun disk; tuned to
    loosely match the LUT integrator in overall energy (tested
    statistically). ``with_disk=False`` when the sun is handled by NEE
    (delta-light MIS: BSDF rays must not double count the disk).
    """
    sun = np.asarray(params.sun_dir, np.float64)
    sun = (sun / np.linalg.norm(sun)).astype(np.float32)
    sd = V3(
        jnp.full_like(d.x, float(sun[0])),
        jnp.full_like(d.x, float(sun[1])),
        jnp.full_like(d.x, float(sun[2])),
    )
    c = jnp.clip(v3.dot(d, sd), -1.0, 1.0)
    up = jnp.clip(d.y, -1.0, 1.0)
    # optical-depth proxy: longer path near the horizon
    m = 1.0 / jnp.maximum(up * 0.8 + 0.22, 0.05)
    # scales fitted against build_sky_view_lut (test_post_chain checks the
    # energy ratio stays within an order of magnitude)
    beta_r = _BETA_R * _RAYLEIGH_H
    ray = _phase_rayleigh(c) * m
    mie = _phase_mie(c) * m * (_BETA_M[0] * _MIE_H * 2.2)
    r = ray * beta_r[0] + mie
    g = ray * beta_r[1] + mie
    b = ray * beta_r[2] + mie
    horizon_fade = jnp.clip((up + 0.08) * 12.0, 0.0, 1.0)
    scale = params.sun_intensity * horizon_fade
    if not with_disk:
        return V3(r * scale, g * scale, b * scale)
    cos_r = float(np.cos(params.sun_angular_radius))
    edge = jnp.clip((c - cos_r) / max(1e-6, 1.0 - cos_r) * 4.0, 0.0, 1.0)
    disk = edge * params.sun_intensity * SUN_RADIANCE_SCALE
    return V3(
        r * scale + disk * SUN_COLOR[0],
        g * scale + disk * SUN_COLOR[1],
        b * scale + disk * SUN_COLOR[2],
    )
