"""Edge-aware denoising: firefly filter + a-trous wavelet filter.

Counterparts of the reference's FireflyFilter.hlsl (clamp outliers against
the neighborhood) and the SVGF-style a-trous filter family used by the
BASELINE "ReSTIR GI + a-trous denoise" config. All image-space stencils are
expressed as jnp.roll sweeps -- static shifts that XLA fuses and that shard
cleanly over pixel tiles with halo exchange.

Layout: the native implementations are PLANAR ([3, H, W] channel-first,
image rows on axis 1/0) -- channel-last [H, W, 3] wastes 125/128 VPU lanes
(see ops.post notes). Channel-last wrappers keep the old API for tests.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from .post import luminance_p


def _roll2(a, dy, dx, ry, rx):
    """Roll image rows/cols; (ry, rx) are the row/col axis indices."""
    return jnp.roll(jnp.roll(a, dy, axis=ry), dx, axis=rx)


def firefly_filter_p(img, factor: float = 3.0):
    """Clamp pixels whose luminance exceeds ``factor`` x the 3x3 neighbor
    mean (excluding self), preserving hue (FireflyFilter.hlsl behavior).
    img: [3, H, W]."""
    acc = jnp.zeros_like(img)
    cnt = 0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            acc = acc + _roll2(img, dy, dx, 1, 2)
            cnt += 1
    mean = acc / cnt
    lum = luminance_p(img)
    lum_mean = luminance_p(mean)
    limit = factor * jnp.maximum(lum_mean, 1e-4)
    scale = jnp.where(lum > limit, limit / jnp.maximum(lum, 1e-8), 1.0)
    return img * scale[None]


def firefly_filter(img, factor: float = 3.0):
    """Channel-last wrapper: img [H, W, 3]."""
    return firefly_filter_p(jnp.moveaxis(img, -1, 0), factor).transpose(1, 2, 0)


@dataclass(frozen=True)
class ATrousConfig:
    iterations: int = 4
    sigma_color: float = 0.15
    sigma_normal: float = 64.0  # exponent on normal agreement
    sigma_depth: float = 1.0


# 5-tap B3-spline weights (separable a-trous kernel)
_B3 = (1.0 / 16.0, 1.0 / 4.0, 3.0 / 8.0, 1.0 / 4.0, 1.0 / 16.0)


def atrous_iteration_p(out, normal, depth, vf, step: int, cfg: ATrousConfig = ATrousConfig()):
    """One a-trous pass at tap spacing ``step``, planar.

    out/normal: [3, H, W]; depth/vf: [H, W] (vf = validity as f32).
    Separated out so the sharded frame can halo-exchange between iterations
    (each pass reads up to 2*step rows away); jnp.roll wraparound at the
    array boundary matches the circular halo exchange exactly.
    """
    lum_c = luminance_p(out)
    acc = jnp.zeros_like(out)
    wacc = jnp.zeros_like(depth)
    for j, wy in enumerate(_B3):
        for i, wx in enumerate(_B3):
            dy = (j - 2) * step
            dx = (i - 2) * step
            w_k = wy * wx
            c_n = _roll2(out, dy, dx, 1, 2)
            n_n = _roll2(normal, dy, dx, 1, 2)
            d_n = _roll2(depth, dy, dx, 0, 1)
            v_n = _roll2(vf, dy, dx, 0, 1)
            w_col = jnp.exp(-jnp.abs(luminance_p(c_n) - lum_c) / cfg.sigma_color)
            w_nrm = jnp.maximum(jnp.sum(n_n * normal, 0), 0.0) ** cfg.sigma_normal
            w_dep = jnp.exp(
                -jnp.abs(d_n - depth) / (cfg.sigma_depth * jnp.maximum(depth, 1e-3))
            )
            wgt = w_k * w_col * w_nrm * w_dep * v_n
            acc = acc + c_n * wgt[None]
            wacc = wacc + wgt
    return jnp.where(
        ((vf > 0.5) & (wacc > 1e-6))[None],
        acc / jnp.maximum(wacc, 1e-6)[None],
        out,
    )


def atrous_denoise_p(img, normal, depth, valid, cfg: ATrousConfig = ATrousConfig()):
    """Edge-aware a-trous wavelet filtering, planar.

    img/normal: [3, H, W]; depth: [H, W]; valid: [H, W] bool.
    Each iteration doubles the tap spacing (classic a-trous), weighting taps
    by color/normal/depth agreement so edges stay sharp.
    """
    out = img
    vf = valid.astype(jnp.float32)
    for it in range(cfg.iterations):
        out = atrous_iteration_p(out, normal, depth, vf, 1 << it, cfg)
    return out


def atrous_denoise(img, normal, depth, valid, cfg: ATrousConfig = ATrousConfig()):
    """Channel-last wrapper: img/normal [H, W, 3]."""
    out = atrous_denoise_p(
        jnp.moveaxis(img, -1, 0), jnp.moveaxis(normal, -1, 0), depth, valid, cfg
    )
    return out.transpose(1, 2, 0)
