"""Edge-aware denoising: firefly filter + a-trous wavelet filter.

Counterparts of the reference's FireflyFilter.hlsl (clamp outliers against
the neighborhood) and the SVGF-style a-trous filter family used by the
BASELINE "ReSTIR GI + a-trous denoise" config. All image-space stencils are
expressed as jnp.roll sweeps -- static shifts that XLA fuses and that shard
cleanly over pixel tiles with halo exchange.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..core.packing import luminance


def firefly_filter(img, factor: float = 3.0):
    """Clamp pixels whose luminance exceeds ``factor`` x the 3x3 neighbor
    mean (excluding self), preserving hue (FireflyFilter.hlsl behavior)."""
    acc = jnp.zeros_like(img)
    cnt = 0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            acc = acc + jnp.roll(jnp.roll(img, dy, axis=0), dx, axis=1)
            cnt += 1
    mean = acc / cnt
    lum = luminance(img)
    lum_mean = luminance(mean)
    limit = factor * jnp.maximum(lum_mean, 1e-4)
    scale = jnp.where(lum > limit, limit / jnp.maximum(lum, 1e-8), 1.0)
    return img * scale[..., None]


@dataclass(frozen=True)
class ATrousConfig:
    iterations: int = 4
    sigma_color: float = 0.15
    sigma_normal: float = 64.0  # exponent on normal agreement
    sigma_depth: float = 1.0


# 5-tap B3-spline weights (separable a-trous kernel)
_B3 = (1.0 / 16.0, 1.0 / 4.0, 3.0 / 8.0, 1.0 / 4.0, 1.0 / 16.0)


def atrous_iteration(out, normal, depth, vf, step: int, cfg: ATrousConfig = ATrousConfig()):
    """One a-trous pass at tap spacing ``step`` (vf: validity as f32).

    Separated out so the sharded frame can halo-exchange between iterations
    (each pass reads up to 2*step rows away); jnp.roll wraparound at the
    array boundary matches the circular halo exchange exactly.
    """
    lum_c = luminance(out)
    acc = jnp.zeros_like(out)
    wacc = jnp.zeros(out.shape[:2])
    for j, wy in enumerate(_B3):
        for i, wx in enumerate(_B3):
            dy = (j - 2) * step
            dx = (i - 2) * step
            w_k = wy * wx
            sh = lambda a: jnp.roll(jnp.roll(a, dy, axis=0), dx, axis=1)
            c_n = sh(out)
            n_n = sh(normal)
            d_n = sh(depth)
            v_n = sh(vf)
            w_col = jnp.exp(
                -jnp.abs(luminance(c_n) - lum_c) / cfg.sigma_color
            )
            w_nrm = jnp.maximum(jnp.sum(n_n * normal, -1), 0.0) ** cfg.sigma_normal
            w_dep = jnp.exp(
                -jnp.abs(d_n - depth)
                / (cfg.sigma_depth * jnp.maximum(depth, 1e-3))
            )
            wgt = w_k * w_col * w_nrm * w_dep * v_n
            acc = acc + c_n * wgt[..., None]
            wacc = wacc + wgt
    return jnp.where(
        ((vf > 0.5) & (wacc > 1e-6))[..., None],
        acc / jnp.maximum(wacc, 1e-6)[..., None],
        out,
    )


def atrous_denoise(img, normal, depth, valid, cfg: ATrousConfig = ATrousConfig()):
    """Edge-aware a-trous wavelet filtering.

    img: [H, W, 3]; normal: [H, W, 3] (unit); depth: [H, W]; valid: [H, W].
    Each iteration doubles the tap spacing (classic a-trous), weighting taps
    by color/normal/depth agreement so edges stay sharp.
    """
    out = img
    vf = valid.astype(jnp.float32)
    for it in range(cfg.iterations):
        out = atrous_iteration(out, normal, depth, vf, 1 << it, cfg)
    return out
