"""Spherical harmonics (bands 0-2): the reference's SH stdlib
(Common/SH.hlsli:1-85, after Sloan "Stupid SH Tricks" 2008).

Cartesian-form real SH basis, clamped-cosine (irradiance) convolution
constants, and a practical consumer the reference's header only hints at:
projecting the sky dome into 9 RGB coefficients and evaluating irradiance
E(n) -- the standard diffuse light-probe pipeline. All functions broadcast
over leading dims (jnp, device-friendly).
"""

from __future__ import annotations

import jax.numpy as jnp

# Zonal SH coefficients of f(theta) = max(cos theta, 0) and the SH
# convolution weights lambda_l = sqrt(4 pi / (2l + 1)) (SH.hlsli:5-23).
COS_THETA_SH = (0.8862268925, 1.0233267546, 0.4954159260)
LAMBDA_L = (3.544907701, 2.046653415, 1.585330919)
# lambda_l * cos_theta_sh_l: the irradiance convolution kernel A_l
# (SH.hlsli LAMBDA_LxCOS_THETA_SH; == pi, 2pi/3, pi/4 for l = 0, 1, 2)
A_L = (3.141592536, 2.094395197, 0.785398185)


def sh_basis9(w) -> jnp.ndarray:
    """Real SH basis, bands 0-2, at unit directions w [..., 3].

    Returns [..., 9] in the order (00, 1-1, 10, 11, 2-2, 2-1, 20, 21, 22)
    -- the same Cartesian forms as SH.hlsli's SHBasis* functions."""
    x, y, z = w[..., 0], w[..., 1], w[..., 2]
    one = jnp.ones_like(x)
    return jnp.stack(
        [
            0.2820947917738781 * one,
            0.4886025119029199 * y,
            0.4886025119029199 * z,
            0.4886025119029199 * x,
            1.0925484305920792 * x * y,
            1.0925484305920792 * y * z,
            0.31539156525252 * (3.0 * z * z - 1.0),
            1.0925484305920792 * x * z,
            0.5462742152960396 * (x * x - y * y),
        ],
        axis=-1,
    )


def project_to_sh1(w, f):
    """First-band projection y_i(w) * f (SH.hlsli ProjectToSH1): returns
    [..., 4] = (00, 1-1, 10, 11) coefficients."""
    return sh_basis9(w)[..., :4] * f[..., None]


def project_function(dirs, values, weights=None) -> jnp.ndarray:
    """Monte-Carlo / quadrature projection of a spherical function onto
    9 SH coefficients.

    dirs [N, 3] unit sample directions; values [N] or [N, C];
    weights [N] = solid-angle weight per sample (default: uniform sphere,
    4 pi / N). Returns [9] or [9, C]."""
    v = values if values.ndim > 1 else values[:, None]
    if weights is None:
        weights = jnp.full(dirs.shape[0], 4.0 * jnp.pi / dirs.shape[0])
    y = sh_basis9(dirs)  # [N, 9]
    coeffs = jnp.einsum("ni,nc,n->ic", y, v, weights)
    return coeffs if values.ndim > 1 else coeffs[:, 0]


def eval_sh9(coeffs, w):
    """Reconstruct the projected function at directions w [..., 3].
    coeffs [9] or [9, C] -> [...] or [..., C]."""
    y = sh_basis9(w)
    if coeffs.ndim == 1:
        return y @ coeffs
    return jnp.einsum("...i,ic->...c", y, coeffs)


def irradiance_sh9(coeffs):
    """Convolve radiance SH with the clamped-cosine kernel: the resulting
    coefficients evaluate to diffuse irradiance E(n) (divide by pi for the
    Lambertian outgoing radiance). Works on [9] or [9, C]."""
    a = jnp.asarray(
        [A_L[0]] + [A_L[1]] * 3 + [A_L[2]] * 5, dtype=jnp.float32
    )
    return coeffs * (a if coeffs.ndim == 1 else a[:, None])


def sky_irradiance_probe(sky, n_samples: int = 4096, seed: int = 7):
    """Project the sky dome (ops.sky analytic model, no sun disk) into 9
    RGB coefficients convolved for irradiance -- a diffuse sky light probe.
    Returns [9, 3]; evaluate with ``eval_sh9(probe, normals)``."""
    import jax

    from ..core.vec3 import V3
    from ..ops import sky as SK

    u = jax.random.uniform(jax.random.PRNGKey(seed), (n_samples, 2))
    z = 1.0 - 2.0 * u[:, 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * u[:, 1]
    dirs = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], -1)
    rad = SK.sky_radiance(V3(dirs[:, 0], dirs[:, 1], dirs[:, 2]), sky,
                          with_disk=False)
    vals = jnp.stack([rad.x, rad.y, rad.z], -1)
    return irradiance_sh9(project_function(dirs, vals))
