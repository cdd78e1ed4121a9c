"""Spherical harmonics stdlib (core.sh) vs analytic/quadrature oracles."""

import numpy as np
import jax
import jax.numpy as jnp


def _sphere_dirs(n, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    return (v / np.linalg.norm(v, axis=-1, keepdims=True)).astype(np.float32)


def test_basis_orthonormal():
    """int y_i y_j dOmega = delta_ij (Monte Carlo over the sphere)."""
    from zetaray_tpu.core.sh import sh_basis9

    d = jnp.asarray(_sphere_dirs(200_000))
    y = np.asarray(sh_basis9(d))  # [N, 9]
    gram = y.T @ y * (4.0 * np.pi / len(y))
    np.testing.assert_allclose(gram, np.eye(9), atol=0.03)


def test_matches_reference_constants():
    """Basis values match SH.hlsli's Cartesian forms at a known direction,
    and the A_l kernel equals lambda_l * cos_theta_sh_l (SH.hlsli tables)."""
    from zetaray_tpu.core.sh import A_L, COS_THETA_SH, LAMBDA_L, sh_basis9

    w = jnp.asarray([[0.48, -0.6, 0.64]])
    y = np.asarray(sh_basis9(w))[0]
    x, yy, z = 0.48, -0.6, 0.64
    assert np.isclose(y[0], 0.2820947917738781)
    assert np.isclose(y[1], 0.4886025119029199 * yy)
    assert np.isclose(y[3], 0.4886025119029199 * x)
    assert np.isclose(y[4], 1.0925484305920792 * x * yy)
    assert np.isclose(y[6], 0.31539156525252 * (3 * z * z - 1))
    for l in range(3):
        assert np.isclose(A_L[l], LAMBDA_L[l] * COS_THETA_SH[l], rtol=1e-6)


def test_project_reconstruct_low_freq():
    """A band-limited function is reconstructed exactly (up to MC noise):
    f(w) = 1 + w.z + (3 w.z^2 - 1)/2 lives entirely in bands 0-2."""
    from zetaray_tpu.core.sh import eval_sh9, project_function

    d = jnp.asarray(_sphere_dirs(400_000, seed=3))
    f = 1.0 + d[:, 2] + 0.5 * (3.0 * d[:, 2] ** 2 - 1.0)
    coeffs = project_function(d, f)
    test_d = jnp.asarray(_sphere_dirs(512, seed=9))
    got = np.asarray(eval_sh9(coeffs, test_d))
    want = np.asarray(1.0 + test_d[:, 2] + 0.5 * (3.0 * test_d[:, 2] ** 2 - 1.0))
    np.testing.assert_allclose(got, want, atol=0.03)


def test_irradiance_uniform_sky():
    """A uniform unit-radiance sphere gives E(n) = pi for every normal
    (the classic furnace identity), via the A_l convolution."""
    from zetaray_tpu.core.sh import eval_sh9, irradiance_sh9, project_function

    d = jnp.asarray(_sphere_dirs(100_000, seed=5))
    coeffs = irradiance_sh9(project_function(d, jnp.ones(d.shape[0])))
    n = jnp.asarray(_sphere_dirs(64, seed=11))
    e = np.asarray(eval_sh9(coeffs, n))
    np.testing.assert_allclose(e, np.pi, rtol=0.02)


def test_sky_probe_matches_quadrature():
    """The sky irradiance probe agrees with direct cosine-weighted
    quadrature of the sky model for an up normal."""
    from zetaray_tpu.core.sh import eval_sh9, sky_irradiance_probe
    from zetaray_tpu.core.vec3 import V3
    from zetaray_tpu.ops import sky as SK

    sky = SK.SkyParams(sun_dir=(0.3, 0.8, 0.2))
    probe = sky_irradiance_probe(sky, n_samples=8192)
    e_up = np.asarray(eval_sh9(probe, jnp.asarray([[0.0, 1.0, 0.0]])))[0]

    # quadrature: E = int L(w) max(w.y, 0) dw over the sphere
    d = jnp.asarray(_sphere_dirs(100_000, seed=13))
    rad = SK.sky_radiance(V3(d[:, 0], d[:, 1], d[:, 2]), sky, with_disk=False)
    vals = np.stack([np.asarray(rad.x), np.asarray(rad.y), np.asarray(rad.z)], -1)
    cosw = np.maximum(np.asarray(d[:, 1]), 0.0)
    e_ref = (vals * cosw[:, None]).mean(0) * 4.0 * np.pi
    # SH2 is a low-pass basis: expect agreement within ~15% on a smooth sky
    np.testing.assert_allclose(e_up, e_ref, rtol=0.15)
