"""Post-processing tests: exposure, tonemap, sRGB."""

import numpy as np
import jax.numpy as jnp

from zetaray_tpu.ops import post


def test_histogram_exposure_uniform_image():
    for lum in [0.05, 0.18, 2.0]:
        img = jnp.full((64, 64, 3), lum)
        e = float(post.histogram_exposure(img))
        # exposure should map the average luminance to ~0.18 (bin-center
        # quantization allows a few percent)
        assert abs(e * lum - 0.18) / 0.18 < 0.1, (lum, e)


def test_histogram_exposure_ignores_percentile_outliers():
    img = np.full((64, 64, 3), 0.18, np.float32)
    img[0, :2] = 1e6  # fireflies above the high percentile
    e = float(post.histogram_exposure(jnp.asarray(img)))
    assert abs(e - 1.0) < 0.2


def test_agx_basics():
    c = jnp.asarray([[0.0, 0.0, 0.0], [0.18, 0.18, 0.18], [100.0, 100.0, 100.0]])
    out = np.asarray(post.tonemap_agx(c))
    assert (out >= 0).all() and (out <= 1).all()
    assert out[0].max() < 0.02  # black stays black
    assert out[2].min() > 0.95  # overexposed -> white
    assert 0.3 < out[1, 0] < 0.6  # middle gray lands mid-range
    # monotonic in exposure
    greys = jnp.stack([jnp.full((3,), v) for v in [0.01, 0.1, 0.18, 1.0, 5.0]])
    g = np.asarray(post.tonemap_agx(greys))[:, 0]
    assert (np.diff(g) > 0).all()


def test_agx_looks_run():
    c = jnp.asarray([[0.2, 0.3, 0.1]])
    for look in ["golden", "punchy"]:
        out = np.asarray(post.tonemap_agx(c, look))
        assert out.shape == (1, 3) and (out >= 0).all() and (out <= 1).all()


def test_srgb_encode():
    x = jnp.asarray([0.0, 0.0031308, 0.5, 1.0])
    y = np.asarray(post.srgb_encode(x[:, None] * jnp.ones(3)))
    np.testing.assert_allclose(y[0], 0.0, atol=1e-6)
    np.testing.assert_allclose(y[2, 0], 0.7353569, atol=1e-4)
    np.testing.assert_allclose(y[3], 1.0, atol=1e-5)


def test_to_u8():
    assert post.to_u8(jnp.asarray([1.0])).dtype == jnp.uint8
    assert int(post.to_u8(jnp.asarray([0.5]))[0]) == 128


def test_weighted_avg_exposure_uniform_image():
    # reference formula check (AutoExposure_WeightedAvg.hlsl): a uniform
    # image's inverse-mapped mean equals its luminance, so exposure is
    # 1 / ((78 / (0.65 * 100)) * (lum * 100 / 12.5))
    for lum in [0.05, 0.18, 2.0]:
        img = jnp.full((3, 64, 64), lum)
        e, avg = post.weighted_avg_exposure_p(img)
        expected_avg = lum  # within the [MinLum, MaxLum] range
        assert abs(float(avg) - expected_avg) / expected_avg < 0.02, lum
        lum_max = (78.0 / (0.65 * 100.0)) * (float(avg) * 100.0 / 12.5)
        assert abs(float(e) - 1.0 / lum_max) / (1.0 / lum_max) < 1e-4


def test_weighted_avg_exposure_adaptation():
    img = jnp.full((3, 16, 16), 1.0)
    # dt=0: no movement from prev; large dt: full convergence
    _, a0 = post.weighted_avg_exposure_p(img, prev_avg=0.1, dt=0.0)
    _, a1 = post.weighted_avg_exposure_p(img, prev_avg=0.1, dt=10.0)
    assert abs(float(a0) - 0.1) < 1e-5
    assert abs(float(a1) - 1.0) < 1e-3


def test_weighted_avg_excludes_invalid():
    img = np.full((3, 16, 16), 0.5, np.float32)
    img[:, 0, :] = 0.0  # lum == 0: the reference's excluded bin 0
    _, avg = post.weighted_avg_exposure_p(jnp.asarray(img))
    assert abs(float(avg) - 0.5) < 0.01
