"""Sky, TAA, denoise tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zetaray_tpu.ops import sky as SK
from zetaray_tpu.ops import taa as TA
from zetaray_tpu.ops import denoise as DN
from zetaray_tpu.core.vec3 import V3
from zetaray_tpu.scene import Camera


def test_sky_lut_properties():
    p = SK.SkyParams()
    lut = np.asarray(SK.build_sky_view_lut(p, width=64, height=32, steps=16))
    assert np.isfinite(lut).all() and (lut >= 0).all()
    # sky is blue away from the sun: top-of-sky (row 4), opposite azimuth
    px = lut[4, 32]
    assert px[2] > px[0]
    # horizon rows brighter than zenith in total (longer path)
    assert lut[14].mean() > lut[2].mean() * 0.5


def test_sky_analytic_matches_lut_energy_scale():
    p = SK.SkyParams()
    lut = SK.build_sky_view_lut(p, width=128, height=64, steps=24)
    rng = np.random.default_rng(0)
    d = rng.normal(size=(2000, 3))
    d[:, 1] = np.abs(d[:, 1])  # upper hemisphere
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    dj = jnp.asarray(d.astype(np.float32))
    lut_vals = np.asarray(SK.sample_sky_lut(lut, dj, p))
    ana = SK.sky_radiance(V3(dj[:, 0], dj[:, 1], dj[:, 2]), p)
    ana_vals = np.stack([np.asarray(ana.x), np.asarray(ana.y), np.asarray(ana.z)], -1)
    assert np.isfinite(ana_vals).all() and (ana_vals >= 0).all()
    # same order of magnitude on average (loose: the analytic model is a fit)
    ratio = ana_vals.mean() / max(lut_vals.mean(), 1e-6)
    assert 0.1 < ratio < 10.0, ratio


def test_sun_disk():
    p = SK.SkyParams()
    sun = np.asarray(p.sun_dir) / np.linalg.norm(p.sun_dir)
    d = jnp.asarray([sun, [0, 1, 0]], jnp.float32)
    disk = np.asarray(SK.sun_disk(d, p))
    assert disk[0].max() > 100.0  # looking at the sun is very bright
    assert disk[1].max() == 0.0


def test_taa_static_camera_converges():
    cam = Camera.look_at((0, 0, 0), (0, 0, -1), vfov_deg=60, aspect=1.0)
    h = w = 16
    rng = np.random.default_rng(1)
    truth = np.ones((h, w, 3), np.float32) * 0.5
    pos = np.zeros((h, w, 3), np.float32)
    pos[..., 2] = -2.0  # plane in front of the camera
    # pixel-correct world positions so reprojection is identity
    o, d = cam.generate_rays(w, h)
    t = 2.0 / -np.asarray(d)[:, 2]
    pos = (np.asarray(o) + t[:, None] * np.asarray(d)).reshape(h, w, 3)
    valid = jnp.ones((h, w), bool)
    hist = jnp.asarray(truth + rng.normal(0, 0.3, truth.shape).astype(np.float32))
    for i in range(20):
        curr = jnp.asarray(truth + rng.normal(0, 0.3, truth.shape).astype(np.float32))
        hist = TA.taa_resolve(curr, hist, jnp.asarray(pos), valid, cam,
                              TA.TAAConfig(clamp=False))
    err = np.abs(np.asarray(hist) - truth).mean()
    assert err < 0.12  # variance reduced vs single frame sigma=0.3


def test_firefly_filter_kills_outlier():
    img = np.full((8, 8, 3), 0.2, np.float32)
    img[4, 4] = 50.0
    out = np.asarray(DN.firefly_filter(jnp.asarray(img)))
    assert out[4, 4].max() < 1.0
    np.testing.assert_allclose(out[0, 0], 0.2, rtol=1e-5)


def test_atrous_smooths_noise_preserves_edges():
    rng = np.random.default_rng(2)
    h = w = 32
    img = np.zeros((h, w, 3), np.float32)
    img[:, : w // 2] = 0.2
    img[:, w // 2 :] = 0.8
    noisy = img + rng.normal(0, 0.1, img.shape).astype(np.float32)
    normal = np.zeros((h, w, 3), np.float32)
    normal[..., 2] = 1.0
    depth = np.ones((h, w), np.float32)
    out = np.asarray(
        DN.atrous_denoise(
            jnp.asarray(noisy), jnp.asarray(normal), jnp.asarray(depth),
            jnp.ones((h, w), bool),
        )
    )
    # noise reduced on flats
    flat_err_in = np.abs(noisy[:, : w // 4] - 0.2).mean()
    flat_err_out = np.abs(out[:, : w // 4] - 0.2).mean()
    assert flat_err_out < flat_err_in * 0.6
    # edge preserved: the two halves stay distinct
    assert out[:, : w // 4].mean() < 0.35 and out[:, 3 * w // 4 :].mean() > 0.65
