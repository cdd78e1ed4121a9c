"""Path tracer integration tests (tiny resolutions; CPU backend).

The key correctness test is NEE-vs-BSDF-sampling agreement: with correct MIS
weights and pdfs, both estimators must converge to the same image mean.
This is the TPU-native analog of the reference validating against a
known-good integrator (SURVEY.md section 4 implications).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zetaray_tpu.scene import Camera
from zetaray_tpu.ops.pathtracer import PTConfig, trace


@pytest.fixture(scope="module")
def cornell_setup(cornell_dev):
    cam = Camera.look_at((0, 1.0, 3.5), (0, 1.0, 0.0), vfov_deg=45, aspect=1.0)
    o, d = cam.generate_rays(24, 24)
    return cornell_dev, o, d


def _mean_radiance(scene, o, d, cfg, n_keys=8, seed0=0):
    acc = 0.0
    f = jax.jit(lambda k: trace(scene, o, d, k, cfg))
    for i in range(n_keys):
        acc += float(jnp.mean(f(jax.random.PRNGKey(seed0 + i))))
    return acc / n_keys


def test_direct_hit_on_light(cornell_dev):
    """A ray aimed straight at the ceiling light sees Le = 20 (bounce 0)."""
    # from just below the light center (~(-0.004, 2.02, -0.04)), straight up
    o = jnp.asarray([[-0.004, 1.8, -0.04]], jnp.float32)
    d = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    rad = trace(cornell_dev, o, d, jax.random.PRNGKey(0), PTConfig(max_bounces=0, nee=False))
    assert float(rad[0, 0]) == pytest.approx(20.0, rel=1e-4)


def test_radiance_finite_nonneg(cornell_setup):
    scene, o, d = cornell_setup
    rad = np.asarray(
        trace(scene, o, d, jax.random.PRNGKey(1), PTConfig(max_bounces=3))
    )
    assert np.isfinite(rad).all()
    assert (rad >= 0).all()
    assert rad.mean() > 0.01  # scene is lit


def test_nee_vs_bsdf_sampling_agree(cornell_setup):
    """Direct lighting via NEE+MIS must match brute-force BSDF sampling."""
    scene, o, d = cornell_setup
    cfg_nee = PTConfig(max_bounces=1, nee=True, rr_start=99)
    cfg_brute = PTConfig(max_bounces=1, nee=False, rr_start=99)
    m_nee = _mean_radiance(scene, o, d, cfg_nee, n_keys=16)
    m_brute = _mean_radiance(scene, o, d, cfg_brute, n_keys=64)
    # brute-force has high variance; agree within ~10%
    assert abs(m_nee - m_brute) / m_brute < 0.12, (m_nee, m_brute)


def test_deeper_bounces_add_energy(cornell_setup):
    scene, o, d = cornell_setup
    m1 = _mean_radiance(scene, o, d, PTConfig(max_bounces=1, rr_start=99), n_keys=8)
    m3 = _mean_radiance(scene, o, d, PTConfig(max_bounces=3, rr_start=99), n_keys=8)
    assert m3 > m1 * 1.05  # GI adds energy in a bright closed box


def test_deterministic(cornell_setup):
    scene, o, d = cornell_setup
    cfg = PTConfig(max_bounces=2)
    r1 = trace(scene, o, d, jax.random.PRNGKey(42), cfg)
    r2 = trace(scene, o, d, jax.random.PRNGKey(42), cfg)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_render_frame_pipeline(cornell_dev):
    from zetaray_tpu.render import render_frame_jit, RenderConfig

    cfg = RenderConfig(width=16, height=16, pt=PTConfig(max_bounces=1))
    cam = Camera.look_at((0, 1.0, 3.5), (0, 1.0, 0.0), vfov_deg=45, aspect=1.0)
    out = render_frame_jit(cornell_dev, cam, jax.random.PRNGKey(0), cfg)
    assert out["hdr"].shape == (16, 16, 3)
    assert out["ldr"].shape == (16, 16, 3) and out["ldr"].dtype == jnp.uint8
    assert np.isfinite(np.asarray(out["hdr"])).all()
    # jitter change does not retrigger compile (camera fields are traced):
    cam2 = cam.with_jitter(3)
    out2 = render_frame_jit(cornell_dev, cam2, jax.random.PRNGKey(0), cfg)
    assert not np.allclose(np.asarray(out2["hdr"]), np.asarray(out["hdr"]))
