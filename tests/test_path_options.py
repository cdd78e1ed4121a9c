"""Path options (reference IndirectLighting.h DefaultParamVals:231-244):
stochastic multi-bounce, boiling suppression, path regularization.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zetaray_tpu.ops.pathtracer import PTConfig, trace_reference
from zetaray_tpu.ops import restir_gi as RG


def _rays(cam_n=256):
    from zetaray_tpu.scene import Camera

    cam = Camera.look_at((0, 1.0, 3.5), (0, 1.0, 0.0), vfov_deg=45, aspect=1.0)
    side = int(np.sqrt(cam_n))
    return cam.generate_rays(side, side)


# ---------------------------------------------------------------- boiling


def test_suppress_outlier_resets_m_only_for_outliers():
    n = 64
    res = np.zeros((16, n), np.float32)
    res[9] = 1.0  # w_sum baseline
    res[10] = 20.0  # M
    res[11] = 0.5  # W
    res[9, 7] = 1000.0  # outlier in group 0
    out = np.asarray(RG.suppress_outlier_reservoirs(jnp.asarray(res), group=32))
    assert out[10, 7] == 1.0
    # everyone else keeps M (the outlier raises their avg, but 1 < 25*avg)
    keep = np.ones(n, bool)
    keep[7] = False
    np.testing.assert_allclose(out[10, keep], 20.0)
    # W and w_sum untouched (reference sets only M)
    np.testing.assert_allclose(out[11], res[11])
    np.testing.assert_allclose(out[9], res[9])


def test_suppress_outlier_noop_on_uniform_field():
    res = jnp.ones((16, 128)) * 2.0
    out = np.asarray(RG.suppress_outlier_reservoirs(res))
    np.testing.assert_allclose(out, np.asarray(res))


# ------------------------------------------------- stochastic multi-bounce


def test_smb_kill_none_vs_all(cornell_dev):
    o, d = _rays()
    cfg = PTConfig(max_bounces=3)
    key = jax.random.PRNGKey(3)
    base = np.asarray(trace_reference(cornell_dev, o, d, key, cfg))
    none_killed = np.asarray(
        trace_reference(
            cornell_dev, o, d, key, cfg,
            smb_kill=jnp.zeros((o.shape[0],), bool),
        )
    )
    # a no-op mask must not perturb any RNG stream
    np.testing.assert_array_equal(base, none_killed)
    all_killed = np.asarray(
        trace_reference(
            cornell_dev, o, d, key, cfg,
            smb_kill=jnp.ones((o.shape[0],), bool),
        )
    )
    assert np.isfinite(all_killed).all()
    # killed paths lose bounce>=1 light: strictly less energy on average
    assert all_killed.mean() < base.mean()
    assert all_killed.mean() > 0.0


def test_smb_restir_gi_frame(cornell_dev):
    """End-to-end: stochastic_multi_bounce renders finite and close to the
    full-bounce frame in the mean (half the rough-pixel paths lose their
    >=2nd GI bounce, a small share of total light in the Cornell box)."""
    from zetaray_tpu.render import RenderConfig
    from zetaray_tpu.render.frame import render_frame_restir_jit
    from zetaray_tpu.scene import Camera

    cam = Camera.look_at((0, 1.0, 3.5), (0, 1.0, 0.0), vfov_deg=45, aspect=1.0)

    def mean_img(smb):
        cfg = RenderConfig(
            width=64, height=64, mode="restir_gi",
            pt=PTConfig(max_bounces=3, stochastic_multi_bounce=smb),
            taa=False, auto_exposure=False, denoise=False,
        )
        acc = None
        for i in range(6):
            out, _ = render_frame_restir_jit(
                cornell_dev, cam, jax.random.PRNGKey(40 + i), cfg, None
            )
            h = np.asarray(out["hdr"])
            acc = h if acc is None else acc + h
        return acc / 6

    full = mean_img(False)
    smb = mean_img(True)
    assert np.isfinite(smb).all()
    lit = full.mean(-1) > 0.02
    rel = np.abs(full[lit] - smb[lit]).mean() / full[lit].mean()
    assert rel < 0.25, rel


# ---------------------------------------------------- path regularization


def test_regularization_noop_on_rough_scene(cornell_dev):
    """Cornell materials are rough (alpha >= 0.25), so Regularize is the
    identity and the trace must be bit-exact."""
    o, d = _rays()
    cfg = PTConfig(max_bounces=3)
    cfg_reg = PTConfig(max_bounces=3, path_regularization=True)
    key = jax.random.PRNGKey(5)
    a = np.asarray(trace_reference(cornell_dev, o, d, key, cfg))
    b = np.asarray(trace_reference(cornell_dev, o, d, key, cfg_reg))
    np.testing.assert_array_equal(a, b)


@pytest.fixture(scope="module")
def glossy_box(cornell_cpu):
    """Cornell box with near-specular walls (roughness 0.05)."""
    import dataclasses

    mats = cornell_cpu.materials
    rough = np.full_like(mats.roughness, 0.05)
    cpu = dataclasses.replace(
        cornell_cpu,
        materials=dataclasses.replace(mats, roughness=rough),
    )
    from zetaray_tpu.scene.scene import upload_scene

    return upload_scene(cpu)


def test_regularization_changes_glossy_secondary(glossy_box):
    o, d = _rays()
    key = jax.random.PRNGKey(6)
    base = np.asarray(
        trace_reference(glossy_box, o, d, key, PTConfig(max_bounces=3))
    )
    reg = np.asarray(
        trace_reference(
            glossy_box, o, d, key,
            PTConfig(max_bounces=3, path_regularization=True),
        )
    )
    assert np.isfinite(reg).all()
    assert not np.array_equal(base, reg)
    # regularization must not change the primary-visibility response class:
    # overall energy stays the same order
    assert 0.3 < reg.mean() / max(base.mean(), 1e-9) < 3.0


def test_regularization_megakernel(glossy_box):
    """Fused megakernel (interpret mode): regularization changes secondary
    shading, keeps energy in the same class, and is a no-op gate at
    bounce 0 (the megakernel and the wavefront use different NEE sampling
    streams, so agreement with the oracle is statistical only -- see
    test_megakernel.test_matches_reference_statistically)."""
    from zetaray_tpu.accel.megakernel import trace_megakernel
    from zetaray_tpu.core.rng import seed_from_key

    o, d = _rays(64)
    key = jax.random.PRNGKey(7)
    seed = seed_from_key(key)
    base = np.asarray(
        trace_megakernel(
            glossy_box, o, d, seed, PTConfig(max_bounces=2), rt=64,
            interpret=True,
        )
    )
    reg = np.asarray(
        trace_megakernel(
            glossy_box, o, d, seed,
            PTConfig(max_bounces=2, path_regularization=True), rt=64,
            interpret=True,
        )
    )
    assert np.isfinite(reg).all()
    assert not np.array_equal(base, reg)
    assert 0.3 < reg.mean() / max(base.mean(), 1e-9) < 3.0


def test_smb_megakernel(cornell_dev):
    """Fused megakernel: an all-True smb mask removes extension light, an
    all-False mask is bit-exact."""
    from zetaray_tpu.accel.megakernel import trace_megakernel
    from zetaray_tpu.core.rng import seed_from_key

    o, d = _rays(64)
    seed = seed_from_key(jax.random.PRNGKey(8))
    cfg = PTConfig(max_bounces=3)
    base = np.asarray(
        trace_megakernel(cornell_dev, o, d, seed, cfg, rt=64, interpret=True)
    )
    off = np.asarray(
        trace_megakernel(
            cornell_dev, o, d, seed, cfg, rt=64, interpret=True,
            smb_kill=jnp.zeros((o.shape[0],), bool),
        )
    )
    np.testing.assert_array_equal(base, off)
    on = np.asarray(
        trace_megakernel(
            cornell_dev, o, d, seed, cfg, rt=64, interpret=True,
            smb_kill=jnp.ones((o.shape[0],), bool),
        )
    )
    assert np.isfinite(on).all()
    assert 0.0 < on.mean() < base.mean()
