"""Temporal upscaling (TAAU, the reference's FSR2 slot) + TAA resample.

Reference parity: FSR2.h:13-65 (inputs/outputs), TAA.hlsl (Catmull-Rom
history, depth-dilated motion).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_catmull_rom_reproduces_grid_points():
    from zetaray_tpu.ops.taa import catmull_rom_p

    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.random((3, 9, 11)).astype(np.float32))
    ys, xs = np.meshgrid(np.arange(9), np.arange(11), indexing="ij")
    got = catmull_rom_p(
        img, jnp.asarray(xs.ravel(), jnp.float32),
        jnp.asarray(ys.ravel(), jnp.float32),
    )
    np.testing.assert_allclose(
        np.asarray(got).reshape(3, 9, 11), np.asarray(img), atol=1e-5
    )


def test_catmull_rom_exact_on_linear_ramp():
    from zetaray_tpu.ops.taa import catmull_rom_p

    h, w = 8, 8
    ramp = jnp.broadcast_to(
        jnp.arange(w, dtype=jnp.float32)[None, None, :], (3, h, w)
    )
    px = jnp.asarray([2.25, 3.5, 4.75])
    py = jnp.asarray([3.0, 3.0, 3.0])
    got = catmull_rom_p(ramp, px, py)
    np.testing.assert_allclose(np.asarray(got[0]), [2.25, 3.5, 4.75], atol=1e-5)


def test_depth_dilation_picks_closest_motion():
    from zetaray_tpu.ops.taa import _depth_dilated_motion

    depth = jnp.full((4, 4), 10.0).at[1, 1].set(1.0)
    valid = jnp.ones((4, 4), bool)
    motion = jnp.zeros((2, 4, 4)).at[:, 1, 1].set(7.0)
    out = np.asarray(_depth_dilated_motion(motion, depth, valid))
    # every 3x3 neighbor of (1,1) adopts its (closest) motion
    assert out[0, 0, 0] == 7.0 and out[0, 2, 2] == 7.0
    assert out[0, 3, 3] == 0.0  # out of reach
    # uniform depth: motion stays put (no systematic shift)
    flatd = jnp.ones((4, 4))
    m2 = jnp.zeros((2, 4, 4)).at[0].set(
        jnp.arange(16.0).reshape(4, 4)
    )
    out2 = np.asarray(_depth_dilated_motion(m2, flatd, valid))
    np.testing.assert_allclose(out2, np.asarray(m2))


def test_taau_identity_at_scale_one():
    from zetaray_tpu.ops.upscale import UpscaleConfig, taau_resolve

    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((3, 16, 16)).astype(np.float32))
    pos = jnp.zeros((3, 16, 16))
    valid = jnp.ones((16, 16), bool)
    depth = jnp.ones((16, 16))
    out = taau_resolve(
        img, None, pos, valid, depth, None, (0.0, 0.0), 16, 16,
        UpscaleConfig(),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_taau_converges_to_full_res(cornell_dev):
    """Half-res jittered frames accumulated by TAAU approach the full-res
    render much closer than a single bilinear-upscaled frame does."""
    from dataclasses import replace as drep

    from zetaray_tpu.ops.pathtracer import PTConfig
    from zetaray_tpu.render import RenderConfig
    from zetaray_tpu.render.frame import render_frame_restir_jit
    from zetaray_tpu.scene import Camera

    cam0 = Camera.look_at((0, 1, 3.5), (0, 1, 0), vfov_deg=45, aspect=1.0)
    # denoised input: neighborhood clamping (like any TAA) cannot converge
    # on raw 1-spp noise -- the reference also runs FSR2 after denoising
    full_cfg = RenderConfig(
        width=64, height=64, mode="restir_di", pt=PTConfig(max_bounces=1),
        taa=False, auto_exposure=False, indirect=False, denoise=True,
    )
    # jitter-averaged full-res mean as ground truth; comparisons clip to
    # [0, 1] -- the directly-visible emissive (radiance 20 over ~4 px)
    # aliases with jitter and any neighborhood-clamping TAA suppresses
    # that impulse, which would otherwise dominate the metric
    clip = lambda a: np.clip(a, 0.0, 1.0)
    acc = None
    for i in range(12):
        out, _ = render_frame_restir_jit(
            cornell_dev, cam0.with_jitter(i), jax.random.PRNGKey(i),
            full_cfg, None,
        )
        f = clip(np.asarray(out["hdr"]))
        acc = f if acc is None else acc + f
    truth = acc / 12

    up_cfg = drep(full_cfg, render_scale=0.5, taa=True)
    state = None
    first = None
    for i in range(12):
        out, state = render_frame_restir_jit(
            cornell_dev, cam0.with_jitter(i), jax.random.PRNGKey(50 + i),
            up_cfg, state,
        )
        if first is None:
            first = clip(np.asarray(out["hdr"]))
    final = clip(np.asarray(out["hdr"]))
    assert final.shape == (64, 64, 3)
    err_first = np.abs(first - truth).mean()
    err_final = np.abs(final - truth).mean()
    # steady improvement (the a-trous blur at half res bounds how much
    # detail jitter accumulation can recover on this scene; the key
    # regression this guards is the error *growing*, which happened when
    # depth dilation shifted positions instead of motion)
    assert err_final < err_first * 0.97, (err_first, err_final)
    assert np.isfinite(final).all()
