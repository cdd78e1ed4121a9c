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
    out, lock = taau_resolve(
        img, None, pos, valid, depth, None, (0.0, 0.0), 16, 16,
        UpscaleConfig(),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)
    assert lock is not None and lock.shape == (16, 16)


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


# ------------------------------------------------ FSR2-tier internals


def test_rcas_flat_field_identity():
    from zetaray_tpu.ops.upscale import rcas_p

    img = jnp.full((3, 8, 8), 0.5)
    out = np.asarray(rcas_p(img, 0.8))
    np.testing.assert_allclose(out, 0.5, atol=1e-6)


def test_rcas_sharpens_edge_without_overshoot():
    from zetaray_tpu.ops.upscale import rcas_p

    # soft vertical edge 0 -> 1 with a 0.5 transition column
    img = np.zeros((3, 8, 8), np.float32)
    img[:, :, 4:] = 1.0
    img[:, :, 4] = 0.5
    out = np.asarray(rcas_p(jnp.asarray(img), 1.0))
    # contrast across the transition increases (transition pulled apart)
    assert out[0, 4, 3] <= img[0, 4, 3] + 1e-6
    assert abs(out[0, 4, 5] - out[0, 4, 3]) >= abs(img[0, 4, 5] - img[0, 4, 3])
    # RCAS never over/undershoots outside [min, max] of the signal
    assert out.min() >= -1e-6 and out.max() <= 1.0 + 1e-6


def _taau_inputs(hr=8, wr=8, H=16, W=16, seed=0):
    from zetaray_tpu.scene import Camera

    rng = np.random.default_rng(seed)
    cam = Camera.look_at((0, 0, 2.0), (0, 0, 0), vfov_deg=60, aspect=1.0)
    cur = jnp.asarray(rng.random((3, hr, wr)).astype(np.float32))
    # world positions on the z=0 plane seen by this camera
    o, d = cam.generate_rays(wr, hr)
    t = (0.0 - o[:, 2]) / d[:, 2]
    pos = (o + t[:, None] * d).T.reshape(3, hr, wr)
    depth = jnp.asarray(t.reshape(hr, wr))
    valid = jnp.ones((hr, wr), bool)
    return cam, cur, jnp.asarray(pos), valid, depth


def test_depth_clip_rejects_disoccluded_history():
    """History whose stored depth disagrees with the reprojected surface is
    dropped (alpha -> 1): the output equals the current frame there."""
    from zetaray_tpu.ops.upscale import UpscaleConfig, taau_resolve

    cam, cur, pos, valid, depth = _taau_inputs()
    hist = jnp.zeros((3, 16, 16))  # history says "black"
    kw = dict(prev_cam=cam, jitter=(0.0, 0.0), out_w=16, out_h=16)
    # prev depth agrees -> history blends in (output much darker than cur)
    ok_out, _ = taau_resolve(
        cur, hist, pos, valid, depth, cfg=UpscaleConfig(clamp=False),
        prev_depth_lr=depth, **kw,
    )
    # prev depth wildly different -> disocclusion, output == current
    bad_out, _ = taau_resolve(
        cur, hist, pos, valid, depth, cfg=UpscaleConfig(clamp=False),
        prev_depth_lr=depth * 10.0, **kw,
    )
    cur_up, _ = taau_resolve(
        cur, None, pos, valid, depth, cfg=UpscaleConfig(clamp=False), **kw,
    )
    assert np.asarray(ok_out).mean() < np.asarray(cur_up).mean() * 0.9
    np.testing.assert_allclose(np.asarray(bad_out), np.asarray(cur_up), atol=1e-6)


def test_luminance_lock_relaxes_clamp():
    """A locked pixel keeps history outside the neighborhood range; an
    unlocked one gets clamped into it."""
    from zetaray_tpu.ops.upscale import UpscaleConfig, taau_resolve

    cam, cur, pos, valid, depth = _taau_inputs()
    cur = jnp.full((3, 8, 8), 0.2)
    hist = jnp.full((3, 16, 16), 1.0)  # bright feature lives in history
    cfg = UpscaleConfig(clamp=True, reactive_scale=0.0, depth_clip_tol=0.0)
    kw = dict(prev_cam=cam, jitter=(0.0, 0.0), out_w=16, out_h=16)
    unlocked, _ = taau_resolve(cur, hist, pos, valid, depth, cfg=cfg, **kw)
    locked, _ = taau_resolve(
        cur, hist, pos, valid, depth, cfg=cfg, lock=jnp.ones((16, 16)), **kw
    )
    # clamped: history forced to the 0.2 neighborhood -> output ~0.2
    np.testing.assert_allclose(np.asarray(unlocked), 0.2, atol=1e-3)
    # locked: raw history (1.0) survives the clamp -> visibly brighter
    assert np.asarray(locked).mean() > 0.5


def test_reactive_mask_raises_alpha_on_flicker():
    from zetaray_tpu.ops.upscale import UpscaleConfig, taau_resolve

    cam, cur, pos, valid, depth = _taau_inputs()
    cur = jnp.full((3, 8, 8), 1.0)
    hist = jnp.zeros((3, 16, 16))
    kw = dict(prev_cam=cam, jitter=(0.0, 0.0), out_w=16, out_h=16)
    slow, _ = taau_resolve(
        cur, hist, pos, valid, depth,
        cfg=UpscaleConfig(clamp=False, reactive_scale=0.0), **kw,
    )
    fast, _ = taau_resolve(
        cur, hist, pos, valid, depth,
        cfg=UpscaleConfig(clamp=False, reactive_scale=1.0), **kw,
    )
    # full luminance divergence: reactive output leans on current (1.0)
    assert np.asarray(fast).mean() > np.asarray(slow).mean() + 0.3
