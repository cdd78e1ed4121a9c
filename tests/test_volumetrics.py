"""Froxel volumetric inscattering (reference: Sky/Inscattering.hlsl,
Volumetric.hlsli, composited per Compositing.hlsl:89-95)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zetaray_tpu.ops import volumetrics as VL
from zetaray_tpu.ops.sky import SkyParams, _BETA_M, _BETA_R


@pytest.fixture(scope="module")
def cam():
    from zetaray_tpu.scene import Camera

    return Camera.look_at((0, 1, 3.5), (0, 1, 0), vfov_deg=45, aspect=1.0)


def test_froxel_monotonicity(cornell_dev, cam):
    sky = SkyParams(sun_dir=(0.3, 0.9, 0.2))
    cfg = VL.VolumetricsConfig(
        grid=(8, 8, 16), far=10.0, density_scale=500.0, sun_shadows=False
    )
    fx = VL.build_froxels(cornell_dev, cam, sky, cfg)
    tr = np.asarray(fx["tr"])
    ls = np.asarray(fx["ls"])
    assert tr.shape == (16, 8, 8, 3) and ls.shape == (16, 8, 8, 3)
    # transmittance decreases, inscatter accumulates along z
    assert (np.diff(tr, axis=0) <= 1e-7).all()
    assert (np.diff(ls, axis=0) >= -1e-7).all()
    assert (tr > 0).all() and (tr <= 1 + 1e-6).all()
    assert (ls >= 0).all()


def test_transmittance_matches_closed_form(cornell_dev, cam):
    """Uniform-ish medium (tiny altitude variation): Tr along the central
    ray must equal exp(-sigma_t * s_km) at every slice."""
    sky = SkyParams(sun_dir=(0.0, 1.0, 0.0))
    scale = 2000.0
    cfg = VL.VolumetricsConfig(
        grid=(3, 3, 24), near=0.0, far=5.0, depth_exp=1.0,
        density_scale=scale, sun_shadows=False, unit_to_km=1e-6,
    )
    # unit_to_km tiny -> altitude ~0 -> density ~ scale everywhere
    fx = VL.build_froxels(cornell_dev, cam, sky, cfg)
    tr = np.asarray(fx["tr"])[:, 1, 1, :]  # central ray
    edges = np.asarray(VL._slice_depths(cfg))
    # central froxel ray passes near the image center: cos ~ 1
    sigma_t = (_BETA_R + _BETA_M) * scale * 1e-6
    got_tau = -np.log(np.maximum(tr, 1e-30))
    exp_tau = edges[1:, None] * sigma_t[None, :]
    # cos factor of the slightly off-center ray makes it approximate
    np.testing.assert_allclose(got_tau, exp_tau, rtol=0.12)


def test_sun_shadow_rays_darken_occluded_froxels(cornell_dev, cam):
    sky = SkyParams(sun_dir=(0.0, 1.0, 0.0))
    base = dict(grid=(8, 8, 12), far=6.0, density_scale=500.0)
    f_no = VL.build_froxels(
        cornell_dev, cam, sky, VL.VolumetricsConfig(sun_shadows=False, **base)
    )
    f_sh = VL.build_froxels(
        cornell_dev, cam, sky, VL.VolumetricsConfig(sun_shadows=True, **base)
    )
    ls_no = np.asarray(f_no["ls"])[-1].sum()
    ls_sh = np.asarray(f_sh["ls"])[-1].sum()
    # the Cornell ceiling occludes most sun shadow rays inside the box
    assert ls_sh < ls_no * 0.9


def test_apply_inscattering_identity_when_empty(cornell_dev, cam):
    from zetaray_tpu.accel.megakernel import gbuffer

    sky = SkyParams()
    cfg = VL.VolumetricsConfig(grid=(4, 4, 8), density_scale=0.0,
                               sun_shadows=False)
    o, d = cam.generate_rays(32, 32)
    gb = gbuffer(cornell_dev, o, d, rt=1024, interpret=True)
    hdr = jnp.ones((3, 32, 32)) * 0.5
    fx = VL.build_froxels(cornell_dev, cam, sky, cfg)
    out = VL.apply_inscattering(hdr, gb, cam, fx, cfg, 32, 32)
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-5)


def test_frame_with_volumetrics(cornell_dev, cam):
    from zetaray_tpu.ops.pathtracer import PTConfig
    from zetaray_tpu.render import RenderConfig
    from zetaray_tpu.render.frame import render_frame_restir_jit

    cfg = RenderConfig(
        width=32, height=32, mode="restir_di",
        pt=PTConfig(max_bounces=1, sky=SkyParams()),
        volumetrics=VL.VolumetricsConfig(grid=(8, 8, 8), density_scale=200.0),
        taa=False,
    )
    out, _ = render_frame_restir_jit(
        cornell_dev, cam, jax.random.PRNGKey(0), cfg, None
    )
    hdr = np.asarray(out["hdr"])
    assert np.isfinite(hdr).all() and hdr.max() > 0
    # the medium must measurably change the frame (inside the closed box
    # the sun is occluded, so fog mostly *attenuates*: Tr < 1, Ls ~ 0)
    from dataclasses import replace as drep

    out0, _ = render_frame_restir_jit(
        cornell_dev, cam, jax.random.PRNGKey(0), drep(cfg, volumetrics=None),
        None,
    )
    hdr0 = np.asarray(out0["hdr"])
    rel = np.abs(hdr - hdr0).mean() / max(hdr0.mean(), 1e-9)
    assert rel > 0.005, rel
    assert hdr.mean() <= hdr0.mean() * 1.2
