"""Golden-image regression: pinned-seed restir_gi frame vs a stored render.

The reference validates rendering by eye (SURVEY.md section 4); this is the
deterministic-replay upgrade: same seeds + same config must reproduce the
stored frame on the CPU backend. Regenerate with
``python tests/golden/regen.py`` after an *intentional* image change and
eyeball the diff before committing.
"""

from pathlib import Path

import numpy as np
import jax
import pytest

GOLDEN = Path(__file__).parent / "golden" / "cornell_restir_gi_64.npz"
GOLDEN_SKY = Path(__file__).parent / "golden" / "cornell_pt_sky_vol_64.npz"


def _render(cornell_dev):
    from zetaray_tpu.ops.pathtracer import PTConfig
    from zetaray_tpu.render import RenderConfig
    from zetaray_tpu.render.frame import render_frame_restir_jit
    from zetaray_tpu.scene import Camera

    cam = Camera.look_at((0, 1, 3.5), (0, 1, 0), vfov_deg=45, aspect=1.0)
    cfg = RenderConfig(
        width=64, height=64, mode="restir_gi", pt=PTConfig(max_bounces=2),
        denoise=True, taa=True,
    )
    state = None
    for i in range(3):
        out, state = render_frame_restir_jit(
            cornell_dev, cam.with_jitter(i), jax.random.PRNGKey(i), cfg, state
        )
    return out


def test_golden_image(cornell_dev):
    if not GOLDEN.exists():
        pytest.skip("golden missing")
    z = np.load(GOLDEN)
    out = _render(cornell_dev)
    hdr = np.asarray(out["hdr"]).astype(np.float32)
    ldr = np.asarray(out["ldr"])
    # HDR: tight float tolerance (same backend, same seeds; small slack for
    # XLA version-to-version reassociation)
    np.testing.assert_allclose(hdr, z["hdr"], atol=5e-3, rtol=1e-3)
    # LDR: at most a tiny fraction of pixels may differ by >1 step
    diff = np.abs(ldr.astype(np.int32) - z["ldr"].astype(np.int32))
    assert (diff > 1).mean() < 0.005, (diff > 1).mean()


def test_golden_feature_frame(cornell_dev):
    """Third golden: the full feature frame -- SkyDI (pairwise) + LVG +
    pairwise DI MIS + froxel volumetrics + path options (stochastic
    multi-bounce, boiling suppression, path regularization). Pins the
    round-2/3 lighting machinery against silent drift."""
    gp = Path(__file__).parent / "golden" / "cornell_features_64.npz"
    if not gp.exists():
        pytest.skip("golden missing")
    from zetaray_tpu.ops.pathtracer import PTConfig
    from zetaray_tpu.ops.restir_di import ReSTIRConfig
    from zetaray_tpu.ops.restir_gi import ReSTIRGIConfig
    from zetaray_tpu.ops.sky import SkyParams
    from zetaray_tpu.ops.skydi import SkyDIConfig
    from zetaray_tpu.ops.volumetrics import VolumetricsConfig
    from zetaray_tpu.render import RenderConfig
    from zetaray_tpu.render.frame import render_frame_restir_jit
    from zetaray_tpu.scene import Camera

    cam = Camera.look_at((0, 1, 3.5), (0, 1, 0), vfov_deg=45, aspect=1.0)
    cfg = RenderConfig(
        width=64, height=64, mode="restir_gi",
        pt=PTConfig(max_bounces=2, sky=SkyParams(sun_dir=(0.3, 0.8, 0.2)),
                    stochastic_multi_bounce=True, path_regularization=True),
        restir=ReSTIRConfig(lvg_samples=2, spatial_mis="pairwise"),
        restir_gi=ReSTIRGIConfig(boiling_suppression=True),
        skydi=True, skydi_cfg=SkyDIConfig(spatial_mis="pairwise"),
        volumetrics=VolumetricsConfig(), denoise=True, taa=True,
    )
    state = None
    for i in range(3):
        out, state = render_frame_restir_jit(
            cornell_dev, cam.with_jitter(i), jax.random.PRNGKey(i), cfg, state
        )
    z = np.load(gp)
    hdr = np.asarray(out["hdr"]).astype(np.float32)
    np.testing.assert_allclose(hdr, z["hdr"], atol=5e-3, rtol=1e-3)
    diff = np.abs(
        np.asarray(out["ldr"]).astype(np.int32) - z["ldr"].astype(np.int32)
    )
    assert (diff > 1).mean() < 0.005, (diff > 1).mean()


def test_golden_pt_sky_volumetrics(cornell_dev):
    """Second golden: pt mode + sun/sky + froxel inscattering (the
    atmosphere path the restir golden doesn't touch)."""
    if not GOLDEN_SKY.exists():
        pytest.skip("golden missing")
    from zetaray_tpu.ops.pathtracer import PTConfig
    from zetaray_tpu.ops.sky import SkyParams
    from zetaray_tpu.ops.volumetrics import VolumetricsConfig
    from zetaray_tpu.render import RenderConfig
    from zetaray_tpu.render.frame import render_frame_jit
    from zetaray_tpu.scene import Camera

    cam = Camera.look_at((0, 1, 3.5), (0, 1, 0), vfov_deg=45, aspect=1.0)
    cfg = RenderConfig(
        width=64, height=64, mode="pt",
        pt=PTConfig(max_bounces=2, sky=SkyParams(sun_dir=(0.3, 0.7, 0.2))),
        volumetrics=VolumetricsConfig(),
    )
    out = render_frame_jit(
        cornell_dev, cam.with_jitter(0), jax.random.PRNGKey(0), cfg
    )
    z = np.load(GOLDEN_SKY)
    np.testing.assert_allclose(
        np.asarray(out["hdr"]).astype(np.float32), z["hdr"], atol=5e-3, rtol=1e-3
    )
    diff = np.abs(
        np.asarray(out["ldr"]).astype(np.int32) - z["ldr"].astype(np.int32)
    )
    assert (diff > 1).mean() < 0.005, (diff > 1).mean()


def test_golden_tpu_device_path():
    """TPU-captured golden (VERDICT r2 #6): pinned-seed device-path frame
    vs the stored capture -- catches drift in the Pallas/Mosaic kernels
    that CPU goldens (interpret mode) cannot see. Skips off-TPU (the CI
    mesh is CPU; run on the real chip)."""
    gp = Path(__file__).parent / "golden" / "cornell_restir_gi_128_tpu.npz"
    if not gp.exists():
        pytest.skip("TPU golden missing")
    if jax.default_backend() == "cpu":
        pytest.skip("device-path golden needs the TPU backend")
    from conftest import CORNELL_EMISSIVE
    from zetaray_tpu.ops.pathtracer import PTConfig
    from zetaray_tpu.render import RenderConfig
    from zetaray_tpu.render.frame import render_frame_restir_jit
    from zetaray_tpu.scene import Camera, load_scene, upload_scene

    scene = upload_scene(load_scene(CORNELL_EMISSIVE))
    cam = Camera.look_at((0, 1, 3.5), (0, 1, 0), vfov_deg=45, aspect=1.0)
    cfg = RenderConfig(width=128, height=128, mode="restir_gi",
                       pt=PTConfig(max_bounces=2), denoise=True, taa=True)
    st = None
    for i in range(3):
        out, st = render_frame_restir_jit(
            scene, cam.with_jitter(i), jax.random.PRNGKey(i), cfg, st
        )
    z = np.load(gp)
    hdr = np.asarray(out["hdr"]).astype(np.float32)
    np.testing.assert_allclose(hdr, z["hdr"], atol=5e-3, rtol=1e-3)
    diff = np.abs(
        np.asarray(out["ldr"]).astype(np.int32) - z["ldr"].astype(np.int32)
    )
    assert (diff > 1).mean() < 0.005, (diff > 1).mean()
