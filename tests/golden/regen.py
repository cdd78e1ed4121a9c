"""Regenerate the golden frames (run from the repo root on the CPU backend,
eyeball the image before committing)."""

import os
import sys
from pathlib import Path

# ZETARAY_REGEN_TPU=1 runs on the real device instead (captures the TPU
# golden too); default pins CPU like the CI mesh
if os.environ.get("ZETARAY_REGEN_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax

if os.environ.get("ZETARAY_REGEN_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from zetaray_tpu.ops.pathtracer import PTConfig
from zetaray_tpu.render import RenderConfig
from zetaray_tpu.render.frame import render_frame_restir_jit
from zetaray_tpu.scene import Camera, load_scene, upload_scene

ASSET = (
    Path(__file__).resolve().parents[3]
    / "reference" / "Assets" / "CornellBox" / "cornell_emissive.gltf"
)

sc = upload_scene(load_scene(ASSET))
cam = Camera.look_at((0, 1, 3.5), (0, 1, 0), vfov_deg=45, aspect=1.0)

# The three CPU-pinned goldens must only ever be written from the CPU
# backend: a TPU capture differs by more than the tests' tolerance and
# silently breaks CPU CI (round-3 postmortem). TPU mode writes only the
# *_tpu golden below.
_WRITE_CPU_GOLDENS = jax.default_backend() == "cpu"

cfg = RenderConfig(
    width=64, height=64, mode="restir_gi", pt=PTConfig(max_bounces=2),
    denoise=True, taa=True,
)
if _WRITE_CPU_GOLDENS:
    state = None
    for i in range(3):
        out, state = render_frame_restir_jit(
            sc, cam.with_jitter(i), jax.random.PRNGKey(i), cfg, state
        )
    dst = Path(__file__).parent / "cornell_restir_gi_64.npz"
    np.savez_compressed(
        dst, ldr=np.asarray(out["ldr"]),
        hdr=np.asarray(out["hdr"]).astype(np.float32),
    )
    print("wrote", dst, "mean ldr", float(np.asarray(out["ldr"]).mean()))

# second golden: pt mode + sun/sky + froxel volumetrics (the atmosphere path)
from zetaray_tpu.ops.sky import SkyParams
from zetaray_tpu.ops.volumetrics import VolumetricsConfig
from zetaray_tpu.render.frame import render_frame_jit

cfg2 = RenderConfig(
    width=64, height=64, mode="pt",
    pt=PTConfig(max_bounces=2, sky=SkyParams(sun_dir=(0.3, 0.7, 0.2))),
    volumetrics=VolumetricsConfig(),
)
if _WRITE_CPU_GOLDENS:
    out2 = render_frame_jit(sc, cam.with_jitter(0), jax.random.PRNGKey(0), cfg2)
    dst2 = Path(__file__).parent / "cornell_pt_sky_vol_64.npz"
    np.savez_compressed(
        dst2, ldr=np.asarray(out2["ldr"]),
        hdr=np.asarray(out2["hdr"]).astype(np.float32),
    )
    print("wrote", dst2, "mean ldr", float(np.asarray(out2["ldr"]).mean()))

# third golden: the feature frame (SkyDI + LVG + pairwise MIS + froxel
# volumetrics + path options) -- pins the round-2/3 lighting machinery
from zetaray_tpu.ops.restir_di import ReSTIRConfig
from zetaray_tpu.ops.restir_gi import ReSTIRGIConfig
from zetaray_tpu.ops.skydi import SkyDIConfig

cfg3 = RenderConfig(
    width=64, height=64, mode="restir_gi",
    pt=PTConfig(max_bounces=2, sky=SkyParams(sun_dir=(0.3, 0.8, 0.2)),
                stochastic_multi_bounce=True, path_regularization=True),
    restir=ReSTIRConfig(lvg_samples=2, spatial_mis="pairwise"),
    restir_gi=ReSTIRGIConfig(boiling_suppression=True),
    skydi=True, skydi_cfg=SkyDIConfig(spatial_mis="pairwise"),
    volumetrics=VolumetricsConfig(), denoise=True, taa=True,
)
if _WRITE_CPU_GOLDENS:
    state3 = None
    for i in range(3):
        out3, state3 = render_frame_restir_jit(
            sc, cam.with_jitter(i), jax.random.PRNGKey(i), cfg3, state3
        )
    dst4 = Path(__file__).parent / "cornell_features_64.npz"
    np.savez_compressed(
        dst4, ldr=np.asarray(out3["ldr"]),
        hdr=np.asarray(out3["hdr"]).astype(np.float32),
    )
    print("wrote", dst4, "mean ldr", float(np.asarray(out3["ldr"]).mean()))

# TPU device-path golden (run ON the real chip: unset JAX_PLATFORMS first;
# this block is skipped on CPU). Captures the pinned-seed 128^2 restir_gi
# frame test_golden.test_golden_tpu_device_path compares against.
if jax.default_backend() != "cpu":
    cfgt = RenderConfig(
        width=128, height=128, mode="restir_gi", pt=PTConfig(max_bounces=2),
        denoise=True, taa=True,
    )
    stt = None
    for i in range(3):
        outg, stt = render_frame_restir_jit(
            sc, cam.with_jitter(i), jax.random.PRNGKey(i), cfgt, stt
        )
    dst3 = Path(__file__).parent / "cornell_restir_gi_128_tpu.npz"
    np.savez_compressed(
        dst3, hdr=np.asarray(outg["hdr"]).astype(np.float32),
        ldr=np.asarray(outg["ldr"]),
    )
    print("wrote", dst3, "mean ldr", float(np.asarray(outg["ldr"]).mean()))
