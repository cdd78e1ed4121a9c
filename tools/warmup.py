"""Kernel warmup tool (PrecompileShaders analog).

The reference's Tools/PrecompileShaders instantiates every render pass and
compiles all ~50 PSOs headlessly to warm the PSO disk cache
(PrecompileShaders.cpp:45-70). The TPU equivalent jit-compiles every
integrator/mode variant at a tiny resolution into the persistent JAX
compilation cache, so real runs (and the driver bench) start hot.

Usage: python tools/warmup.py [--scene path.gltf]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ASSET = (
    Path(__file__).resolve().parent.parent.parent
    / "reference" / "Assets" / "CornellBox" / "cornell_emissive.gltf"
)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--scene", default=str(ASSET))
    parser.add_argument("--size", type=int, default=64)
    args = parser.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/zetaray_jax_cache")
    from zetaray_tpu.scene import load_scene, upload_scene, Camera
    from zetaray_tpu.render import (
        RenderConfig, render_frame_jit, render_frame_restir_jit,
    )
    from zetaray_tpu.ops.pathtracer import PTConfig
    from zetaray_tpu.ops.sky import SkyParams

    scene = upload_scene(load_scene(args.scene))
    cam = Camera.look_at((0, 1, 3.5), (0, 1, 0), vfov_deg=45, aspect=1.0)
    key = jax.random.PRNGKey(0)
    s = args.size

    variants = []
    for mode in ("pt", "restir_di", "restir_gi", "restir_pt"):
        variants.append(RenderConfig(width=s, height=s, mode=mode,
                                     pt=PTConfig(max_bounces=4)))
    variants.append(RenderConfig(width=s, height=s,
                                 pt=PTConfig(max_bounces=4, sky=SkyParams())))
    variants.append(RenderConfig(width=s, height=s, mode="restir_di",
                                 pt=PTConfig(max_bounces=4), denoise=True))
    # the bench flagship shape: DI+GI + a-trous + TAA
    variants.append(RenderConfig(width=s, height=s, mode="restir_gi",
                                 pt=PTConfig(max_bounces=3), denoise=True,
                                 taa=True))
    # round-2 lighting machinery (bench extras): SkyDI + LVG + pairwise
    # MIS + froxel volumetrics in one frame
    from zetaray_tpu.ops.restir_di import ReSTIRConfig
    from zetaray_tpu.ops.volumetrics import VolumetricsConfig

    from zetaray_tpu.ops.restir_gi import ReSTIRGIConfig as _RGI
    from zetaray_tpu.ops.skydi import SkyDIConfig as _SDC

    variants.append(RenderConfig(
        width=s, height=s, mode="restir_gi",
        pt=PTConfig(max_bounces=2, sky=SkyParams(sun_dir=(0.3, 0.8, 0.2)),
                    stochastic_multi_bounce=True, path_regularization=True),
        restir=ReSTIRConfig(lvg_samples=2, spatial_mis="pairwise"),
        restir_gi=_RGI(boiling_suppression=True),
        skydi=True, skydi_cfg=_SDC(spatial_mis="pairwise"),
        volumetrics=VolumetricsConfig(), denoise=True, taa=True,
    ))
    # temporal upscaling (FSR2 slot, same shape bench times)
    from zetaray_tpu.ops.upscale import UpscaleConfig as _UC

    variants.append(RenderConfig(width=2 * s, height=2 * s, mode="restir_gi",
                                 pt=PTConfig(max_bounces=2),
                                 render_scale=0.5, taa=True,
                                 upscale_cfg=_UC(rcas_sharpness=0.8)))
    # banded gathers (the single-chip large-res path)
    variants.append(RenderConfig(width=s, height=s, mode="restir_gi",
                                 pt=PTConfig(max_bounces=2),
                                 band_rows=max(8, s // 4), band_halo=8,
                                 denoise=True, taa=True))


    state_cache = {}
    for i, cfg in enumerate(variants):
        t0 = time.time()
        if (cfg.mode in ("restir_di", "restir_gi", "restir_pt")
                and scene.num_emissives > 0):
            out, st = render_frame_restir_jit(scene, cam, key, cfg, None)
            out["hdr"].block_until_ready()
            # also warm the steady (state != None) variant
            out, _ = render_frame_restir_jit(scene, cam, key, cfg, st)
        else:
            out = render_frame_jit(scene, cam, key, cfg)
        float(out["hdr"].sum())
        print(f"[{i+1}/{len(variants)}] {cfg.mode}"
              f"{' +sky' if cfg.pt.sky else ''}{' +denoise' if cfg.denoise else ''}"
              f": {time.time()-t0:.1f}s")
    print("warmup complete")


if __name__ == "__main__":
    main()
