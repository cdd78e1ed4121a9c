"""Ablate the fused restir_pt frame on the live chip (round-5, VERDICT #2).

Stage-sum (render.profile) says ~80 ms at 512^2 but the fused frame measured
283.9 (BENCH_r04): find which config axis carries the gap.
Run: python tools/ablate_pt.py
"""

import sys
import time
from dataclasses import replace
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/zetaray_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REPO = Path(__file__).resolve().parents[1]
ASSET = REPO.parent / "reference" / "Assets" / "CornellBox" / "cornell_emissive.gltf"


def timed(render_jit, scene, cam, cfg, warm=3, reps=10):
    state = None
    out = None
    for i in range(warm):
        out, state = render_jit(scene, cam, jax.random.PRNGKey(i), cfg, state)
    _ = float(out["hdr"].sum())
    t0 = time.time()
    for i in range(reps):
        out, state = render_jit(scene, cam, jax.random.PRNGKey(100 + i), cfg, state)
    _ = float(out["hdr"].sum())
    return (time.time() - t0) / reps * 1000.0


def main():
    from zetaray_tpu.scene import load_scene, upload_scene, Camera
    from zetaray_tpu.render.frame import render_frame_restir_jit, RenderConfig
    from zetaray_tpu.ops.pathtracer import PTConfig
    from zetaray_tpu.ops.restir_pt import ReSTIRPTConfig

    scene = upload_scene(load_scene(ASSET))
    cam = Camera.look_at((0, 1.0, 3.5), (0, 1.0, 0.0), vfov_deg=45, aspect=1.0)

    base = RenderConfig(width=512, height=512, mode="restir_pt",
                        pt=PTConfig(max_bounces=3), denoise=True, taa=True)
    variants = {
        "full (bench config)": base,
        "no replay": replace(base, restir_pt=ReSTIRPTConfig(replay=False)),
        "no temporal": replace(base, restir_pt=ReSTIRPTConfig(temporal=False)),
        "no spatial": replace(
            base, restir_pt=ReSTIRPTConfig(spatial_iterations=0)),
        "no temporal+spatial": replace(
            base, restir_pt=ReSTIRPTConfig(temporal=False,
                                           spatial_iterations=0)),
        "no packed_reuse": replace(
            base, restir_pt=ReSTIRPTConfig(packed_reuse=False)),
        "no post": replace(base, denoise=False, taa=False),
        "no indirect (DI only)": replace(base, indirect=False),
        "2 bounces": replace(base, pt=PTConfig(max_bounces=2)),
    }
    for name, cfg in variants.items():
        try:
            ms = timed(render_frame_restir_jit, scene, cam, cfg)
            print(f"{name:26s}: {ms:8.2f} ms")
        except Exception as e:
            print(f"{name:26s}: ERROR {str(e)[:100]}")


if __name__ == "__main__":
    main()
