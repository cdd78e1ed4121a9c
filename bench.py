"""Driver benchmark: Cornell Box rendering on real TPU hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

Primary metric: ms/frame for the BASELINE.md north-star config proxy --
Cornell Box ReSTIR DI + ReSTIR GI (512x512, temporal+spatial reuse, a-trous
denoise, TAA, auto-exposure). The "extra" dict reports the other BASELINE
metrics: plain-PT ms/frame, primary-ray Mrays/s, and the ReSTIR resample ms
(initial candidates + temporal + spatial, the reference's GpuTimer
per-pass numbers).

Timing methodology: this TPU is behind a tunnel where block_until_ready
returns before execution finishes and any sync pays a ~35 ms round trip, so
we time a pipelined loop of N frames ended by one forced scalar transfer and
divide -- that is the sustained frame rate a real frame loop would see
(matching the reference's frames-in-flight pipelining, Config.h frame
latency 2).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np
import jax

# Persistent compilation cache: Mosaic/XLA compiles via the remote compile
# service are slow and high-variance; cache hits make reruns start fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/zetaray_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REPO = Path(__file__).resolve().parent
ASSET = REPO.parent / "reference" / "Assets" / "CornellBox" / "cornell_emissive.gltf"
NORTH_STAR_MS = 33.0  # BASELINE.md: < 33 ms/frame north star


def main():
    from zetaray_tpu.scene import load_scene, upload_scene, Camera
    from zetaray_tpu.render import render_frame_jit, RenderConfig
    from zetaray_tpu.render.frame import render_frame_restir_jit
    from zetaray_tpu.ops.pathtracer import PTConfig

    scene = upload_scene(load_scene(ASSET))
    cam = Camera.look_at((0, 1.0, 3.5), (0, 1.0, 0.0), vfov_deg=45, aspect=1.0)

    # -- flagship: ReSTIR DI+GI + denoise + TAA (north-star config at 512^2)
    cfg_gi = RenderConfig(
        width=512, height=512, mode="restir_gi",
        pt=PTConfig(max_bounces=3), denoise=True, taa=True,
    )
    state = None
    for i in range(3):  # warmup/compile + temporal convergence
        out, state = render_frame_restir_jit(
            scene, cam, jax.random.PRNGKey(i), cfg_gi, state
        )
    _ = float(out["hdr"].sum())
    n = 30
    t0 = time.time()
    for i in range(n):
        out, state = render_frame_restir_jit(
            scene, cam, jax.random.PRNGKey(10 + i), cfg_gi, state
        )
    _ = float(out["hdr"].sum())
    restir_ms = (time.time() - t0) / n * 1000.0

    # -- ReSTIR PT (the reference's flagship integrator), fewer reps:
    #    reported for parity, not the headline
    try:
        cfg_pt_mode = RenderConfig(
            width=512, height=512, mode="restir_pt",
            pt=PTConfig(max_bounces=3), denoise=True, taa=True,
        )
        state_pt = None
        for i in range(3):
            out_pt, state_pt = render_frame_restir_jit(
                scene, cam, jax.random.PRNGKey(i), cfg_pt_mode, state_pt
            )
        _ = float(out_pt["hdr"].sum())
        t0 = time.time()
        for i in range(10):
            out_pt, state_pt = render_frame_restir_jit(
                scene, cam, jax.random.PRNGKey(20 + i), cfg_pt_mode, state_pt
            )
        _ = float(out_pt["hdr"].sum())
        restir_pt_ms = round((time.time() - t0) / 10 * 1000.0, 3)
    except Exception:
        restir_pt_ms = None

    # -- plain PT (the round-1 metric, for cross-round comparison)
    cfg_pt = RenderConfig(width=512, height=512, pt=PTConfig(max_bounces=4))
    out = render_frame_jit(scene, cam, jax.random.PRNGKey(0), cfg_pt)
    _ = np.asarray(out["ldr"])
    t0 = time.time()
    for i in range(n):
        out = render_frame_jit(scene, cam.with_jitter(i), jax.random.PRNGKey(i), cfg_pt)
    _ = float(out["hdr"].sum())
    pt_ms = (time.time() - t0) / n * 1000.0

    # -- primary-ray traversal rate (Mrays/s), BASELINE "Mrays/sec" metric
    from zetaray_tpu.accel.intersect import intersect_closest_shaded

    o, d = cam.generate_rays(1024, 1024)
    f_tr = jax.jit(lambda o, d: intersect_closest_shaded(scene, o, d).t)
    t = f_tr(o, d)
    _ = float(t.sum())
    t0 = time.time()
    for i in range(10):
        t = f_tr(o, d)
    _ = float(t.sum())
    mrays = 1024 * 1024 * 10 / (time.time() - t0) / 1e6

    # -- ReSTIR resample ms (initial candidates + temporal + spatial + GI
    #    temporal/spatial), the reference's DirectLighting GpuTimer span
    from zetaray_tpu.accel.megakernel import gbuffer, build_light_sets
    from zetaray_tpu.ops import restir_di as RD
    from zetaray_tpu.core.rng import seed_from_key

    seed = seed_from_key(jax.random.PRNGKey(0))
    gb = jax.jit(lambda o, d: gbuffer(scene, o, d))(*cam.generate_rays(512, 512))
    lsets = jax.jit(lambda s: build_light_sets(scene, s))(seed)

    def resample(gb, lsets, s):
        res = RD.initial_candidates(gb, lsets, s, cfg_gi.restir)
        res = RD.temporal_reuse(res, res, gb, gb, cam, 512, 512, s, cfg_gi.restir)
        return RD.spatial_reuse(res, gb, 512, 512, s, cfg_gi.restir)

    f_rs = jax.jit(resample)
    r = f_rs(gb, lsets, seed)
    _ = float(r.sum())
    t0 = time.time()
    for i in range(20):
        r = f_rs(gb, lsets, seed)
    _ = float(r.sum())
    resample_ms = (time.time() - t0) / 20 * 1000.0

    print(
        json.dumps(
            {
                "metric": "cornell_512_restir_di_gi_denoise_taa_ms_per_frame",
                "value": round(restir_ms, 3),
                "unit": "ms",
                # ratio to the 33 ms north star (>1 = faster than target);
                # single-chip 512^2 proxy for the 1080p v5e-8 config
                "vs_baseline": round(NORTH_STAR_MS / restir_ms, 3),
                "extra": {
                    "pt_512_4bounce_ms": round(pt_ms, 3),
                    "primary_mrays_per_s": round(mrays, 1),
                    "restir_di_resample_ms": round(resample_ms, 3),
                    "restir_pt_512_ms": restir_pt_ms,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
