"""Application shell (ZetaLab analog): load a glTF, run the frame loop,
write frames + stats.

The reference's WinMain is: InitAndGetInterface -> App::Init -> glTF::Load
-> App::Run (ZetaLab.cpp:33-74). The headless TPU equivalent:

    python -m zetaray_tpu.app scene.gltf --mode restir_di --frames 8 \
        --size 512x512 --out /tmp/frames

Registers the standard tweakables in utils.params (the reference's ~20
ParamVariants, DefaultRenderer.cpp:328-430), runs the frame loop with
FrameStats, and writes PNG captures (CaptureScreen analog).
"""

from __future__ import annotations

import argparse
import sys
import time
from dataclasses import replace
from pathlib import Path

import numpy as np


def _register_params(cfg_holder):
    from .utils.params import add_param

    def upd(field):
        def cb(v):
            cfg_holder[0] = replace(cfg_holder[0], **{field: v})

        return cb

    add_param("Renderer", "General", "Mode", "enum", cfg_holder[0].mode,
              choices=("pt", "restir_di", "restir_gi", "restir_pt"),
              on_change=upd("mode"))
    from .ops.post import TONEMAPPERS_P

    add_param("Renderer", "General", "Tonemapper", "enum", cfg_holder[0].tonemapper,
              choices=tuple(TONEMAPPERS_P), on_change=upd("tonemapper"))
    add_param("Renderer", "General", "AutoExposure", "bool",
              cfg_holder[0].auto_exposure, on_change=upd("auto_exposure"))
    add_param("Renderer", "Post", "FireflyFactor", "float",
              cfg_holder[0].firefly_factor, min=0.0, max=16.0,
              on_change=upd("firefly_factor"))
    add_param("Renderer", "Post", "Denoise", "bool", cfg_holder[0].denoise,
              on_change=upd("denoise"))
    add_param("Renderer", "Post", "TAA", "bool", cfg_holder[0].taa,
              on_change=upd("taa"))

    def upd_pt(field):
        def cb(v):
            cfg_holder[0] = replace(
                cfg_holder[0], pt=replace(cfg_holder[0].pt, **{field: v})
            )

        return cb

    add_param("PathTracer", "Path", "MaxBounces", "int",
              cfg_holder[0].pt.max_bounces, min=0, max=16,
              on_change=upd_pt("max_bounces"))
    add_param("PathTracer", "Path", "RussianRouletteStart", "int",
              cfg_holder[0].pt.rr_start, min=1, max=16, on_change=upd_pt("rr_start"))

    def upd_rs(field):
        def cb(v):
            cfg_holder[0] = replace(
                cfg_holder[0], restir=replace(cfg_holder[0].restir, **{field: v})
            )

        return cb

    add_param("ReSTIR", "DI", "NumCandidates", "int",
              cfg_holder[0].restir.num_candidates, min=1, max=64,
              on_change=upd_rs("num_candidates"))
    add_param("ReSTIR", "DI", "Temporal", "bool", cfg_holder[0].restir.temporal,
              on_change=upd_rs("temporal"))
    add_param("ReSTIR", "DI", "SpatialRadius", "int",
              cfg_holder[0].restir.spatial_radius, min=1, max=64,
              on_change=upd_rs("spatial_radius"))


def main(argv=None):
    parser = argparse.ArgumentParser(description="zetaray_tpu headless renderer")
    parser.add_argument("scene", help="glTF/GLB scene path")
    parser.add_argument(
        "--mode", default="restir_di",
        choices=("pt", "restir_di", "restir_gi", "restir_pt"),
    )
    parser.add_argument("--animate", type=float, default=0.0, metavar="FPS",
                        help="play glTF animation 0 at this frame rate "
                             "(device refit + geometry motion vectors)")
    parser.add_argument("--frames", type=int, default=8)
    parser.add_argument("--size", default="512x512")
    parser.add_argument("--bounces", type=int, default=4)
    parser.add_argument("--out", default="/tmp/zetaray_frames")
    parser.add_argument("--eye", default="0,1,3.5")
    parser.add_argument("--target", default="0,1,0")
    parser.add_argument("--fov", type=float, default=45.0)
    parser.add_argument("--sun", default=None, help="x,y,z enables sun+sky")
    parser.add_argument("--denoise", action="store_true")
    parser.add_argument("--orbit", type=float, default=0.0,
                        help="degrees/frame camera orbit around the target")
    parser.add_argument("--dump-graph", action="store_true")
    parser.add_argument("--profile", action="store_true",
                        help="print per-pass device timings (GpuTimer "
                             "analog) before rendering")
    parser.add_argument("--tonemap", default=None,
                        help="override tonemapper (none|neutral|agx|"
                             "agx_golden|agx_punchy|tony)")
    parser.add_argument("--gui", type=int, default=None, metavar="PORT",
                        help="serve the interactive viewer/editor (GuiPass "
                             "analog) on this port instead of writing "
                             "frames; 0 = ephemeral port")
    parser.add_argument("--outline", default=None, metavar="NAME",
                        help="Sobel-outline the named instance in the "
                             "output (restir modes; Display.cpp picked "
                             "outline)")
    parser.add_argument("--validate", action="store_true",
                        help="per-frame device validation (debug-layer "
                             "analog, utils/validate.py): NaN/Inf/negative "
                             "checks on the HDR output and temporal state")
    args = parser.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/zetaray_jax_cache")
    from .scene import load_scene, upload_scene, Camera
    from .render import RenderConfig, render_frame_jit, render_frame_restir_jit
    from .render.graph import frame_dag
    from .ops.pathtracer import PTConfig
    from .ops.sky import SkyParams
    from .utils.png import write_png
    from .utils.stats import stats
    from .utils import log

    w, h = (int(v) for v in args.size.split("x"))
    sky = None
    if args.sun:
        sky = SkyParams(sun_dir=tuple(float(v) for v in args.sun.split(",")))
    cfg = RenderConfig(
        width=w, height=h, mode=args.mode,
        pt=PTConfig(max_bounces=args.bounces, sky=sky),
        denoise=args.denoise,
        **({"tonemapper": args.tonemap} if args.tonemap else {}),
    )
    if args.gui is not None:
        # interactive viewer/editor (reference: GuiPass + imgui dock)
        from .gui import Viewer, make_server

        viewer = Viewer(
            args.scene, cfg,
            eye=tuple(float(v) for v in args.eye.split(",")),
            target=tuple(float(v) for v in args.target.split(",")),
            fov_deg=args.fov,
        )
        server = make_server(viewer, args.gui)
        port = server.server_address[1]
        log.info(f"viewer at http://127.0.0.1:{port}/ (ctrl-C to stop)")
        viewer.run_in_thread()
        try:
            server.serve_forever()
        except KeyboardInterrupt:
            viewer.stop()
        return

    cfg_holder = [cfg]
    _register_params(cfg_holder)

    log.info(f"loading {args.scene}")
    t0 = time.time()
    from .scene import AnimationRig, load_gltf, refit_scene, transform_deltas

    doc = load_gltf(args.scene)
    cpu = load_scene(doc)
    scene = upload_scene(cpu)
    rig = AnimationRig(doc) if args.animate else None
    if rig is not None and not rig.animated:
        log.warning("--animate given but the scene has no animations")
        rig = None
    from .scene.textures import load_scene_textures

    textures = load_scene_textures(cpu)
    if cpu.texture_paths and len(textures) < len([t for t in cpu.texture_paths if t]):
        log.warning(
            f"decoded {len(textures)}/{len(cpu.texture_paths)} textures "
            "(BC6/BC7 decode pending; falling back to material factors)"
        )
    if textures and textures.get("emissive") and scene.num_emissives > 0:
        # PreLighting round trip: device power estimate -> host alias
        # rebuild -> device tables (reference PreLighting.cpp:354-546)
        from .ops.prelighting import apply_tri_powers, estimate_tri_power

        powers, mean_rgb = estimate_tri_power(scene, textures)
        scene = apply_tri_powers(scene, powers, mean_rgb)
        log.info("emissive power re-estimated from textures")
    log.info(
        f"scene: {cpu.num_tris} tris, {len(cpu.emissive_tris)} emissive "
        f"({time.time() - t0:.2f}s)"
    )
    eye = tuple(float(v) for v in args.eye.split(","))
    target = tuple(float(v) for v in args.target.split(","))
    cam0 = Camera.look_at(eye, target, vfov_deg=args.fov, aspect=w / h)

    if args.dump_graph:
        print(frame_dag(cfg_holder[0]))

    if args.profile:
        from .render.profile import time_passes

        log.info("profiling passes (separate jits; see render/profile.py)")
        for name, ms in time_passes(scene, cam0, cfg).items():
            print(f"  {name}: {ms:.2f} ms")

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    state = None
    for i in range(args.frames):
        from .utils.params import registry

        registry.apply_pending()
        cfg = cfg_holder[0]
        stats.begin_frame()
        if args.orbit:
            import math

            ang = math.radians(args.orbit * i)
            rel = np.asarray(eye) - np.asarray(target)
            rot = np.array(
                [[math.cos(ang), 0, math.sin(ang)],
                 [0, 1, 0],
                 [-math.sin(ang), 0, math.cos(ang)]]
            )
            cam0 = Camera.look_at(tuple(np.asarray(target) + rot @ rel),
                                  target, vfov_deg=args.fov, aspect=w / h)
        cam = cam0.with_jitter(i)
        key = jax.random.PRNGKey(i)
        frame_scene, motion = scene, None
        if rig is not None:
            # SceneCore animation update + TLAS refit analog, on device
            t = i / args.animate
            w_curr = rig.instance_worlds(t)
            frame_scene = refit_scene(scene, *rig.deltas(t))
            w_prev = rig.instance_worlds(max(t - 1.0 / args.animate, 0.0))
            motion, _ = transform_deltas(w_curr, w_prev)
        if (
            cfg.mode in ("restir_di", "restir_gi", "restir_pt")
            and scene.num_emissives > 0
        ):
            out, state = render_frame_restir_jit(
                frame_scene, cam, key, cfg, state, textures or None,
                motion=motion,
            )
        else:
            out = render_frame_jit(frame_scene, cam, key, cfg)
        if args.outline and state is not None:
            # picked-object outline (Display.cpp:358-398 Sobel pass)
            import jax.numpy as jnp

            from .ops.gbuffer_pack import TG
            from .ops.post import picked_outline_p

            names = [n for n in cpu.inst_names if args.outline in n]
            if names:
                pid = cpu.inst_names.index(names[0])
                ldr_p = jnp.moveaxis(out["ldr"].astype(jnp.float32), -1, 0)
                n_gb = state.gbuf.shape[1]
                if n_gb == ldr_p.shape[1] * ldr_p.shape[2]:
                    inst_img = state.gbuf[TG.INST].reshape(ldr_p.shape[1:])
                    out["ldr"] = jnp.moveaxis(
                        picked_outline_p(ldr_p / 255.0, inst_img, pid) * 255.0,
                        0, -1,
                    ).astype(jnp.uint8)
        if args.validate:
            from .utils.validate import check_frame

            check_frame(out, state)
        ldr = np.asarray(out["ldr"])  # forces completion
        stats.add("frame", "mean_radiance", float(np.asarray(out["hdr"]).mean()))
        dt = stats.end_frame()
        write_png(str(out_dir / f"frame_{i:04d}.png"), ldr)
        log.info(f"frame {i}: {dt * 1000:.1f} ms")
    print(stats.report())
    log.info(f"wrote {args.frames} frames to {out_dir}")


if __name__ == "__main__":
    main()
