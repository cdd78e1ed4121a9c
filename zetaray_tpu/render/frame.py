"""Frame orchestration: the render-graph equivalent.

Where the reference hand-builds a per-frame DAG of passes with explicit
resource barriers (Core/RenderGraph.h:56, DefaultRenderer.cpp:482-512), the
TPU design composes every pass into ONE jitted function whose dataflow graph
*is* the schedule -- XLA owns ordering, fusion, and memory, replacing
RenderGraph::Build's barrier insertion and node merging entirely
(SURVEY.md section 7, architecture mapping).

``render_frame`` = GBufferRT-equivalent primary rays + path-traced lighting
(DirectLighting/IndirectLighting equivalents) + Compositing + AutoExposure +
Display (tonemap + sRGB). As ReSTIR passes land, they slot in here exactly
like the reference's DefaultRenderer::Update wires its passes.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.pathtracer import PTConfig, trace
from ..ops.restir_di import ReSTIRConfig
from ..ops import post


@dataclass(frozen=True)
class RenderConfig:
    """Static per-frame render settings (hashable: used as a jit static arg).

    The runtime-tweakable analog of the reference's ParamVariant defaults
    (DefaultRenderer.cpp:328-430); changing any field triggers a re-jit, so
    hot-tweakables should eventually become traced scalars where possible
    (SURVEY.md hard-parts #6).
    """

    width: int = 512
    height: int = 512
    # integrator mode: "pt" = unidirectional path tracer;
    # "restir_di" = ReSTIR direct lighting + PT indirect;
    # "restir_gi" = ReSTIR direct + ReSTIR GI indirect;
    # "restir_pt" = ReSTIR direct + ReSTIR PT path reuse (reconnection
    # shift) -- the reference's three IndirectLighting integrators
    # (IndirectLighting.h:64-70) plus the Compositing frame structure
    mode: str = "pt"
    pt: PTConfig = field(default_factory=PTConfig)
    restir: ReSTIRConfig = field(default_factory=ReSTIRConfig)
    restir_gi: "object" = None  # ReSTIRGIConfig; default built in __post_init__
    restir_pt: "object" = None  # ReSTIRPTConfig; default built in __post_init__
    indirect: bool = True  # add the indirect pass in restir modes

    lvg_cfg: "object" = None  # ops.prelighting.LVGConfig (grid shape)
    # SkyDI: reservoir-based sun+sky direct lighting in restir_gi/restir_pt
    # modes (reference: DirectLighting/Sky pass). False = "SkyDI-lite"
    # (analytic background + sun NEE only, no sky-dome NEE).
    skydi: bool = False
    skydi_cfg: "object" = None  # ops.skydi.SkyDIConfig
    # Froxel volumetric inscattering (reference: Sky Inscattering voxel
    # grid). None = off; ops.volumetrics.VolumetricsConfig = on (needs
    # cfg.pt.sky for the sun).
    volumetrics: "object" = None
    # Temporal upscaling (the reference's FSR2 slot, mutually exclusive
    # with plain TAA): render internals at width*render_scale x
    # height*render_scale, reconstruct to width x height (ops.upscale).
    render_scale: float = 1.0
    upscale_cfg: "object" = None  # ops.upscale.UpscaleConfig

    def __post_init__(self):
        if self.restir_gi is None:
            from ..ops.restir_gi import ReSTIRGIConfig

            object.__setattr__(self, "restir_gi", ReSTIRGIConfig())
        if self.restir_pt is None:
            from ..ops.restir_pt import ReSTIRPTConfig

            object.__setattr__(self, "restir_pt", ReSTIRPTConfig())
        if self.lvg_cfg is None:
            from ..ops.prelighting import LVGConfig

            object.__setattr__(self, "lvg_cfg", LVGConfig())
        if self.skydi_cfg is None:
            from ..ops.skydi import SkyDIConfig

            object.__setattr__(self, "skydi_cfg", SkyDIConfig())
        if self.upscale_cfg is None:
            from ..ops.upscale import UpscaleConfig

            object.__setattr__(self, "upscale_cfg", UpscaleConfig())
    # Banded gathers for single-chip large resolutions (core.gatherband,
    # the 1080p gather-cliff mitigation): -1 = auto (band when the reuse
    # tables outgrow the VMEM-resident fast-gather regime), 0 = off,
    # >0 = explicit band height in rows. ``band_halo`` bounds how far
    # temporal reprojection may land outside its band before reuse drops.
    band_rows: int = -1
    band_halo: int = 64
    tonemapper: str = "agx"
    auto_exposure: bool = True
    # "histogram" (percentile-clipped log-lum histogram) or "weighted_avg"
    # (the reference's second AUTO_EXPOSURE_SHADER, AutoExposure.h:14-19)
    exposure_mode: str = "histogram"
    manual_exposure: float = 1.0
    # post chain (reference: FireflyFilter -> [denoise] -> TAA -> Display)
    firefly_factor: float = 0.0  # 0 = off
    denoise: bool = False  # a-trous edge-aware filter
    taa: bool = True  # temporal AA / temporal accumulation on HDR


class FrameState(NamedTuple):
    """Temporal state carried between frames (the reference's ping-pong
    reservoir/G-buffer textures, DirectLighting.h:106-116)."""

    reservoirs: jnp.ndarray  # [R_ROWS, N] DI reservoirs
    gi_reservoirs: jnp.ndarray  # [R_ROWS, N] GI reservoirs (zeros if unused)
    # PACKED temporal G-buffer planes (ops.gbuffer_pack.TG): oct16-snorm
    # normal + R32F depth + instance id -- the reference's packed plane
    # formats, 13x smaller than the 40-row shading G-buffer
    gbuf: jnp.ndarray  # [TG.ROWS, N]
    camera_prev: object  # Camera pytree
    history: jnp.ndarray  # [H, W, 3] TAA color history (HDR)
    sky_reservoirs: object = None  # [16, N] SkyDI direction reservoirs
    # FSR2-tier luminance-lock plane [H, W] (ops.upscale; None unless
    # render_scale != 1 with cfg.upscale_cfg.locks)
    upscale_lock: object = None


def _postprocess(hdr, cfg, axis_name=None, ldr_transform=None):
    """hdr: PLANAR [3, ...] linear radiance -> u8 sRGB, same layout.

    ``ldr_transform``: optional post-tonemap hook (RCAS sharpening of the
    upscaled output -- RCAS assumes ~[0, 1] signals, so it runs here)."""
    if cfg.auto_exposure:
        if cfg.exposure_mode == "weighted_avg":
            exposure, _ = post.weighted_avg_exposure_p(hdr, axis_name=axis_name)
        else:
            exposure = post.histogram_exposure_p(hdr, axis_name=axis_name)
    else:
        exposure = cfg.manual_exposure
    ldr = post.TONEMAPPERS_P[cfg.tonemapper](hdr * exposure)
    if ldr_transform is not None:
        ldr = ldr_transform(ldr)
    return post.to_u8(post.srgb_encode(ldr))


def _on_cpu():
    return jax.default_backend() == "cpu"


def _pick_rt(n_loc: int) -> int:
    """Pallas ray-tile width: divides the shard's pixel count so global
    RNG/light-set tiling is sharding-invariant (lane-dim multiple of 128)."""
    for rt in (1024, 512, 256, 128):
        if n_loc % rt == 0:
            return rt
    return 1024


def _sky_background(gb, sky):
    """Sky + sun-disk radiance on primary-miss pixels. Returns [3, N]."""
    from ..accel.megakernel import G
    from ..core import vec3 as v3
    from ..core.vec3 import V3
    from ..ops import sky as SK

    valid = gb[G.VALID] > 0.5
    wo = v3.from_rows(gb, G.WO)
    d = V3(-wo.x, -wo.y, -wo.z)
    d_aos = jnp.stack([d.x, d.y, d.z], -1)
    env = SK.sky_radiance(d, sky, with_disk=False)
    disk = SK.sun_disk(d_aos, sky)
    env_rgb = jnp.stack([env.x, env.y, env.z], 0) + disk.T
    return jnp.where(valid[None, :], 0.0, env_rgb)


def _sky_direct(scene, gb, sky):
    """Sky background on primary-miss pixels + sun NEE at primary hits.

    The SkyDI-lite terms the pt/restir_di paths get from the PT trace
    (reference: SkyDI pass, SkyDI.h:1-137); the restir_gi mode composes
    direct light from reservoirs only, so these terms are added here.
    Returns [3, N].
    """
    import numpy as np

    from ..accel.intersect import intersect_occluded
    from ..accel.megakernel import G
    from ..core import vec3 as v3
    from ..core.vec3 import V3
    from ..ops import restir_di as RD
    from ..ops import shading_soa as S
    from ..ops import sky as SK

    valid = gb[G.VALID] > 0.5
    wo = v3.from_rows(gb, G.WO)
    background = _sky_background(gb, sky)

    pos, ns, ng, _wo2, mat, _valid = RD._surface_from_gbuf(gb, coat=bool(scene.has_coat))
    frame = S.make_frame(ns)
    wo_l = frame.to_local(wo)
    sun = np.asarray(sky.sun_dir, np.float64)
    sun = (sun / np.linalg.norm(sun)).astype(np.float32)
    n = gb.shape[1]
    sdir = V3(
        jnp.full((n,), float(sun[0])),
        jnp.full((n,), float(sun[1])),
        jnp.full((n,), float(sun[2])),
    )
    cos_s = v3.dot(sdir, ns)
    f_s, _ = S.bsdf_eval(mat, wo_l, frame.to_local(sdir))
    so = pos + ng * 1e-3
    occ = intersect_occluded(
        scene,
        jnp.stack([so.x, so.y, so.z], -1),
        jnp.stack([sdir.x, sdir.y, sdir.z], -1),
        t_min=1e-3, t_max=1e8,
    )
    e_sun = np.asarray(SK.sun_irradiance(sky))
    gain = jnp.where(valid & (cos_s > 1e-6) & ~occ, cos_s, 0.0)
    sun_term = jnp.stack(
        [f_s.x * float(e_sun[0]) * gain,
         f_s.y * float(e_sun[1]) * gain,
         f_s.z * float(e_sun[2]) * gain], 0,
    )
    return background + sun_term


def _prev_positions(gb, motion):
    """Previous-frame world position of each pixel's hit point: [N, 3].

    ``motion``: [I+1, 3, 4] per-instance world->world transforms
    D_i = W_prev_i @ W_curr_i^-1 (identity appended at index I for misses),
    from ``scene.animation.transform_deltas(curr_worlds, prev_worlds)``.
    The reference writes a motion-vector G-buffer plane from the previous
    transform stored per TLAS instance (RtCommon.h:47-63 MeshInstance);
    here the tiny per-instance table is gathered with a one-hot matmul.
    """
    from ..accel.megakernel import G

    motion = jnp.asarray(motion, jnp.float32)
    n_inst = motion.shape[0]
    inst = gb[G.INST]
    idx = jnp.where(inst < 0.0, n_inst - 1, inst).astype(jnp.int32)
    onehot = (idx[:, None] == jnp.arange(n_inst)[None, :]).astype(jnp.float32)
    m = onehot @ motion.reshape(n_inst, 12)  # [N, 12]
    p = jnp.stack([gb[G.POS], gb[G.POS + 1], gb[G.POS + 2]], -1)
    rot = m.reshape(-1, 3, 4)
    return jnp.einsum("nij,nj->ni", rot[:, :, :3], p) + rot[:, :, 3]


def _lens_u(camera, key, n):
    """Per-pixel lens-disk uniforms for thin-lens DoF, or None (pinhole).

    Wires Camera.lens_radius through (reference Camera.h:52-56: f-stop /
    focal length / focus distance); lens_radius stays a static pytree field
    so pinhole cameras compile the DoF path out entirely."""
    if camera.lens_radius <= 0.0:
        return None
    return jax.random.uniform(jax.random.fold_in(key, 0x0D0F), (n, 2))


def render_frame_restir(
    scene, camera, key, cfg: RenderConfig, state: FrameState | None,
    textures=None, shard=None, motion=None,
):
    """ReSTIR DI direct (+ ReSTIR GI or PT indirect) frame.
    Returns (outputs, FrameState).

    ``textures``: optional {index: [H,W,4] jnp} dict (scene.textures); base
    color is modulated at primary visibility.

    ``motion``: optional [I+1, 3, 4] per-instance curr->prev world
    transforms for animated geometry (see ``_prev_positions``); temporal
    reuse and TAA then reproject each hit's *previous* position. Pass
    ``scene.animation.transform_deltas(W_curr, W_prev)[0]``.

    ``shard``: optional parallel.halo.ShardCtx -- the function then runs as
    the per-device body under shard_map: it renders its own image-row band,
    exchanges halo rows via ppermute for every stencil pass (temporal
    reprojection, spatial reuse, a-trous, TAA) and psums the exposure
    histogram. With matching tile sizes the sharded frame is bit-identical
    to the unsharded one (global pixel ids drive all RNG streams).
    """
    from ..accel.megakernel import G, build_light_sets, gbuffer
    from ..core.rng import seed_from_key
    from ..ops import restir_di as RD

    w, h = cfg.width, cfg.height
    if cfg.render_scale != 1.0:
        # FSR2-slot temporal upscaling: everything up to the upscaler runs
        # at render res; only the color history/output are display res.
        # Sharded frames render row bands at render res and reconstruct
        # their display-res band with halo-extended inputs (ops.upscale).
        w = max(8, int(round(cfg.width * cfg.render_scale)))
        h = max(8, int(round(cfg.height * cfg.render_scale)))
    trans = scene.has_transmission
    coat = scene.has_coat
    seed = seed_from_key(key)
    interp = _on_cpu()

    if shard is None:
        h_loc, row0, pix, pix0, axis, n_sh, halo = h, 0, None, 0, None, 1, 0
        o, d = camera.generate_rays(w, h, lens_u=_lens_u(camera, key, w * h))
    else:
        from ..parallel.halo import halo_exchange_flat as _hxf
        from ..parallel.halo import halo_exchange_rows as _hx

        h_loc, n_sh, halo, axis = (
            shard.h_local, shard.n_shards, shard.halo, shard.axis,
        )
        row0 = jax.lax.axis_index(axis) * h_loc
        pix0 = row0 * w
        pix = pix0 + jnp.arange(h_loc * w, dtype=jnp.int32)
        o, d = camera.generate_rays(
            w, h, lens_u=_lens_u(camera, key, shard.h_local * w),
            rows=(row0, h_loc),
        )

    n_loc = h_loc * w
    rt = _pick_rt(n_loc)

    # Banded gathers (core.gatherband): single-chip large-res mitigation for
    # the reuse/TAA gather cliff; sharded frames keep per-shard tables small
    # (the multi-chip instance of the same banding) so band=None there.
    band = None
    if shard is None and cfg.band_rows != 0:
        from ..core.gatherband import pick_band_rows

        br = cfg.band_rows if cfg.band_rows > 0 else pick_band_rows(h, w, 16)
        if br > 0 and h % br == 0:
            band = (br, cfg.band_halo)

    gb = gbuffer(scene, o, d, rt=rt, interpret=interp)
    if textures:
        from ..scene.textures import apply_textures_to_gbuffer

        gb = apply_textures_to_gbuffer(
            gb, textures, spread_angle=camera.pixel_spread_angle(h)
        )
    pos_prev = _prev_positions(gb, motion) if motion is not None else None
    lsets = build_light_sets(scene, seed)

    # Joint temporal gather: DI + indirect reservoirs + the packed temporal
    # G-buffer reproject identically, so ONE gather serves all three
    # temporal passes (gather cost is per index -- see restir_di._take_multi)
    pf_di_t = pf_ind_t = None
    joint_t = (
        shard is None and state is not None and cfg.indirect
        and cfg.restir.temporal and cfg.restir.packed_reuse
        and (
            (cfg.mode == "restir_gi" and cfg.restir_gi.temporal
             and cfg.restir_gi.packed_reuse)
            or (cfg.mode == "restir_pt" and cfg.restir_pt.temporal
                and cfg.restir_pt.packed_reuse)
        )
    )
    if joint_t:
        from ..ops.reservoir_pack import pack_di, pack_pt, unpack_di, unpack_pt

        idx_t, inside_t, dest_t = RD.reproject_prev(
            gb, state.camera_prev, w, h, pos_prev=pos_prev
        )
        if cfg.mode == "restir_gi":
            ind_packed = pack_di(state.gi_reservoirs)
        else:
            ind_packed = pack_pt(state.gi_reservoirs)
        (p_di, p_ind, p_g), okb_t = RD._take_multi(
            [pack_di(state.reservoirs), ind_packed, state.gbuf],
            idx_t, band, w, h, 0,
        )
        pf_di_t = (unpack_di(p_di), p_g, inside_t, dest_t, okb_t)
        unp = unpack_di if cfg.mode == "restir_gi" else unpack_pt
        pf_ind_t = (unp(p_ind), p_g, inside_t, dest_t, okb_t)
    res = RD.initial_candidates(
        gb, lsets, seed, cfg.restir, rt=rt, interpret=interp,
        trans=trans, coat=coat, pix0=pix0,
    )
    lvg = None
    gi_lvg = cfg.mode == "restir_gi" and cfg.restir_gi.lvg and cfg.indirect
    if cfg.restir.lvg_samples > 0 or gi_lvg:
        # PreLighting LVG: camera-space voxel reservoirs feed extra
        # spatially-aware DI candidates (reference: BuildLightVoxelGrid)
        # and, in the ReSTIR_GI_LVG variant, the GI path's NEE candidates
        from ..ops.prelighting import build_light_voxel_grid

        lvg = build_light_voxel_grid(scene, camera, seed, cfg.lvg_cfg)
    if cfg.restir.lvg_samples > 0:
        res = RD.lvg_merge(
            res, gb, camera, lvg, seed, cfg.restir, cfg.lvg_cfg,
            trans=trans, coat=coat, pix=pix,
        )
    if cfg.restir.temporal and state is not None:
        if shard is None:
            res = RD.temporal_reuse(
                res, state.reservoirs, state.gbuf, gb, state.camera_prev,
                w, h, seed, cfg.restir, trans=trans, coat=coat,
                pos_prev=pos_prev, band=band, prefetch=pf_di_t,
            )
        else:
            prev_r = _hxf(state.reservoirs, w, halo, axis, n_sh)
            prev_g = _hxf(state.gbuf, w, halo, axis, n_sh)
            res = RD.temporal_reuse(
                res, prev_r, prev_g, gb, state.camera_prev,
                w, h, seed, cfg.restir, trans=trans, coat=coat, pix=pix,
                prev_row0=row0 - halo, prev_rows=h_loc + 2 * halo,
                pos_prev=pos_prev,
            )
    res = RD.visibility_reuse(scene, res, gb)
    if shard is None:
        res_sp = RD.spatial_reuse(
            res, gb, w, h, seed, cfg.restir, trans=trans, coat=coat,
            band=band,
        )
    else:
        hs = cfg.restir.spatial_radius
        gb_ext = _hxf(gb, w, hs, axis, n_sh)
        res_sp = res
        di_step = (
            RD.spatial_step_pairwise
            if cfg.restir.spatial_mis == "pairwise" else RD.spatial_step
        )
        for it in range(cfg.restir.spatial_iterations):
            res_ext = _hxf(res_sp, w, hs, axis, n_sh)
            res_sp = di_step(
                res_sp, gb, w, h, seed, it, cfg.restir, trans=trans,
                coat=coat, pix=pix,
                res_src=res_ext, gbuf_src=gb_ext, src_row0=row0 - hs,
            )
    direct = RD.shade(scene, res_sp, gb, trans=trans, coat=coat, rows_out=True)

    # -- SkyDI: reservoir sun+sky direct lighting (restir_gi/pt modes
    # compose direct light purely from reservoirs; DI-mode gets sky terms
    # from its PT indirect trace)
    sky_res_new = None
    use_skydi = (
        cfg.skydi and cfg.pt.sky is not None
        and cfg.mode in ("restir_gi", "restir_pt")
    )
    if use_skydi:
        from ..ops import skydi as SD

        sky_res = SD.initial_candidates(
            gb, cfg.pt.sky, seed, cfg.skydi_cfg, trans=trans, coat=coat,
            pix=pix,
        )
        if (
            cfg.skydi_cfg.temporal and state is not None
            and state.sky_reservoirs is not None
        ):
            if shard is None:
                sky_res = SD.temporal_reuse(
                    sky_res, state.sky_reservoirs, state.gbuf, gb,
                    state.camera_prev, w, h, seed, cfg.skydi_cfg, cfg.pt.sky,
                    trans=trans, coat=coat, pos_prev=pos_prev, band=band,
                )
            else:
                prev_sr = _hxf(state.sky_reservoirs, w, halo, axis, n_sh)
                prev_sg = _hxf(state.gbuf, w, halo, axis, n_sh)
                sky_res = SD.temporal_reuse(
                    sky_res, prev_sr, prev_sg, gb, state.camera_prev,
                    w, h, seed, cfg.skydi_cfg, cfg.pt.sky, trans=trans,
                    coat=coat, pix=pix, prev_row0=row0 - halo,
                    prev_rows=h_loc + 2 * halo, pos_prev=pos_prev,
                )
        sky_res_new = sky_res
        if shard is None:
            sky_sp = SD.spatial_reuse(
                sky_res, gb, w, h, seed, cfg.skydi_cfg, trans=trans,
                coat=coat, band=band,
            )
        else:
            hk = cfg.skydi_cfg.spatial_radius
            gb_ext_s = _hxf(gb, w, hk, axis, n_sh)
            sky_sp = sky_res
            for it in range(cfg.skydi_cfg.spatial_iterations):
                sky_ext = _hxf(sky_sp, w, hk, axis, n_sh)
                sky_sp = SD.spatial_step(
                    sky_sp, gb, w, h, seed, it, cfg.skydi_cfg, trans=trans,
                    coat=coat, pix=pix, res_src=sky_ext, gbuf_src=gb_ext_s,
                    src_row0=row0 - hk,
                )
        direct = direct + SD.shade(scene, sky_sp, gb, trans=trans, coat=coat)
        direct = direct + _sky_background(gb, cfg.pt.sky)

    gi_res = jnp.zeros_like(res)
    if not cfg.indirect:
        indirect = jnp.zeros_like(direct)
    elif cfg.mode == "restir_gi":
        from ..ops import restir_gi as RG

        pt_cfg = replace(cfg.pt, min_emissive_bounce=2, min_nee_bounce=1)
        gi_res = RG.initial_samples(
            scene, gb, key, pt_cfg, seed, trans=trans, coat=coat, pix=pix,
            pix0=pix0, rt=rt, full_target=cfg.restir_gi.full_target,
            textures=textures, spread_angle=camera.pixel_spread_angle(h),
            lvg=lvg if gi_lvg else None,
            lvg_cam=camera if gi_lvg else None,
            lvg_cfg=cfg.lvg_cfg if gi_lvg else None,
        )
        if cfg.restir_gi.temporal and state is not None:
            if shard is None:
                gi_res = RG.temporal_reuse(
                    gi_res, state.gi_reservoirs, state.gbuf, gb,
                    state.camera_prev, w, h, seed, cfg.restir_gi, trans=trans,
                    coat=coat, pos_prev=pos_prev, band=band,
                    prefetch=pf_ind_t,
                )
            else:
                prev_gi = _hxf(state.gi_reservoirs, w, halo, axis, n_sh)
                prev_g_gi = _hxf(state.gbuf, w, halo, axis, n_sh)
                gi_res = RG.temporal_reuse(
                    gi_res, prev_gi, prev_g_gi, gb, state.camera_prev,
                    w, h, seed, cfg.restir_gi, trans=trans, coat=coat,
                    pix=pix,
                    prev_row0=row0 - halo, prev_rows=h_loc + 2 * halo,
                    pos_prev=pos_prev,
                )
        if shard is None:
            gi_sp = RG.spatial_reuse(
                gi_res, gb, w, h, seed, cfg.restir_gi, trans=trans,
                coat=coat, band=band,
            )
        else:
            hg = cfg.restir_gi.spatial_radius
            gb_ext_g = _hxf(gb, w, hg, axis, n_sh)
            gi_sp = gi_res
            for it in range(cfg.restir_gi.spatial_iterations):
                gi_ext = _hxf(gi_sp, w, hg, axis, n_sh)
                gi_sp = RG.spatial_step(
                    gi_sp, gb, w, h, seed, it, cfg.restir_gi, trans=trans,
                    coat=coat, pix=pix, res_src=gi_ext, gbuf_src=gb_ext_g,
                    src_row0=row0 - hg,
                )
        indirect = RG.shade(scene, gi_sp, gb, trans=trans, coat=coat, rows_out=True)
        if cfg.pt.sky is not None and not use_skydi:
            # SkyDI-lite: background + primary sun NEE (the pt trace supplies
            # these in the other modes; ADVICE round-1 finding #2). The full
            # SkyDI reservoir pass (cfg.skydi) supersedes this.
            direct = direct + _sky_direct(scene, gb, cfg.pt.sky)
    elif cfg.mode == "restir_pt":
        from ..ops import restir_pt as RP

        pt_cfg = replace(cfg.pt, min_emissive_bounce=2, min_nee_bounce=1)
        gi_res = RP.initial_samples(
            scene, gb, key, pt_cfg, seed, cfg.restir_pt, trans=trans,
            coat=coat, pix=pix, pix0=pix0, rt=rt, textures=textures,
            spread_angle=camera.pixel_spread_angle(h),
        )
        # Materialize the reservoir at stage boundaries: without the barrier
        # XLA fuses each stage's 58-row producer chain into the next stage's
        # many consumers and re-computes it per consumer -- measured 232 ms
        # vs 69 ms for initial->temporal->spatial->shade at 512^2 on v5e.
        gi_res = jax.lax.optimization_barrier(gi_res)
        if cfg.restir_pt.temporal and state is not None:
            if shard is None:
                gi_res = RP.temporal_reuse(
                    gi_res, state.gi_reservoirs, state.gbuf, gb,
                    state.camera_prev, w, h, seed, cfg.restir_pt,
                    trans=trans, coat=coat, pos_prev=pos_prev, band=band,
                    scene=scene, prefetch=pf_ind_t,
                )
            else:
                prev_pt = _hxf(state.gi_reservoirs, w, halo, axis, n_sh)
                prev_g_pt = _hxf(state.gbuf, w, halo, axis, n_sh)
                gi_res = RP.temporal_reuse(
                    gi_res, prev_pt, prev_g_pt, gb, state.camera_prev,
                    w, h, seed, cfg.restir_pt, trans=trans, coat=coat,
                    pix=pix,
                    prev_row0=row0 - halo, prev_rows=h_loc + 2 * halo,
                    pos_prev=pos_prev, scene=scene,
                )
            gi_res = jax.lax.optimization_barrier(gi_res)
        if shard is None:
            pt_sp = RP.spatial_reuse(
                gi_res, gb, w, h, seed, cfg.restir_pt, trans=trans,
                coat=coat, band=band, scene=scene,
            )
        else:
            hp = cfg.restir_pt.spatial_radius
            gb_ext_p = _hxf(gb, w, hp, axis, n_sh)
            pt_sp = gi_res
            for it in range(cfg.restir_pt.spatial_iterations):
                pt_ext = _hxf(pt_sp, w, hp, axis, n_sh)
                pt_sp = RP.spatial_step(
                    pt_sp, gb, w, h, seed, it, cfg.restir_pt, trans=trans,
                    coat=coat, pix=pix, res_src=pt_ext, gbuf_src=gb_ext_p,
                    src_row0=row0 - hp, scene=scene,
                )
        indirect = RP.shade(
            scene, pt_sp, gb, cfg.restir_pt, trans=trans, coat=coat,
            rows_out=True,
        )
        if cfg.pt.sky is not None and not use_skydi:
            direct = direct + _sky_direct(scene, gb, cfg.pt.sky)
    else:
        pt_cfg = replace(cfg.pt, min_emissive_bounce=2, min_nee_bounce=1)
        indirect = trace(
            scene, o, d, key, pt_cfg, pix0=pix0, rt=rt, rows_out=True,
            textures=textures, spread_angle=camera.pixel_spread_angle(h),
        )
    # everything image-space stays PLANAR [3, h, w] from here (channel-last
    # wastes 125/128 VPU lanes; measured ~70 ms/frame at 512x512)
    hdr = (direct + indirect).reshape(3, h_loc, w)

    if cfg.volumetrics is not None and cfg.pt.sky is not None:
        # froxel inscattering composited like the reference
        # (Compositing.hlsl:89-95: color * Tr + Ls)
        from ..ops.volumetrics import apply_inscattering, build_froxels

        froxels = build_froxels(scene, camera, cfg.pt.sky, cfg.volumetrics)
        hdr = apply_inscattering(
            hdr, gb, camera, froxels, cfg.volumetrics, w, h,
            row0=row0 if shard is not None else 0, height_full=h,
        )

    # -- post chain: firefly -> a-trous -> TAA (reference Compositing tail)
    from ..ops import denoise as DN
    from ..ops import taa as TA

    normal_img = gb[G.NS : G.NS + 3].reshape(3, h_loc, w)
    depth_img = gb[G.DEPTH].reshape(h_loc, w)
    valid_img = (gb[G.VALID] > 0.5).reshape(h_loc, w)
    if cfg.firefly_factor > 0.0:
        if shard is None:
            hdr = DN.firefly_filter_p(hdr, cfg.firefly_factor)
        else:
            hdr = DN.firefly_filter_p(
                _hx(hdr, 1, axis, n_sh, row_axis=1), cfg.firefly_factor
            )[:, 1:-1]
    if cfg.denoise:
        if shard is None:
            hdr = DN.atrous_denoise_p(hdr, normal_img, depth_img, valid_img)
        else:
            dn_cfg = DN.ATrousConfig()
            hmax = 2 * (1 << (dn_cfg.iterations - 1))
            vf = valid_img.astype(jnp.float32)
            nrm_ext = _hx(normal_img, hmax, axis, n_sh, row_axis=1)
            dep_ext = _hx(depth_img, hmax, axis, n_sh)
            vf_ext = _hx(vf, hmax, axis, n_sh)
            out = hdr
            for it in range(dn_cfg.iterations):
                step = 1 << it
                hh = 2 * step
                sl = lambda a: a[hmax - hh : hmax + h_loc + hh]
                sl3 = lambda a: a[:, hmax - hh : hmax + h_loc + hh]
                out = DN.atrous_iteration_p(
                    _hx(out, hh, axis, n_sh, row_axis=1),
                    sl3(nrm_ext), sl(dep_ext), sl(vf_ext), step, dn_cfg,
                )[:, hh:-hh]
            hdr = out
    if pos_prev is not None:
        pos_img = pos_prev.T.reshape(3, h_loc, w)
    else:
        pos_img = gb[G.POS : G.POS + 3].reshape(3, h_loc, w)
    upscale_lock_new = None
    if cfg.render_scale != 1.0:
        from ..ops.gbuffer_pack import TG
        from ..ops.upscale import taau_resolve

        hist = state.history if (cfg.taa and state is not None) else None
        prev_c = state.camera_prev if state is not None else camera
        # FSR2-tier temporal inputs: previous depth plane (depth clip) and
        # the luminance-lock plane, both gated like the history
        prev_depth = (
            state.gbuf[TG.DEPTH].reshape(h_loc, w)
            if hist is not None else None
        )
        lock = state.upscale_lock if hist is not None else None
        if shard is None:
            hdr, upscale_lock_new = taau_resolve(
                hdr, hist, pos_img, valid_img, depth_img, prev_c,
                camera.jitter, cfg.width, cfg.height, cfg.upscale_cfg,
                prev_depth_lr=prev_depth, lock=lock,
            )
        else:
            # render-res stencils (bilinear/minmax/dilate) need a 2-row
            # halo; the display-res history reuses the temporal halo.
            # CLAMPED halos: taau's resamplers clamp at the image
            # boundary, so the first/last shard must see edge-replicated
            # rows, not the circular wrap (parallel.halo).
            from ..parallel.halo import halo_exchange_rows_clamped as _hxc

            hs = 2
            out_rows = cfg.height // n_sh
            out_row0 = jax.lax.axis_index(axis) * out_rows
            if hist is not None:
                hist = _hxc(hist, halo, axis, n_sh, row_axis=1)
            if prev_depth is not None:
                prev_depth = _hxc(prev_depth, hs, axis, n_sh)
            if lock is not None:
                lock = _hxc(lock, halo, axis, n_sh)
            hdr, upscale_lock_new = taau_resolve(
                _hxc(hdr, hs, axis, n_sh, row_axis=1),
                hist,
                _hxc(pos_img, hs, axis, n_sh, row_axis=1),
                _hxc(valid_img, hs, axis, n_sh),
                _hxc(depth_img, hs, axis, n_sh),
                prev_c, camera.jitter, cfg.width, cfg.height,
                cfg.upscale_cfg,
                out_row0=out_row0, out_rows=out_rows, lr_row0=row0 - hs,
                hr_full=h, hist_row0=out_row0 - halo,
                prev_depth_lr=prev_depth, lock=lock,
            )
    elif cfg.taa and state is not None:
        if shard is None:
            hdr = TA.taa_resolve_p(
                hdr, state.history, pos_img, valid_img, state.camera_prev,
                depth=depth_img, band=band,
            )
        else:
            # clamped halos: TAA's resamplers and (now edge-clamped)
            # stencils both clamp at the image boundary
            from ..parallel.halo import halo_exchange_rows_clamped as _hxct

            hist_ext = _hxct(state.history, halo, axis, n_sh, row_axis=1)
            hdr = TA.taa_resolve_p(
                hdr, hist_ext, pos_img, valid_img, state.camera_prev,
                height_full=h, hist_row0=row0 - halo,
                hist_rows=h_loc + 2 * halo,
                curr_ext=_hxct(hdr, 1, axis, n_sh, row_axis=1),
                depth=depth_img, row0=row0,
            )

    rcas_tf = None
    if cfg.render_scale != 1.0 and cfg.upscale_cfg.rcas_sharpness > 0.0:
        from ..ops import upscale as UP

        if shard is None:
            rcas_tf = lambda l: UP.rcas_p(l, cfg.upscale_cfg.rcas_sharpness)
        else:
            from ..parallel.halo import halo_exchange_rows_clamped as _hxc2

            def rcas_tf(l):  # 3x3 cross stencil: 1-row clamped halo
                ext = _hxc2(l, 1, axis, n_sh, row_axis=1)
                return UP.rcas_p(ext, cfg.upscale_cfg.rcas_sharpness)[:, 1:-1]
    ldr = _postprocess(hdr, cfg, axis_name=axis, ldr_transform=rcas_tf)
    # Temporal feedback stores the *pre-spatial* reservoirs (the reference
    # feeds the temporal reservoirs forward, DirectLighting.cpp); the TAA
    # history stays planar [3, h, w].
    from ..ops.gbuffer_pack import pack_temporal

    new_state = FrameState(
        reservoirs=res, gi_reservoirs=gi_res, gbuf=pack_temporal(gb),
        camera_prev=camera, history=hdr, sky_reservoirs=sky_res_new,
        upscale_lock=upscale_lock_new,
    )
    # external contract: channel-last [H, W, 3] images
    return {"hdr": hdr.transpose(1, 2, 0), "ldr": ldr.transpose(1, 2, 0)}, new_state


def render_frame(scene, camera, key, cfg: RenderConfig, shard_rays=None):
    """Scene + camera + RNG key -> dict of frame outputs (all device arrays).

    Returns {"hdr": [H,W,3] f32 radiance, "ldr": [H,W,3] u8 sRGB}.
    ``shard_rays``: optional fn applying a sharding constraint to the flat
    ray arrays (see parallel.mesh for the multi-chip layout).
    """
    w, h = cfg.width, cfg.height
    o, d = camera.generate_rays(w, h, lens_u=_lens_u(camera, key, w * h))
    if shard_rays is not None:
        o, d = shard_rays(o), shard_rays(d)
    hdr = trace(scene, o, d, key, cfg.pt, rows_out=True).reshape(3, h, w)
    if cfg.volumetrics is not None and cfg.pt.sky is not None:
        from ..accel.megakernel import gbuffer
        from ..ops.volumetrics import apply_inscattering, build_froxels

        gb = gbuffer(scene, o, d, interpret=_on_cpu())
        froxels = build_froxels(scene, camera, cfg.pt.sky, cfg.volumetrics)
        hdr = apply_inscattering(hdr, gb, camera, froxels, cfg.volumetrics, w, h)
    ldr = _postprocess(hdr, cfg)
    return {"hdr": hdr.transpose(1, 2, 0), "ldr": ldr.transpose(1, 2, 0)}


@partial(jax.jit, static_argnames=("cfg",))
def render_frame_jit(scene, camera, key, cfg: RenderConfig):
    """Jitted frame program. ``scene`` is an argument (never closed over:
    closed-over device arrays become baked constants, which measured ~1000x
    slower on TPU -- see accel.intersect notes)."""
    return render_frame(scene, camera, key, cfg)


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(4,))
def render_frame_restir_jit(
    scene, camera, key, cfg: RenderConfig, state, textures=None, motion=None
):
    """Jitted stateful ReSTIR frame (state=None on the first frame).

    The incoming FrameState is DONATED: at 1080p it holds multi-plane
    reservoirs + packed G-buffer + TAA history (~hundreds of MB), and the
    reference's equivalent buffers are fence-recycled, not reallocated
    (GpuMemory.h). Callers must rebind (`out, state = ...`), which every
    in-tree caller already does; XLA reuses the buffers in place."""
    return render_frame_restir(
        scene, camera, key, cfg, state, textures, motion=motion
    )
