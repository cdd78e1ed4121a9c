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
    # "restir_gi" = ReSTIR direct + ReSTIR GI indirect (the reference's
    # DirectLighting + IndirectLighting + Compositing frame structure)
    mode: str = "pt"
    pt: PTConfig = field(default_factory=PTConfig)
    restir: ReSTIRConfig = field(default_factory=ReSTIRConfig)
    restir_gi: "object" = None  # ReSTIRGIConfig; default built in __post_init__
    indirect: bool = True  # add the indirect pass in restir modes

    def __post_init__(self):
        if self.restir_gi is None:
            from ..ops.restir_gi import ReSTIRGIConfig

            object.__setattr__(self, "restir_gi", ReSTIRGIConfig())
    tonemapper: str = "agx"
    auto_exposure: bool = True
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
    gbuf: jnp.ndarray  # [G.ROWS, N]
    camera_prev: object  # Camera pytree
    history: jnp.ndarray  # [H, W, 3] TAA color history (HDR)


def _postprocess(hdr, cfg):
    if cfg.auto_exposure:
        exposure = post.histogram_exposure(hdr)
    else:
        exposure = cfg.manual_exposure
    ldr = post.TONEMAPPERS[cfg.tonemapper](hdr * exposure)
    return post.to_u8(post.srgb_encode(ldr))


def _on_cpu():
    return jax.default_backend() == "cpu"


def render_frame_restir(
    scene, camera, key, cfg: RenderConfig, state: FrameState | None, textures=None
):
    """ReSTIR DI direct + PT indirect frame. Returns (outputs, FrameState).

    ``textures``: optional {index: [H,W,4] jnp} dict (scene.textures); base
    color is modulated at primary visibility.
    """
    from ..accel.megakernel import gbuffer, build_light_sets
    from ..ops import restir_di as RD
    from ..core.rng import seed_from_key

    w, h = cfg.width, cfg.height
    o, d = camera.generate_rays(w, h)
    seed = seed_from_key(key)
    interp = _on_cpu()

    gb = gbuffer(scene, o, d, interpret=interp)
    if textures:
        from ..scene.textures import apply_textures_to_gbuffer

        gb = apply_textures_to_gbuffer(gb, textures)
    lsets = build_light_sets(scene, seed)
    res = RD.initial_candidates(gb, lsets, seed, cfg.restir, interpret=interp)
    if cfg.restir.temporal and state is not None:
        res = RD.temporal_reuse(
            res, state.reservoirs, state.gbuf, gb, state.camera_prev,
            w, h, seed, cfg.restir,
        )
    res = RD.visibility_reuse(scene, res, gb)
    res_sp = RD.spatial_reuse(res, gb, w, h, seed, cfg.restir)
    direct = RD.shade(scene, res_sp, gb)

    gi_res = jnp.zeros_like(res)
    if not cfg.indirect:
        indirect = jnp.zeros_like(direct)
    elif cfg.mode == "restir_gi":
        from ..ops import restir_gi as RG

        pt_cfg = replace(cfg.pt, min_emissive_bounce=2, min_nee_bounce=1)
        gi_res = RG.initial_samples(scene, gb, key, pt_cfg, seed)
        if cfg.restir_gi.temporal and state is not None:
            gi_res = RG.temporal_reuse(
                gi_res, state.gi_reservoirs, state.gbuf, gb,
                state.camera_prev, w, h, seed, cfg.restir_gi,
            )
        gi_sp = RG.spatial_reuse(gi_res, gb, w, h, seed, cfg.restir_gi)
        indirect = RG.shade(scene, gi_sp, gb)
    else:
        pt_cfg = replace(cfg.pt, min_emissive_bounce=2, min_nee_bounce=1)
        indirect = trace(scene, o, d, key, pt_cfg)
    hdr = (direct + indirect).reshape(h, w, 3)

    # -- post chain: firefly -> a-trous -> TAA (reference Compositing tail)
    from ..accel.megakernel import G
    from ..ops import denoise as DN
    from ..ops import taa as TA

    if cfg.firefly_factor > 0.0:
        hdr = DN.firefly_filter(hdr, cfg.firefly_factor)
    normal_img = gb[G.NS : G.NS + 3].T.reshape(h, w, 3)
    depth_img = gb[G.DEPTH].reshape(h, w)
    valid_img = (gb[G.VALID] > 0.5).reshape(h, w)
    if cfg.denoise:
        hdr = DN.atrous_denoise(hdr, normal_img, depth_img, valid_img)
    if cfg.taa and state is not None:
        pos_img = gb[G.POS : G.POS + 3].T.reshape(h, w, 3)
        hdr = TA.taa_resolve(
            hdr, state.history, pos_img, valid_img, state.camera_prev
        )

    ldr = _postprocess(hdr, cfg)
    # Temporal feedback stores the *pre-spatial* reservoirs (the reference
    # feeds the temporal reservoirs forward, DirectLighting.cpp).
    new_state = FrameState(
        reservoirs=res, gi_reservoirs=gi_res, gbuf=gb, camera_prev=camera,
        history=hdr,
    )
    return {"hdr": hdr, "ldr": ldr}, new_state


def render_frame(scene, camera, key, cfg: RenderConfig, shard_rays=None):
    """Scene + camera + RNG key -> dict of frame outputs (all device arrays).

    Returns {"hdr": [H,W,3] f32 radiance, "ldr": [H,W,3] u8 sRGB}.
    ``shard_rays``: optional fn applying a sharding constraint to the flat
    ray arrays (see parallel.mesh for the multi-chip layout).
    """
    w, h = cfg.width, cfg.height
    o, d = camera.generate_rays(w, h)
    if shard_rays is not None:
        o, d = shard_rays(o), shard_rays(d)
    hdr = trace(scene, o, d, key, cfg.pt).reshape(h, w, 3)
    return {"hdr": hdr, "ldr": _postprocess(hdr, cfg)}


@partial(jax.jit, static_argnames=("cfg",))
def render_frame_jit(scene, camera, key, cfg: RenderConfig):
    """Jitted frame program. ``scene`` is an argument (never closed over:
    closed-over device arrays become baked constants, which measured ~1000x
    slower on TPU -- see accel.intersect notes)."""
    return render_frame(scene, camera, key, cfg)


@partial(jax.jit, static_argnames=("cfg",))
def render_frame_restir_jit(scene, camera, key, cfg: RenderConfig, state, textures=None):
    """Jitted stateful ReSTIR frame (state=None on the first frame)."""
    return render_frame_restir(scene, camera, key, cfg, state, textures)
