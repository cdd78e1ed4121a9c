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

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp

from ..ops.pathtracer import PTConfig, trace
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
    pt: PTConfig = field(default_factory=PTConfig)
    tonemapper: str = "agx"
    auto_exposure: bool = True
    manual_exposure: float = 1.0


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

    if cfg.auto_exposure:
        exposure = post.histogram_exposure(hdr)
    else:
        exposure = cfg.manual_exposure
    exposed = hdr * exposure
    ldr = post.TONEMAPPERS[cfg.tonemapper](exposed)
    ldr = post.to_u8(post.srgb_encode(ldr))
    return {"hdr": hdr, "ldr": ldr}


@partial(jax.jit, static_argnames=("cfg",))
def render_frame_jit(scene, camera, key, cfg: RenderConfig):
    """Jitted frame program. ``scene`` is an argument (never closed over:
    closed-over device arrays become baked constants, which measured ~1000x
    slower on TPU -- see accel.intersect notes)."""
    return render_frame(scene, camera, key, cfg)
