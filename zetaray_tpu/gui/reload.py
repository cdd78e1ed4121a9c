"""Hot reload: the dxc-shader-reload editor affordance (SURVEY section 3.4).

The reference's GUI has a "reload shader" button per pass: it re-runs
dxc.exe on the edited HLSL and swaps the PSO live
(PipelineStateLibrary.cpp:201-232). The TPU analog of a shader is a
Python op module compiled by XLA, so live reload = importlib.reload of
the op/render modules in dependency order + dropping jit caches; the next
frame retraces and recompiles the edited code without restarting the
viewer (scene stays uploaded, temporal state is reset by the caller since
reservoir layouts may have changed).

Modules that register pytree nodes (scene.camera, scene.scene) are
excluded: re-registration is an error, and scene/camera edits change data
layouts that require a restart anyway (the reference can't hot-reload its
C++ scene layer either).
"""

from __future__ import annotations

import importlib
import sys

# dependency order: leaves first so dependents rebind reloaded symbols
RELOAD_ORDER = [
    "zetaray_tpu.core.packing",
    "zetaray_tpu.core.sampling",
    "zetaray_tpu.core.rng",
    "zetaray_tpu.core.vec3",
    "zetaray_tpu.ops.shading_soa",
    "zetaray_tpu.ops.bsdf",
    "zetaray_tpu.ops.lights",
    "zetaray_tpu.ops.sky",
    "zetaray_tpu.accel.megakernel",
    "zetaray_tpu.accel.intersect",
    "zetaray_tpu.accel.stream",
    "zetaray_tpu.ops.pathtracer",
    "zetaray_tpu.ops.gbuffer_pack",
    "zetaray_tpu.ops.prelighting",
    "zetaray_tpu.ops.restir_di",
    "zetaray_tpu.ops.restir_gi",
    "zetaray_tpu.ops.restir_pt",
    "zetaray_tpu.ops.skydi",
    "zetaray_tpu.ops.volumetrics",
    "zetaray_tpu.ops.denoise",
    "zetaray_tpu.ops.taa",
    "zetaray_tpu.ops.upscale",
    "zetaray_tpu.ops.post",
    "zetaray_tpu.scene.textures",
    "zetaray_tpu.render.picking",
    "zetaray_tpu.render.frame",
    "zetaray_tpu.render.profile",
    "zetaray_tpu.render.graph",
]


def reload_ops(clear_jit: bool = True) -> list[str]:
    """Reload the op/render modules that are currently imported, leaves
    first. Returns the list actually reloaded. ``clear_jit`` drops every
    jit trace so the next call recompiles against the new code (the PSO
    swap)."""
    reloaded = []
    for name in RELOAD_ORDER:
        mod = sys.modules.get(name)
        if mod is not None:
            importlib.reload(mod)
            reloaded.append(name)
    if clear_jit:
        import jax

        jax.clear_caches()
    return reloaded
