"""Frame-graph introspection (RenderGraph::DebugDrawGraph analog).

The reference rebuilds an explicit DAG every frame and can visualize it via
imnodes (RenderGraph.cpp:1042). Here the frame *is* one XLA program, so
introspection means two things:

  - ``frame_dag(cfg)``: the logical pass-level DAG for the active
    RenderConfig as Graphviz DOT (what the reference draws);
  - ``dump_hlo(fn, *args)``: the actual compiled schedule -- the optimized
    HLO text XLA produced (the ground truth the logical DAG abstracts).
"""

from __future__ import annotations

import jax


def frame_dag(cfg) -> str:
    """Graphviz DOT of the logical pass graph for this RenderConfig."""
    edges: list[tuple[str, str]] = []
    nodes = ["camera_rays"]

    def edge(a, b):
        if a not in nodes:
            nodes.append(a)
        if b not in nodes:
            nodes.append(b)
        edges.append((a, b))

    if cfg.mode == "restir_di":
        edge("camera_rays", "gbuffer")
        edge("scene", "gbuffer")
        edge("scene", "presample_lights")
        edge("gbuffer", "restir_initial(RIS)")
        edge("presample_lights", "restir_initial(RIS)")
        edge("restir_initial(RIS)", "restir_temporal")
        edge("prev_frame_state", "restir_temporal")
        edge("restir_temporal", "visibility_reuse")
        edge("visibility_reuse", "restir_spatial")
        edge("restir_spatial", "shade_direct")
        edge("camera_rays", "pt_indirect(megakernel)")
        edge("scene", "pt_indirect(megakernel)")
        edge("shade_direct", "composite")
        edge("pt_indirect(megakernel)", "composite")
        src = "composite"
        if cfg.firefly_factor > 0.0:
            edge(src, "firefly_filter")
            src = "firefly_filter"
        if cfg.denoise:
            edge(src, "atrous_denoise")
            src = "atrous_denoise"
        if cfg.taa:
            edge(src, "taa")
            edge("prev_frame_state", "taa")
            src = "taa"
    else:
        edge("camera_rays", "pt(megakernel)")
        edge("scene", "pt(megakernel)")
        src = "pt(megakernel)"
    edge(src, "auto_exposure")
    edge("auto_exposure", "tonemap+sRGB")
    edge("tonemap+sRGB", "display")

    lines = ["digraph frame {", "  rankdir=LR;"]
    for n in nodes:
        lines.append(f'  "{n}" [shape=box];')
    for a, b in edges:
        lines.append(f'  "{a}" -> "{b}";')
    lines.append("}")
    return "\n".join(lines)


def dump_hlo(fn, *args, optimized: bool = True, **kwargs) -> str:
    """Compiled HLO text of a jittable frame fn (the real schedule)."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    if optimized:
        return lowered.compile().as_text()
    return lowered.as_text()


def dump_jaxpr(fn, *args, **kwargs) -> str:
    return str(jax.make_jaxpr(fn)(*args, **kwargs))
