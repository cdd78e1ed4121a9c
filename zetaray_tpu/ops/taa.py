"""Temporal anti-aliasing + progressive accumulation.

Counterpart of the reference's TAA pass (TAA.hlsl: depth-dilated motion,
Catmull-Rom history resample, neighborhood clamp). TPU mapping: the history
is a [H, W, 3] array in the FrameState; reprojection reuses Camera.project
on G-buffer positions; the 3x3 neighborhood min/max is 9 jnp.rolls, which
XLA fuses into one sweep.

``accumulate`` is the offline progressive mode (reference's accumulation
toggle): a plain running average valid while the camera is static.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class TAAConfig:
    blend: float = 0.1  # weight of the current frame
    clamp: bool = True


def _neighborhood_minmax(img):
    lo = img
    hi = img
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            n = jnp.roll(jnp.roll(img, dy, axis=0), dx, axis=1)
            lo = jnp.minimum(lo, n)
            hi = jnp.maximum(hi, n)
    return lo, hi


def taa_resolve(curr, history, world_pos, valid, prev_cam, cfg: TAAConfig = TAAConfig()):
    """One TAA step.

    curr: [H, W, 3] this frame's color; history: [H, W, 3] previous output;
    world_pos: [H, W, 3] G-buffer positions (for reprojection); valid:
    [H, W] hit mask; prev_cam: previous frame's Camera. Returns the new
    resolved color (also the next history).
    """
    h, w, _ = curr.shape
    px, py, depth = prev_cam.project(world_pos.reshape(-1, 3), w, h)
    ix = jnp.clip(jnp.round(px).astype(jnp.int32), 0, w - 1)
    iy = jnp.clip(jnp.round(py).astype(jnp.int32), 0, h - 1)
    inside = (
        (px >= -0.5) & (px <= w - 0.5) & (py >= -0.5) & (py <= h - 0.5) & (depth > 0)
    )
    hist = history.reshape(-1, 3)[iy * w + ix].reshape(h, w, 3)
    if cfg.clamp:
        lo, hi = _neighborhood_minmax(curr)
        hist = jnp.clip(hist, lo, hi)
    ok = (inside.reshape(h, w) & valid)[..., None]
    blended = cfg.blend * curr + (1.0 - cfg.blend) * hist
    return jnp.where(ok, blended, curr)


def accumulate(curr, accum, frame_index):
    """Progressive average: accum_{n} = (accum_{n-1} * n + curr) / (n + 1)."""
    n = frame_index.astype(jnp.float32)
    return (accum * n + curr) / (n + 1.0)
