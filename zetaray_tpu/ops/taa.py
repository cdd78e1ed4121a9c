"""Temporal anti-aliasing + progressive accumulation.

Counterpart of the reference's TAA pass (TAA.hlsl: depth-dilated motion,
Catmull-Rom history resample, neighborhood clamp). TPU mapping: the history
is a PLANAR [3, H, W] array in the FrameState (channel-last wastes 125/128
VPU lanes, see ops.post); reprojection reuses Camera.project on G-buffer
positions; the 3x3 neighborhood min/max is 9 jnp.rolls, which XLA fuses
into one sweep.

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


def _neighborhood_minmax_p(img):
    """img: [3, H, W] -> per-pixel 3x3 min/max."""
    lo = img
    hi = img
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            n = jnp.roll(jnp.roll(img, dy, axis=1), dx, axis=2)
            lo = jnp.minimum(lo, n)
            hi = jnp.maximum(hi, n)
    return lo, hi


def taa_resolve_p(
    curr, history, world_pos, valid, prev_cam, cfg: TAAConfig = TAAConfig(),
    height_full=None, hist_row0=0, hist_rows=None, curr_ext=None,
):
    """One TAA step, planar.

    curr: [3, H, W] this frame's color; history: [3, Hh, W] previous output;
    world_pos: [3, H, W] G-buffer positions (for reprojection); valid:
    [H, W] hit mask; prev_cam: previous frame's Camera. Returns the new
    resolved color (also the next history).

    Sharding hooks (parallel.mesh): ``height_full`` = full image height when
    curr is a row shard; ``history`` is then the halo-extended history with
    first row at global row ``hist_row0`` and ``hist_rows`` rows;
    ``curr_ext`` = 1-row halo-extended curr for the neighborhood clamp.
    """
    _, h, w = curr.shape
    hf = height_full if height_full is not None else h
    px, py, depth = prev_cam.project(world_pos.reshape(3, -1).T, w, hf)
    ix = jnp.clip(jnp.round(px).astype(jnp.int32), 0, w - 1)
    iy = jnp.clip(jnp.round(py).astype(jnp.int32), 0, hf - 1)
    inside = (
        (px >= -0.5) & (px <= w - 0.5) & (py >= -0.5) & (py <= hf - 0.5) & (depth > 0)
    )
    hr = hist_rows if hist_rows is not None else hf
    ey = iy - hist_row0
    inside = inside & (ey >= 0) & (ey < hr)
    ey = jnp.clip(ey, 0, hr - 1)
    hist = jnp.take(history.reshape(3, -1), ey * w + ix, axis=1).reshape(3, h, w)
    if cfg.clamp:
        if curr_ext is None:
            lo, hi = _neighborhood_minmax_p(curr)
        else:
            he = (curr_ext.shape[1] - h) // 2
            lo, hi = _neighborhood_minmax_p(curr_ext)
            lo, hi = lo[:, he:-he], hi[:, he:-he]
        hist = jnp.clip(hist, lo, hi)
    ok = (inside.reshape(h, w) & valid)[None]
    blended = cfg.blend * curr + (1.0 - cfg.blend) * hist
    return jnp.where(ok, blended, curr)


def taa_resolve(curr, history, world_pos, valid, prev_cam, cfg: TAAConfig = TAAConfig()):
    """Channel-last wrapper: curr/history/world_pos [H, W, 3]."""
    out = taa_resolve_p(
        jnp.moveaxis(curr, -1, 0),
        jnp.moveaxis(history, -1, 0),
        jnp.moveaxis(world_pos, -1, 0),
        valid, prev_cam, cfg,
    )
    return out.transpose(1, 2, 0)


def accumulate(curr, accum, frame_index):
    """Progressive average: accum_{n} = (accum_{n-1} * n + curr) / (n + 1)."""
    n = frame_index.astype(jnp.float32)
    return (accum * n + curr) / (n + 1.0)
