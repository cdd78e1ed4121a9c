"""Temporal anti-aliasing + progressive accumulation.

Counterpart of the reference's TAA pass (TAA.hlsl:1-16: depth-dilated
motion, Catmull-Rom history resample, neighborhood clamp). TPU mapping:
the history is a PLANAR [3, H, W] array in the FrameState (channel-last
wastes 125/128 VPU lanes, see ops.post); reprojection reuses Camera.project
on G-buffer positions; the 3x3 neighborhood min/max and the depth dilation
are jnp.rolls, which XLA fuses into one sweep; the Catmull-Rom resample is
16 gathers with separable cubic weights.

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
    # Catmull-Rom history resample (TAA.hlsl): sharper than bilinear/nearest
    # under motion; falls back to nearest when False.
    catmull_rom: bool = True
    # reproject via the closest-depth pixel in the 3x3 neighborhood
    # (TAA.hlsl depth dilation): stops edge ghosting on foreground objects
    depth_dilate: bool = True


def _neighborhood_minmax_p(img):
    """img: [3, H, W] -> per-pixel 3x3 min/max (edge-clamped borders:
    the resamplers this rectifies clamp at the image edge too, and a
    wrapped neighborhood would pull the opposite side of the image into
    the clamp bounds)."""
    _, h, w = img.shape
    p = jnp.pad(img, ((0, 0), (1, 1), (1, 1)), mode="edge")
    lo = img
    hi = img
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            n = p[:, 1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
            lo = jnp.minimum(lo, n)
            hi = jnp.maximum(hi, n)
    return lo, hi


def _cubic_w(f):
    """Catmull-Rom weights for the 4 taps around a sample at offset f in
    [0, 1) from tap 1. Returns (w0, w1, w2, w3)."""
    f2 = f * f
    f3 = f2 * f
    w0 = -0.5 * f3 + f2 - 0.5 * f
    w1 = 1.5 * f3 - 2.5 * f2 + 1.0
    w2 = -1.5 * f3 + 2.0 * f2 + 0.5 * f
    w3 = 0.5 * f3 - 0.5 * f2
    return w0, w1, w2, w3


def catmull_rom_p(img, px, py, band=None):
    """Catmull-Rom resample of a planar image at fractional pixel coords.

    img: [3, H, W]; px, py: [N] pixel-center coordinates (0.5 = center of
    texel 0 convention NOT used -- these are texel indices, i.e. 0.0 = the
    center of texel 0). Border-clamped. Returns [3, N].

    TPU mapping: the naive form is 16 scattered gathers, ~46 ms at 512^2 on
    v5e (gathers along the lane dim serialize). Instead, pre-shift the
    edge-padded image into an items-major [H*W, 48] window table (16 taps x
    3 channels per pixel, pure strided slices that XLA streams at HBM
    speed), then fetch each pixel's whole 4x4x3 window with ONE row gather
    and reduce against the separable cubic weights: ~4 ms, bit-identical.
    """
    _, h, w = img.shape
    n = px.shape[0]
    pxc = jnp.clip(px, 0.0, w - 1.0)
    pyc = jnp.clip(py, 0.0, h - 1.0)
    x1 = jnp.floor(pxc)
    y1 = jnp.floor(pyc)
    wx = jnp.stack(_cubic_w(pxc - x1), axis=-1)  # [N, 4]
    wy = jnp.stack(_cubic_w(pyc - y1), axis=-1)
    pad = jnp.pad(img, ((0, 0), (1, 2), (1, 2)), mode="edge")
    # [3, H, W, 16] -> items-major [H*W, 48]: tap (j, i) at slot 4j+i
    wins = jnp.stack(
        [pad[:, j:j + h, i:i + w] for j in range(4) for i in range(4)], -1
    )
    idx = y1.astype(jnp.int32) * w + x1.astype(jnp.int32)
    wgt = (wy[:, :, None] * wx[:, None, :]).reshape(n, 16)
    if band is not None:
        # banded [48, H*W] row gather (the large-res gather-cliff path);
        # the destination grid is assumed to match the source grid
        from ..core.gatherband import take_rows

        table_r = wins.transpose(0, 3, 1, 2).reshape(48, h * w)
        g, ok = take_rows(
            table_r, idx, width=w, height=h, band_rows=band[0],
            halo_rows=band[1],
        )
        out = jnp.einsum("ckn,nk->cn", g.reshape(3, 16, n), wgt)
        return out, ok
    # rows-major [48, H*W] gather: measured ~25% faster than the
    # items-major [H*W, 48] form (the gather cost is per index either way)
    table_r = wins.transpose(0, 3, 1, 2).reshape(48, h * w)
    g = jnp.take(table_r, idx, axis=1)
    return jnp.einsum("ckn,nk->cn", g.reshape(3, 16, n), wgt)


def _depth_dilated_motion(motion, depth, valid):
    """Adopt each pixel's 3x3 closest-depth neighbor's *motion vector*
    (TAA.hlsl depth dilation). motion: [2, H, W] reprojection offsets.

    Dilating the motion (not the position) is essential: positions vary
    across a surface, so adopting a neighbor's position shifts the whole
    image by a texel; motion is locally constant on rigid surfaces and only
    switches at depth edges -- exactly the foreground-silhouette case
    dilation exists for.
    """
    h, w = depth.shape
    pd = jnp.pad(jnp.where(valid, depth, 3.0e38), ((1, 1), (1, 1)),
                 mode="edge")
    pm = jnp.pad(motion, ((0, 0), (1, 1), (1, 1)), mode="edge")
    best_d = jnp.where(valid, depth, 3.0e38)
    best_m = motion
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            nd = pd[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
            nm = pm[:, 1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
            closer = nd < best_d
            best_d = jnp.where(closer, nd, best_d)
            best_m = jnp.where(closer[None], nm, best_m)
    return best_m


def taa_resolve_p(
    curr, history, world_pos, valid, prev_cam, cfg: TAAConfig = TAAConfig(),
    height_full=None, hist_row0=0, hist_rows=None, curr_ext=None, depth=None,
    row0=0, band=None,
):
    """One TAA step, planar.

    curr: [3, H, W] this frame's color; history: [3, Hh, W] previous output;
    world_pos: [3, H, W] G-buffer positions (for reprojection; pass the
    *previous-frame* positions for animated geometry); valid: [H, W] hit
    mask; prev_cam: previous frame's Camera; depth: optional [H, W] linear
    depth enabling depth-dilated motion. Returns the new resolved color
    (also the next history).

    Sharding hooks (parallel.mesh): ``height_full`` = full image height when
    curr is a row shard; ``history`` is then the halo-extended history with
    first row at global row ``hist_row0`` and ``hist_rows`` rows;
    ``curr_ext`` = 1-row halo-extended curr for the neighborhood clamp.
    Depth dilation uses local rolls (1-row approximation at band edges).
    """
    _, h, w = curr.shape
    hf = height_full if height_full is not None else h
    px, py, zfwd = prev_cam.project(world_pos.reshape(3, -1).T, w, hf)
    if cfg.depth_dilate and depth is not None:
        # dilate the reprojection *offset* by the closest-depth neighbor
        # (``row0``: global row of curr's first row under sharding)
        xg = jnp.tile(jnp.arange(w, dtype=jnp.float32), h)
        yg = jnp.repeat(jnp.arange(h, dtype=jnp.float32) + row0, w)
        m = jnp.stack([(px - xg).reshape(h, w), (py - yg).reshape(h, w)], 0)
        m = _depth_dilated_motion(m, depth, valid)
        px = xg + m[0].reshape(-1)
        py = yg + m[1].reshape(-1)
    inside = (
        (px >= -0.5) & (px <= w - 0.5) & (py >= -0.5) & (py <= hf - 0.5)
        & (zfwd > 0)
    )
    hr = hist_rows if hist_rows is not None else hf
    ey_f = py - hist_row0
    iy = jnp.clip(jnp.round(ey_f).astype(jnp.int32), 0, hr - 1)
    ix = jnp.clip(jnp.round(px).astype(jnp.int32), 0, w - 1)
    inside = inside & (jnp.round(ey_f) >= 0) & (jnp.round(ey_f) <= hr - 1)
    if cfg.catmull_rom:
        if band is not None:
            hist, okb = catmull_rom_p(
                history, px, jnp.clip(ey_f, 0.0, hr - 1.0), band=band
            )
            inside = inside & okb
        else:
            hist = catmull_rom_p(history, px, jnp.clip(ey_f, 0.0, hr - 1.0))
        hist = hist.reshape(3, h, w)
    else:
        if band is not None:
            from ..core.gatherband import take_rows

            hist, okb = take_rows(
                history.reshape(3, -1), iy * w + ix, width=w, height=h,
                band_rows=band[0], halo_rows=band[1],
            )
            inside = inside & okb
            hist = hist.reshape(3, h, w)
        else:
            hist = jnp.take(
                history.reshape(3, -1), iy * w + ix, axis=1
            ).reshape(3, h, w)
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
