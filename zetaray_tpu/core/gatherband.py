"""Banded row gathers: VMEM-resident windows for image-space reuse passes.

The ReSTIR temporal/spatial merges, TAA, and the GI reuse all fetch
previous/neighbor pixels with one flat `jnp.take` over a [R, H*W] SoA
table. On TPU that gather runs at ~7 ns/index while the source table is
VMEM-resident and ~23 ns/index once it spills (measured round 2, GAPS #1b):
a single-chip 1080p frame pays 941 ms because every reuse pass gathers from
a 132 MB reservoir table.

This module is the single-chip mitigation (VERDICT round 2, next #2): split
the *destination* image into row bands and gather each band's pixels only
from a [R, (band + 2*halo) * W] window of the source, carved with one
dynamic slice. The window stays VMEM-resident, so every gather runs in the
fast regime; indices that fall outside the window report a miss mask that
callers fold into their existing reuse-validity test (dropping reuse for
super-fast motion is unbiased -- M just stays lower). This mirrors on one
chip exactly what `parallel/halo.py` does across chips: the sharded frame
is the multi-chip instance of the same banding.

Reference correspondence: the reference never needs this (DXR texture
fetches are hardware-cached, DirectLighting.h:106-116 reservoir textures);
it is TPU memory-hierarchy design per SURVEY.md section 2.6.6.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pick_band_rows(height: int, width: int, rows: int,
                   band_px: int = 160_000) -> int:
    """Band height for the windowed gather: the largest divisor of
    ``height`` with band*width <= band_px pixels, capped at 128 rows.

    Round-4 on-chip sweep (flagship ReSTIR GI frame): banding wins at EVERY
    resolution, not just past the VMEM ceiling -- 512^2: 34.7 ms plain ->
    29.7 ms at band=128; 256^2: 9.0 -> 7.1 at 128; 1080p: 265 (old
    band=120) -> 254.6 at band=72. Non-divisor bands are pathological
    (1080p at band=128: 495 ms), hence the divisor constraint. The old
    heuristic returned 0 (no banding) whenever the table fit a 48 MB VMEM
    budget, which left ~5 ms on the table at 512^2.

    Heights with no divisor in [8, cap] (e.g. prime heights) return 0 and
    `take_rows` falls back to the plain full-table take -- correct, just
    unbanded. All supported render resolutions (powers of two, 1080/1088)
    have rich divisor sets, so this path is a correctness fallback only."""
    cap = min(128, max(8, band_px // max(width, 1)))
    for band in range(cap, 7, -1):
        if height % band == 0:
            return band
    return 0


def take_rows_banded(src, idx, *, width: int, height: int, band_rows: int,
                     halo_rows: int, src_row0: int = 0):
    """Banded `jnp.take(src, idx, axis=1)` with a window-miss mask.

    src: [R, S*width] source table whose first row is global image row
    ``src_row0`` (S = src.shape[1] // width rows).
    idx: [height*width] flat *source-relative* indices (same convention as
    the plain take: already offset by -src_row0 where callers do that).
    Returns (vals [R, height*width], ok [height*width]) where ``ok`` is
    False for indices outside the destination band's source window --
    callers AND it into their reuse-validity mask.
    """
    r = src.shape[0]
    s_rows = src.shape[1] // width
    n_bands = height // band_rows
    assert n_bands * band_rows == height, (height, band_rows)
    src3 = src.reshape(r, s_rows, width)
    idx_b = idx.reshape(n_bands, band_rows * width)
    win_rows = band_rows + 2 * halo_rows

    def one(args):
        b, idx_local = args
        # window start in *source* rows (idx is source-relative; the global
        # image row of destination band b starts at b*band_rows, which sits
        # at source row b*band_rows - src_row0), clamped to keep the static
        # slice in range
        w0 = jnp.clip(b * band_rows - halo_rows - src_row0, 0,
                      max(s_rows - win_rows, 0))
        win = jax.lax.dynamic_slice(
            src3, (0, w0, 0), (r, min(win_rows, s_rows), width)
        ).reshape(r, -1)
        rel = idx_local - w0 * width
        ok = (rel >= 0) & (rel < win.shape[1]) & (idx_local >= 0) & (
            idx_local < s_rows * width
        )
        vals = jnp.take(win, jnp.clip(rel, 0, win.shape[1] - 1), axis=1)
        zero = jnp.zeros((), vals.dtype)  # typed: sources may be uint32
        return jnp.where(ok[None, :], vals, zero), ok

    bs = jnp.arange(n_bands, dtype=jnp.int32)
    vals, ok = jax.lax.map(one, (bs, idx_b))
    return (
        vals.transpose(1, 0, 2).reshape(r, height * width),
        ok.reshape(height * width),
    )


def take_rows(src, idx, *, width: int, height: int, band_rows: int = 0,
              halo_rows: int = 64, src_row0: int = 0):
    """Dispatch: plain `jnp.take` when banding is off, else banded windows.

    Returns (vals, ok). Plain mode reports all-True (the caller's own
    range tests already cover source bounds).
    """
    if band_rows <= 0 or height % band_rows != 0:
        return jnp.take(src, idx, axis=1), jnp.ones(idx.shape, bool)
    return take_rows_banded(
        src, idx, width=width, height=height, band_rows=band_rows,
        halo_rows=halo_rows, src_row0=src_row0,
    )
