"""Row-halo exchange for pixel-tile sharding (ppermute over the ICI ring).

The multi-chip layout shards the image by rows (SURVEY.md section 2.6.6);
stencil passes (spatial ReSTIR reuse, a-trous, TAA, temporal reprojection)
read a bounded number of rows beyond the shard. Each exchange sends the
boundary rows to the ring neighbors with ``jax.lax.ppermute`` -- pure ICI
traffic, no all-gather (the reference has no analog: it is single-GPU; this
is the TPU-native scale axis).

The exchange is *circular* (shard 0's top halo is the last shard's bottom
rows), deliberately matching ``jnp.roll`` wraparound so a sharded stencil is
bit-identical to the unsharded image-space op. Gather-based consumers
(reprojection) mask out-of-extent rows themselves and never read the
wrapped rows at the true image boundary.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class ShardCtx(NamedTuple):
    """Static description of the pixel-row sharding, threaded through
    render_frame_restir (None = single device)."""

    axis: str  # mesh axis name
    n_shards: int
    h_local: int  # image rows per shard
    halo: int = 16  # max stencil reach covered by temporal-reuse halos


def _ring(n: int, shift: int):
    """ppermute pairs so each shard receives from shard (i - shift) % n."""
    return [(j, (j + shift) % n) for j in range(n)]


def _take(x, sl, row_axis):
    idx = [slice(None)] * x.ndim
    idx[row_axis] = sl
    return x[tuple(idx)]


def halo_exchange_rows(x, halo: int, axis: str, n: int, row_axis: int = 0):
    """Extend x by ``halo`` image rows on both sides along ``row_axis``
    (default 0; planar [3, H, W] images use row_axis=1).

    Supports halo > h_loc via multiple ring hops (whole-shard blocks).
    """
    h_loc = x.shape[row_axis]
    if n == 1:
        return jnp.concatenate(
            [_take(x, slice(h_loc - halo, None), row_axis), x,
             _take(x, slice(None, halo), row_axis)],
            axis=row_axis,
        )
    hops = -(-halo // h_loc)
    tops, bots = [], []
    for k in range(1, hops + 1):
        if k == hops and halo <= h_loc:
            up_src = _take(x, slice(h_loc - halo, None), row_axis)
            dn_src = _take(x, slice(None, halo), row_axis)
        else:
            up_src = dn_src = x
        tops.insert(0, lax.ppermute(up_src, axis, _ring(n, +k)))
        bots.append(lax.ppermute(dn_src, axis, _ring(n, -k)))
    if hops > 1:
        top = _take(jnp.concatenate(tops, axis=row_axis),
                    slice(-halo, None), row_axis)
        bot = _take(jnp.concatenate(bots, axis=row_axis),
                    slice(None, halo), row_axis)
    else:
        top, bot = tops[0], bots[0]
    return jnp.concatenate([top, x, bot], axis=row_axis)


def halo_exchange_flat(arr, width: int, halo: int, axis: str, n: int):
    """SoA rows [R, h_loc*width] -> [R, (h_loc + 2*halo)*width]."""
    rows = arr.shape[0]
    h_loc = arr.shape[1] // width
    x = arr.reshape(rows, h_loc, width).transpose(1, 0, 2)
    ext = halo_exchange_rows(x, halo, axis, n)
    return ext.transpose(1, 0, 2).reshape(rows, (h_loc + 2 * halo) * width)


def halo_exchange_rows_clamped(x, halo: int, axis: str, n: int,
                               row_axis: int = 0):
    """Like halo_exchange_rows, but the first/last shard's out-of-extent
    halo rows are EDGE-REPLICATED instead of wrapped.

    Use for consumers whose unsharded form clamps coordinates at the image
    boundary (bilinear/Catmull-Rom resamplers, RCAS's cross stencil): the
    circular exchange would hand them the opposite image edge there.
    Costs one tiny row-take on top of the exchange; identity for interior
    shards.
    """
    ext = halo_exchange_rows(x, halo, axis, n, row_axis)
    rows = ext.shape[row_axis]
    h_loc = x.shape[row_axis]
    i = lax.axis_index(axis) if n > 1 else 0
    idx = jnp.arange(rows)
    lo = jnp.where(jnp.equal(i, 0), halo, 0)
    hi = jnp.where(jnp.equal(i, n - 1), halo + h_loc - 1, rows - 1)
    src = jnp.clip(idx, lo, hi)
    return jnp.take(ext, src, axis=row_axis)
