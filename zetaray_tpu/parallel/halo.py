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


def halo_exchange_rows(x, halo: int, axis: str, n: int):
    """x: [h_loc, ...] (leading dim = image rows) -> [h_loc + 2*halo, ...].

    Supports halo > h_loc via multiple ring hops (whole-shard blocks).
    """
    h_loc = x.shape[0]
    if n == 1:
        return jnp.concatenate([x[-halo:], x, x[:halo]], axis=0)
    hops = -(-halo // h_loc)
    tops, bots = [], []
    for k in range(1, hops + 1):
        if k == hops and halo <= h_loc:
            up_src, dn_src = x[h_loc - halo :], x[:halo]
        else:
            up_src = dn_src = x
        tops.insert(0, lax.ppermute(up_src, axis, _ring(n, +k)))
        bots.append(lax.ppermute(dn_src, axis, _ring(n, -k)))
    top = jnp.concatenate(tops, axis=0)[-halo:] if hops > 1 else tops[0]
    bot = jnp.concatenate(bots, axis=0)[:halo] if hops > 1 else bots[0]
    return jnp.concatenate([top, x, bot], axis=0)


def halo_exchange_flat(arr, width: int, halo: int, axis: str, n: int):
    """SoA rows [R, h_loc*width] -> [R, (h_loc + 2*halo)*width]."""
    rows = arr.shape[0]
    h_loc = arr.shape[1] // width
    x = arr.reshape(rows, h_loc, width).transpose(1, 0, 2)
    ext = halo_exchange_rows(x, halo, axis, n)
    return ext.transpose(1, 0, 2).reshape(rows, (h_loc + 2 * halo) * width)
