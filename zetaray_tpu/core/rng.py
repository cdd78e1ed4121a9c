"""Counter-based hash RNG for rendering (pcg4d).

The reference uses PCG32 per-pixel streams seeded from (pixel, frame)
(Utility/RNG.h:33-90, Sampling.hlsli:12-74). On TPU, stateful per-lane PCG
streams serialize badly, and jax.random's threefry costs ~2.6 ms per
[262k, 4] draw. This module uses the pcg4d hash (Jarzynski & Olano, JCGT
2020) -- pure elementwise uint32 VPU work, ~20x cheaper, with the same
"seed by (pixel, bounce, frame) counter" structure as the reference, so
sample streams are decorrelated across pixels, bounces, and frames by
construction.
"""

from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32


def pcg4d_lanes(a, b, c, d):
    """pcg4d hash on four same-shaped uint32 arrays -> four uint32 arrays.

    SoA form: operating on four 1-D lanes keeps the ~20-op chain in the
    natural (N,) layout. The former [N, 4] stacked form made XLA compute
    the hash in [N, 1] column shapes when fused into its consumers --
    one of 128 lanes live on the VPU (see core/rows.py for the same
    pathology on row stacking).
    """
    a = a * _U32(1664525) + _U32(1013904223)
    b = b * _U32(1664525) + _U32(1013904223)
    c = c * _U32(1664525) + _U32(1013904223)
    d = d * _U32(1664525) + _U32(1013904223)
    x = a + b * d
    y = b + c * x
    z = c + x * y
    w = d + y * z
    x = x ^ (x >> 16)
    y = y ^ (y >> 16)
    z = z ^ (z >> 16)
    w = w ^ (w >> 16)
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    return x, y, z, w


def pcg4d(v: jnp.ndarray) -> jnp.ndarray:
    """pcg4d hash: [..., 4] uint32 -> [..., 4] uint32 (AoS adapter)."""
    v = v.astype(_U32)
    x, y, z, w = pcg4d_lanes(v[..., 0], v[..., 1], v[..., 2], v[..., 3])
    return jnp.stack([x, y, z, w], axis=-1)


def uniform4(pixel: jnp.ndarray, bounce, frame_seed, salt=0):
    """4 uniforms in [0, 1) per pixel: [N] int32 pixel ids -> 4x [N] f32.

    Returns a TUPLE of four (N,) arrays (not an [N, 4] matrix): tuple
    lanes stay in the efficient 1-D layout and avoid both the 32x
    lane-padded [N, 4] materialization and the column-shaped fusion of
    the hash chain. Bit-identical streams to the stacked form.
    """
    n = pixel.shape[0]
    x, y, z, w = pcg4d_lanes(
        pixel.astype(_U32),
        jnp.full((n,), bounce, _U32),
        jnp.full((n,), frame_seed, _U32) if jnp.ndim(frame_seed) == 0
        else frame_seed.astype(_U32),
        jnp.full((n,), salt, _U32),
    )
    # top 24 bits -> [0, 1): exact in f32
    to01 = lambda t: (t >> 8).astype(jnp.float32) * (1.0 / 16777216.0)
    return to01(x), to01(y), to01(z), to01(w)


def seed_from_key(key) -> jnp.ndarray:
    """Derive a uint32 frame seed from a jax PRNG key (API compatibility)."""
    import jax

    data = jax.random.key_data(key).reshape(-1).astype(_U32)
    return data[0] ^ (data[-1] * _U32(2654435761))
