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


def pcg4d(v: jnp.ndarray) -> jnp.ndarray:
    """pcg4d hash: [..., 4] uint32 -> [..., 4] uint32."""
    v = v.astype(_U32)
    v = v * _U32(1664525) + _U32(1013904223)
    x = v[..., 0] + v[..., 1] * v[..., 3]
    y = v[..., 1] + v[..., 2] * x
    z = v[..., 2] + x * y
    w = v[..., 3] + y * z
    x = x ^ (x >> 16)
    y = y ^ (y >> 16)
    z = z ^ (z >> 16)
    w = w ^ (w >> 16)
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    return jnp.stack([x, y, z, w], axis=-1)


def uniform4(pixel: jnp.ndarray, bounce, frame_seed, salt=0) -> jnp.ndarray:
    """4 uniforms in [0, 1) per pixel: [N] int32 pixel ids -> [N, 4] f32."""
    n = pixel.shape[0]
    v = jnp.stack(
        [
            pixel.astype(_U32),
            jnp.full((n,), bounce, _U32),
            jnp.full((n,), frame_seed, _U32) if jnp.ndim(frame_seed) == 0
            else frame_seed.astype(_U32),
            jnp.full((n,), salt, _U32),
        ],
        axis=-1,
    )
    bits = pcg4d(v)
    # top 24 bits -> [0, 1): exact in f32
    return (bits >> 8).astype(jnp.float32) * (1.0 / 16777216.0)


def seed_from_key(key) -> jnp.ndarray:
    """Derive a uint32 frame seed from a jax PRNG key (API compatibility)."""
    import jax

    data = jax.random.key_data(key).reshape(-1).astype(_U32)
    return data[0] ^ (data[-1] * _U32(2654435761))
