"""Bit-exact packed formats (jnp, device-friendly).

Counterparts of the reference's packed GPU formats: octahedral-encoded normals
(Math/Octahedral, Vertex.h), RGB8-in-uint32 factors (Material.h), and half
floats. Kept bit-exact via uint32 views so reservoir/G-buffer encodings can be
matched across kernels (SURVEY.md section 7 "hard parts" #4).

All functions operate on jnp arrays and broadcast over leading dims.
"""

from __future__ import annotations

import jax.numpy as jnp


def oct_encode(n: jnp.ndarray) -> jnp.ndarray:
    """Unit vector [..., 3] -> octahedral [..., 2] in [-1, 1]."""
    l1 = jnp.sum(jnp.abs(n), axis=-1, keepdims=True)
    v = n[..., :2] / l1
    neg_z = n[..., 2:3] < 0.0
    flipped = (1.0 - jnp.abs(v[..., ::-1])) * jnp.where(v >= 0.0, 1.0, -1.0)
    return jnp.where(neg_z, flipped, v)


def oct_decode(e: jnp.ndarray) -> jnp.ndarray:
    """Octahedral [..., 2] -> unit vector [..., 3]."""
    x, y = e[..., 0], e[..., 1]
    z = 1.0 - jnp.abs(x) - jnp.abs(y)
    t = jnp.maximum(-z, 0.0)
    x = x + jnp.where(x >= 0.0, -t, t)
    y = y + jnp.where(y >= 0.0, -t, t)
    v = jnp.stack([x, y, z], axis=-1)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def oct_encode_u16x2(n: jnp.ndarray) -> jnp.ndarray:
    """Unit vector -> one uint32 (two snorm16 octahedral components)."""
    e = oct_encode(n)
    q = jnp.round(jnp.clip(e, -1.0, 1.0) * 32767.0).astype(jnp.int32)
    qx = (q[..., 0] & 0xFFFF).astype(jnp.uint32)
    qy = (q[..., 1] & 0xFFFF).astype(jnp.uint32)
    return qx | (qy << 16)


def oct_decode_u16x2(p: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`oct_encode_u16x2`."""
    qx = (p & jnp.uint32(0xFFFF)).astype(jnp.int32)
    qy = ((p >> 16) & jnp.uint32(0xFFFF)).astype(jnp.int32)
    # sign-extend 16-bit
    qx = jnp.where(qx >= 32768, qx - 65536, qx)
    qy = jnp.where(qy >= 32768, qy - 65536, qy)
    e = jnp.stack([qx, qy], axis=-1).astype(jnp.float32) / 32767.0
    return oct_decode(e)


def pack_rgb8(c: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] in [0,1] -> uint32 0x00BBGGRR (reference Material.h layout)."""
    q = jnp.round(jnp.clip(c, 0.0, 1.0) * 255.0).astype(jnp.uint32)
    return q[..., 0] | (q[..., 1] << 8) | (q[..., 2] << 16)


def unpack_rgb8(p: jnp.ndarray) -> jnp.ndarray:
    """uint32 -> [..., 3] float in [0,1]."""
    r = (p & jnp.uint32(0xFF)).astype(jnp.float32)
    g = ((p >> 8) & jnp.uint32(0xFF)).astype(jnp.float32)
    b = ((p >> 16) & jnp.uint32(0xFF)).astype(jnp.float32)
    return jnp.stack([r, g, b], axis=-1) / 255.0


def pack_f16x2(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Two float arrays -> one uint32 (two IEEE halfs)."""
    ha = jax_f16_bits(a)
    hb = jax_f16_bits(b)
    return ha | (hb << 16)


def unpack_f16x2(p: jnp.ndarray):
    a = f16_bits_to_f32((p & jnp.uint32(0xFFFF)).astype(jnp.uint16))
    b = f16_bits_to_f32(((p >> 16) & jnp.uint32(0xFFFF)).astype(jnp.uint16))
    return a, b


def jax_f16_bits(x: jnp.ndarray) -> jnp.ndarray:
    return jax_bitcast_u16(x.astype(jnp.float16)).astype(jnp.uint32)


def f16_bits_to_f32(bits16: jnp.ndarray) -> jnp.ndarray:
    import jax

    return jax.lax.bitcast_convert_type(bits16, jnp.float16).astype(jnp.float32)


def jax_bitcast_u16(h: jnp.ndarray) -> jnp.ndarray:
    import jax

    return jax.lax.bitcast_convert_type(h, jnp.uint16)


def luminance(c: jnp.ndarray) -> jnp.ndarray:
    """Rec.709 luminance of linear RGB [..., 3]."""
    return (
        0.2126 * c[..., 0] + 0.7152 * c[..., 1] + 0.0722 * c[..., 2]
    )
