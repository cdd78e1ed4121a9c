"""Bit-packing round-trip tests (octahedral normals, RGB8, f16x2)."""

import numpy as np
import jax.numpy as jnp

from zetaray_tpu.core import packing as P


def _unit(rng, n):
    v = rng.normal(size=(n, 3))
    return (v / np.linalg.norm(v, axis=-1, keepdims=True)).astype(np.float32)


def test_oct_roundtrip(rng):
    n = _unit(rng, 2000)
    d = np.asarray(P.oct_decode(P.oct_encode(jnp.asarray(n))))
    np.testing.assert_allclose(d, n, atol=1e-5)


def test_oct_roundtrip_axes():
    axes = np.array(
        [[0, 0, 1], [0, 0, -1], [1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0]],
        np.float32,
    )
    d = np.asarray(P.oct_decode(P.oct_encode(jnp.asarray(axes))))
    np.testing.assert_allclose(d, axes, atol=1e-6)


def test_oct_u16x2_quantized(rng):
    n = _unit(rng, 500)
    p = P.oct_encode_u16x2(jnp.asarray(n))
    assert p.dtype == jnp.uint32
    d = np.asarray(P.oct_decode_u16x2(p))
    # snorm16 quantization: ~1e-4 angular error
    dots = np.clip(np.sum(d * n, axis=-1), -1, 1)
    assert np.degrees(np.arccos(dots)).max() < 0.05


def test_rgb8_roundtrip(rng):
    c = rng.random((300, 3)).astype(np.float32)
    p = P.pack_rgb8(jnp.asarray(c))
    d = np.asarray(P.unpack_rgb8(p))
    np.testing.assert_allclose(d, c, atol=0.5 / 255.0 + 1e-6)


def test_f16x2_roundtrip(rng):
    a = rng.random(200).astype(np.float32) * 100
    b = rng.random(200).astype(np.float32)
    p = P.pack_f16x2(jnp.asarray(a), jnp.asarray(b))
    da, db = P.unpack_f16x2(p)
    np.testing.assert_allclose(np.asarray(da), a.astype(np.float16), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(db), b.astype(np.float16), rtol=1e-3)


def test_luminance():
    assert abs(float(P.luminance(jnp.ones(3))) - 1.0) < 1e-6
