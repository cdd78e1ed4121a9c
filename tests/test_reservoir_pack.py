"""Packed reservoir encodings (ops.reservoir_pack) round-trip."""

import numpy as np
import jax.numpy as jnp

from zetaray_tpu.ops.reservoir_pack import (
    DI_PACKED_ROWS, PT_PACKED_ROWS, pack_di, pack_pt, unpack_di, unpack_pt,
)
from zetaray_tpu.ops.restir_pt import PR


def _unit(v):
    return v / np.linalg.norm(v, axis=0, keepdims=True)


def test_di_roundtrip():
    rng = np.random.default_rng(0)
    n = 257
    res = np.zeros((16, n), np.float32)
    res[0:3] = rng.uniform(-5, 5, (3, n))  # pos
    res[3:6] = _unit(rng.standard_normal((3, n)))  # ng
    res[6:9] = rng.uniform(0, 40, (3, n))  # le
    res[9] = rng.uniform(0, 10, n)  # w_sum (not packed)
    res[10] = rng.integers(0, 3000, n)  # M
    res[11] = rng.uniform(0, 2.0, n)  # W
    res[12] = (rng.uniform(0, 1, n) > 0.5).astype(np.float32)
    res[13] = rng.uniform(0, 50.0, n)  # phat (pairwise reads it)

    p = pack_di(jnp.asarray(res))
    assert p.shape == (DI_PACKED_ROWS, n) and p.dtype == jnp.uint32
    out = np.asarray(unpack_di(p))

    np.testing.assert_array_equal(out[0:3], res[0:3])  # pos exact (f32)
    np.testing.assert_array_equal(out[11], res[11])  # W exact (f32)
    np.testing.assert_array_equal(out[10], res[10])  # M exact (u16)
    np.testing.assert_array_equal(out[12], res[12])  # flag exact
    # oct16 normals ~1e-4, half radiance ~0.1%
    assert np.abs(out[3:6] - res[3:6]).max() < 2e-4
    assert np.abs(out[6:9] - res[6:9]).max() / 40.0 < 2e-3
    assert np.abs(out[13] - res[13]).max() / 50.0 < 2e-3  # phat half
    assert (out[9] == 0).all()


def test_pt_roundtrip():
    rng = np.random.default_rng(1)
    n = 130
    res = np.zeros((PR.ROWS, n), np.float32)
    res[PR.X:PR.X + 3] = rng.uniform(-5, 5, (3, n))
    res[PR.N:PR.N + 3] = _unit(rng.standard_normal((3, n)))
    res[PR.LE:PR.LE + 3] = rng.uniform(0, 30, (3, n))
    res[PR.WS:PR.WS + 3] = _unit(rng.standard_normal((3, n)))
    res[PR.LS:PR.LS + 3] = rng.uniform(0, 100, (3, n))
    res[PR.BASE:PR.BASE + 3] = rng.uniform(0, 1, (3, n))
    res[PR.METAL] = rng.uniform(0, 1, n)
    res[PR.ROUGH] = rng.uniform(0, 1, n)
    res[PR.M] = rng.integers(0, 100, n)
    res[PR.W] = rng.uniform(0, 3, n)
    res[PR.DIST] = rng.uniform(0.01, 50, n)
    # replay state: identity rows must round-trip EXACTLY
    res[PR.SRCPIX] = rng.integers(0, 1 << 24, n)
    seeds = rng.integers(0, 2**32, n, dtype=np.uint32)
    res[PR.SRCSEED] = seeds.view(np.float32)
    res[PR.PDFA] = rng.uniform(0, 10, n)
    res[PR.HAS3] = (rng.uniform(0, 1, n) > 0.3).astype(np.float32)
    res[PR.X3:PR.X3 + 3] = rng.uniform(-5, 5, (3, n))
    res[PR.N3:PR.N3 + 3] = _unit(rng.standard_normal((3, n)))
    res[PR.LE3:PR.LE3 + 3] = rng.uniform(0, 20, (3, n))
    res[PR.B3:PR.B3 + 3] = rng.uniform(0, 1, (3, n))
    res[PR.M3] = rng.uniform(0, 1, n)
    res[PR.R3] = rng.uniform(0, 1, n)
    res[PR.WS3:PR.WS3 + 3] = _unit(rng.standard_normal((3, n)))
    res[PR.LS3:PR.LS3 + 3] = rng.uniform(0, 50, (3, n))
    res[PR.PDFS3] = rng.uniform(0, 5, n)

    p = pack_pt(jnp.asarray(res))
    assert p.shape == (PT_PACKED_ROWS, n) and p.dtype == jnp.uint32
    out = np.asarray(unpack_pt(p))

    np.testing.assert_array_equal(out[PR.X:PR.X + 3], res[PR.X:PR.X + 3])
    np.testing.assert_array_equal(out[PR.W], res[PR.W])
    np.testing.assert_array_equal(out[PR.M], res[PR.M])
    np.testing.assert_array_equal(out[PR.SRCPIX], res[PR.SRCPIX])
    np.testing.assert_array_equal(
        np.asarray(out[PR.SRCSEED], np.float32).view(np.uint32), seeds
    )
    np.testing.assert_array_equal(out[PR.PDFA], res[PR.PDFA])
    np.testing.assert_array_equal(out[PR.HAS3], res[PR.HAS3])
    np.testing.assert_array_equal(out[PR.X3:PR.X3 + 3], res[PR.X3:PR.X3 + 3])
    np.testing.assert_array_equal(out[PR.PDFS3], res[PR.PDFS3])
    assert np.abs(out[PR.N3:PR.N3 + 3] - res[PR.N3:PR.N3 + 3]).max() < 2e-4
    assert np.abs(out[PR.WS3:PR.WS3 + 3] - res[PR.WS3:PR.WS3 + 3]).max() < 2e-4
    assert np.abs(out[PR.N:PR.N + 3] - res[PR.N:PR.N + 3]).max() < 2e-4
    assert np.abs(out[PR.WS:PR.WS + 3] - res[PR.WS:PR.WS + 3]).max() < 2e-4
    rel = np.abs(out[PR.LS:PR.LS + 3] - res[PR.LS:PR.LS + 3]) / 100.0
    assert rel.max() < 2e-3
    assert np.abs(out[PR.BASE:PR.BASE + 3] - res[PR.BASE:PR.BASE + 3]).max() < 1 / 255.0
    assert np.abs(out[PR.METAL] - res[PR.METAL]).max() < 1 / 255.0
    assert np.abs(out[PR.ROUGH] - res[PR.ROUGH]).max() < 1e-3
    rel_d = np.abs(out[PR.DIST] - res[PR.DIST]) / np.maximum(res[PR.DIST], 1e-3)
    assert rel_d.max() < 1e-3


def test_f16_overflow_clamped():
    res = np.zeros((16, 4), np.float32)
    res[3] = 1.0  # ng = +x
    res[6] = 1.0e6  # le.x beyond f16 range
    out = np.asarray(unpack_di(pack_di(jnp.asarray(res))))
    assert np.isfinite(out).all()
    assert out[6, 0] > 6.0e4
