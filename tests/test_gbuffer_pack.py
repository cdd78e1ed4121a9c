"""Packed temporal G-buffer (ops.gbuffer_pack): the reference's packed
plane formats as actual pipeline state, not just a packing library."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _rand_gbuf(n=256, seed=3):
    from zetaray_tpu.accel.megakernel import G

    rng = np.random.default_rng(seed)
    gb = np.zeros((G.ROWS, n), np.float32)
    ns = rng.normal(size=(n, 3))
    ns /= np.linalg.norm(ns, axis=-1, keepdims=True)
    gb[G.NS : G.NS + 3] = ns.T
    gb[G.DEPTH] = rng.uniform(0.5, 10.0, n)
    gb[G.VALID] = (rng.uniform(size=n) > 0.2).astype(np.float32)
    gb[G.INST] = rng.integers(-1, 12, n)
    return jnp.asarray(gb)


def test_pack_roundtrip_quantization():
    from zetaray_tpu.ops.gbuffer_pack import (
        TG, depth_valid, pack_temporal, unpack_normal,
    )
    from zetaray_tpu.accel.megakernel import G

    gb = _rand_gbuf()
    tg = pack_temporal(gb)
    assert tg.shape[0] == TG.ROWS
    nx, ny, nz = unpack_normal(tg)
    n_dec = np.stack([np.asarray(nx), np.asarray(ny), np.asarray(nz)], -1)
    n_ref = np.asarray(gb[G.NS : G.NS + 3]).T
    # oct16 snorm worst-case angular error is ~0.0001 rad; dot > 1 - 1e-6
    dots = (n_dec * n_ref).sum(-1)
    assert dots.min() > 1.0 - 5e-7, dots.min()
    # depth exact (R32F) where valid, 0 where invalid
    d, valid = depth_valid(tg)
    v_ref = np.asarray(gb[G.VALID]) > 0.5
    np.testing.assert_array_equal(np.asarray(valid), v_ref)
    np.testing.assert_array_equal(
        np.asarray(d)[v_ref], np.asarray(gb[G.DEPTH])[v_ref]
    )
    # instance ids pass through exactly
    np.testing.assert_array_equal(np.asarray(tg[TG.INST]), np.asarray(gb[G.INST]))


def test_pack_is_bit_stable():
    """Packing the same G-buffer twice gives bit-identical planes (the
    determinism the reference's packed formats provide)."""
    from zetaray_tpu.ops.gbuffer_pack import pack_temporal

    gb = _rand_gbuf(seed=11)
    a = np.asarray(jax.jit(pack_temporal)(gb)).view(np.uint32)
    b = np.asarray(jax.jit(pack_temporal)(gb)).view(np.uint32)
    np.testing.assert_array_equal(a, b)


def test_temporal_reuse_consumes_packed(cornell_dev):
    """DI temporal reuse over packed prev planes still accumulates M on a
    static camera (the end-to-end property the packing must preserve)."""
    from zetaray_tpu.accel.megakernel import build_light_sets, gbuffer
    from zetaray_tpu.ops import restir_di as RD
    from zetaray_tpu.ops.gbuffer_pack import pack_temporal
    from zetaray_tpu.scene import Camera

    cam = Camera.look_at((0, 1, 3.5), (0, 1, 0), vfov_deg=45, aspect=1.0)
    w = h = 32
    o, d = cam.generate_rays(w, h)
    gb = gbuffer(cornell_dev, o, d, interpret=True)
    lsets = build_light_sets(cornell_dev, jnp.uint32(5))
    cfg = RD.ReSTIRConfig()
    res = RD.initial_candidates(gb, lsets, 5, cfg, rt=256, interpret=True)
    m0 = np.asarray(res[10])
    res_t = RD.temporal_reuse(
        res, res, pack_temporal(gb), gb, cam, w, h, 6, cfg
    )
    m1 = np.asarray(res_t[10])
    valid = np.asarray(gb[15]) > 0.5  # G.VALID
    assert (m1[valid] > m0[valid]).mean() > 0.9
