"""Packed vertex format (scene.packed): at-rest layout + pipeline property."""

import numpy as np
import jax.numpy as jnp


def _unit(n, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    return (v / np.linalg.norm(v, axis=-1, keepdims=True)).astype(np.float32)


def test_host_device_encoders_bit_identical():
    """numpy (scene.packed) and jnp (core.packing) oct16 encoders produce
    the SAME bits: one format across host import and device kernels."""
    from zetaray_tpu.core import packing as PK
    from zetaray_tpu.scene import packed as PKN

    n = _unit(4096)
    host = PKN.oct_encode_u16x2_np(n)
    dev = np.asarray(PK.oct_encode_u16x2(jnp.asarray(n)))
    np.testing.assert_array_equal(host, dev.astype(np.uint32))
    # decoders agree to 1 ulp (the normalize divide may round differently
    # between numpy and XLA; the FORMAT -- the bits -- is what's exact)
    host_d = PKN.oct_decode_u16x2_np(host)
    dev_d = np.asarray(PK.oct_decode_u16x2(jnp.asarray(host)))
    np.testing.assert_allclose(host_d, dev_d, rtol=3e-7, atol=3e-7)


def test_vertex_buffer_roundtrip():
    from zetaray_tpu.scene.packed import pack_vertex_buffer, unpack_vertex_buffer

    n = 513
    pos = np.random.default_rng(1).uniform(-10, 10, (n, 3)).astype(np.float32)
    nrm = _unit(n, 2)
    tan = _unit(n, 3)
    uv = np.random.default_rng(4).uniform(-2, 4, (n, 2)).astype(np.float32)
    buf = pack_vertex_buffer(pos, nrm, uv, tan)
    assert buf.itemsize == 3 * 4 + 4 + 4 + 4  # the reference's 24-byte Vertex
    p2, n2, uv2, t2 = unpack_vertex_buffer(buf)
    np.testing.assert_array_equal(p2, pos)  # positions stay f32
    assert (np.abs((n2 * nrm).sum(-1)) > 1.0 - 5e-7).all()  # oct16 error
    assert (np.abs((t2 * tan).sum(-1)) > 1.0 - 5e-7).all()
    # half precision: relative error <= 2^-11
    np.testing.assert_allclose(uv2, uv, rtol=6e-4, atol=6e-4)


def test_load_scene_shades_from_quantized(cornell_cpu):
    """load_scene's normals/uvs are exact fixed points of the quantizer --
    i.e. the pipeline really shades from the packed-format values."""
    from zetaray_tpu.scene.packed import quantize_normals, quantize_uvs

    for nrm in (cornell_cpu.n0, cornell_cpu.n1, cornell_cpu.n2):
        np.testing.assert_array_equal(quantize_normals(nrm), nrm)
    for uv in (cornell_cpu.uv0, cornell_cpu.uv1, cornell_cpu.uv2):
        np.testing.assert_array_equal(quantize_uvs(uv), uv)
    # and they are still (near-)unit normals
    lens = np.linalg.norm(cornell_cpu.n0, axis=-1)
    np.testing.assert_allclose(lens, 1.0, atol=1e-3)
