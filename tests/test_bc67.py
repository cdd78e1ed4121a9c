"""BC7 + BC6H decoder roundtrip tests: hand-encoded blocks vs expected
pixels (the spec's decode path exercised end-to-end via ctypes)."""

import numpy as np
import pytest

from zetaray_tpu.native import decode_bcn


class BitWriter:
    def __init__(self):
        self.bits = []

    def put(self, value, n):
        for i in range(n):
            self.bits.append((value >> i) & 1)

    def block(self):
        assert len(self.bits) <= 128, len(self.bits)
        bits = self.bits + [0] * (128 - len(self.bits))
        out = bytearray(16)
        for i, b in enumerate(bits):
            out[i >> 3] |= b << (i & 7)
        return bytes(out)


def _bc7_mode6_solid(rgba):
    """Encode a BC7 mode-6 block where both endpoints equal ``rgba``."""
    w = BitWriter()
    w.put(1 << 6, 7)  # mode 6: six 0 bits then a 1
    vals = [c >> 1 for c in rgba]  # 7-bit endpoints + p-bit = exact byte
    ps = [c & 1 for c in rgba]
    for c in range(4):
        w.put(vals[c], 7)  # endpoint 0
        w.put(vals[c], 7)  # endpoint 1
    assert ps[0] == ps[1] == ps[2] == ps[3], "pick bytes with equal low bit"
    w.put(ps[0], 1)  # p-bit endpoint 0
    w.put(ps[0], 1)  # p-bit endpoint 1
    w.put(0, 3)  # anchor index (3 bits)
    for _ in range(15):
        w.put(0, 4)
    return w.block()


def test_bc7_mode6_solid_color():
    color = (100, 200, 54, 254)  # all even low bits
    block = _bc7_mode6_solid(color)
    img = decode_bcn("BC7", block, 4, 4)
    assert img.shape == (4, 4, 4)
    np.testing.assert_array_equal(img.reshape(-1, 4), np.tile(color, (16, 1)))


def test_bc7_mode6_gradient_indices():
    """Endpoints 0 and 255: index k maps to weight table value."""
    w = BitWriter()
    w.put(1 << 6, 7)
    for _c in range(4):
        w.put(0, 7)
        w.put(127, 7)
    w.put(0, 1)  # p0 -> endpoint0 = 0
    w.put(1, 1)  # p1 -> endpoint1 = 255
    # anchor (pixel 0) = 0, then indices 1..15 = t % 16 pattern
    w.put(0, 3)
    idxs = list(range(1, 16))
    for i in idxs:
        w.put(i, 4)
    img = decode_bcn("BC7", w.block(), 4, 4).reshape(16, 4)
    weights = [0, 4, 9, 13, 17, 21, 26, 30, 34, 38, 43, 47, 51, 55, 60, 64]
    expect = [(0 * (64 - wt) + 255 * wt + 32) >> 6 for wt in weights]
    got = img[:, 0].tolist()
    assert got == expect, (got, expect)


def test_bc7_mode5_rotation():
    """Mode 5 with rotation 1 swaps R and A after interpolation."""
    w = BitWriter()
    w.put(1 << 5, 6)  # mode 5: five 0 bits then a 1
    w.put(1, 2)  # rotation = 1 (swap R <-> A)
    for _c in range(3):  # RGB endpoints, 7 bits each
        w.put(0x50 >> 1, 7)
        w.put(0x50 >> 1, 7)
    w.put(0xC6, 8)  # alpha endpoints, 8 bits
    w.put(0xC6, 8)
    w.put(0, 1)  # color anchor (2-bit indices -> 1 bit)
    for _ in range(15):
        w.put(0, 2)
    w.put(0, 1)  # alpha anchor
    for _ in range(15):
        w.put(0, 2)
    img = decode_bcn("BC7", w.block(), 4, 4).reshape(16, 4)
    # RGB endpoint 0x50 expands 7->8 as (v<<1)|(v>>6) = 0xA0... no: mode 5
    # has NO p-bits; expand8(0x28, 7) = (0x28<<1) | (0x28>>6) = 0x50
    r8 = ((0x50 >> 1) << 1) | ((0x50 >> 1) >> 6)
    # rotation swaps R and A
    assert (img[:, 0] == 0xC6).all(), img[0]
    assert (img[:, 3] == r8).all(), (img[0], r8)
    assert (img[:, 1] == r8).all() and (img[:, 2] == r8).all()


def _bc6h_mode11_solid(v10):
    """BC6H unsigned mode 11 (10:10:10, untransformed): both endpoints v10."""
    w = BitWriter()
    w.put(0x03, 5)  # mode bits
    for _ in range(2):  # endpoint A rgb, then endpoint B rgb
        pass
    for val in (v10, v10, v10, v10, v10, v10):  # RW GW BW RX GX BX
        w.put(val, 10)
    w.put(0, 3)  # anchor index (4-bit -> 3)
    for _ in range(15):
        w.put(0, 4)
    return w.block()


@pytest.mark.parametrize("v10", [0, 512, 1023])
def test_bc6h_mode11_solid(v10):
    img = decode_bcn("BC6H", _bc6h_mode11_solid(v10), 4, 4)
    assert img.dtype == np.float32
    # expected: unquantize to 16 bits, scale 31/64, bits -> half float
    if v10 == 0:
        unq = 0
    elif v10 == 1023:
        unq = 0xFFFF
    else:
        unq = ((v10 << 16) + 0x8000) >> 10
    half_bits = (unq * 31) >> 6
    expect = np.frombuffer(
        np.uint16(half_bits).tobytes(), np.float16
    )[0].astype(np.float32)
    np.testing.assert_allclose(img[..., :3], expect, rtol=1e-6)
    np.testing.assert_array_equal(img[..., 3], 1.0)


def test_bc6h_max_is_half_max():
    img = decode_bcn("BC6H", _bc6h_mode11_solid(1023), 4, 4)
    assert img[..., 0].max() == pytest.approx(65504.0)


def test_bc7_reserved_mode_black():
    img = decode_bcn("BC7", b"\x00" * 16, 4, 4)
    np.testing.assert_array_equal(img.reshape(-1, 4)[:, :3], 0)
    np.testing.assert_array_equal(img.reshape(-1, 4)[:, 3], 255)


def test_bc7_real_asset_checkerboard():
    """Real-asset round trip (GAPS: decoder was synthetic-only): the
    reference ships a BC7_UNORM_SRGB texture produced by its own
    BCnCompressglTF tool (Assets/CornellBox/compressed/checkerboard.dds);
    our native decoder must reproduce a plausible checkerboard."""
    from pathlib import Path

    asset = Path("/root/reference/Assets/CornellBox/compressed/checkerboard.dds")
    if not asset.exists():
        import pytest

        pytest.skip("reference asset missing")
    from zetaray_tpu.scene.textures import load_dds

    mips = load_dds(asset)
    img = mips[0]
    assert img.shape[0] == 1024 and img.shape[1] == 1024
    rgb = img[..., :3].astype(np.float32)
    # a checkerboard has a strongly bimodal luminance distribution
    lum = rgb.mean(-1)
    lo, hi = np.percentile(lum, 20), np.percentile(lum, 80)
    assert hi - lo > 0.2 * max(hi, 1e-6), (lo, hi)
    # both classes cover a substantial share of the image
    mid = 0.5 * (lo + hi)
    frac_dark = (lum < mid).mean()
    assert 0.2 < frac_dark < 0.8, frac_dark
    # mip chain decodes too and preserves the mean (box-filter property
    # of the compressor's mip generation, within BC7 quantization)
    assert len(mips) > 5
    m3 = mips[3][..., :3].astype(np.float32)
    assert abs(m3.mean() - rgb.mean()) < 0.1 * max(rgb.mean(), 1e-6)
