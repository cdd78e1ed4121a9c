"""Display extras: Tony McMapface LUT tonemapper + picked Sobel outline
(reference: Display.h:105-107, Tonemap.hlsli:10-22, Display.cpp:358-398)."""

from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest

from zetaray_tpu.ops import post

LUT = Path("/root/reference/Assets/LUT/tony_mc_mapface.dds")


@pytest.fixture(scope="module")
def lut():
    if not LUT.exists():
        pytest.skip("LUT asset missing")
    return post.load_lut_3d(LUT)


def test_lut_decode(lut):
    assert lut.shape == (48, 48, 48, 3)
    assert np.isfinite(lut).all()
    assert lut.min() >= 0.0 and lut.max() <= 1.5
    # black maps near black, white-ish corner maps near white
    assert lut[0, 0, 0].max() < 0.02
    assert lut[-1, -1, -1].min() > 0.9


def test_tony_tonemap_monotonic_gray(lut):
    xs = jnp.logspace(-3, 2, 64)  # 0.001 .. 100 linear radiance
    c = jnp.broadcast_to(xs[None, :], (3, 64))
    out = np.asarray(post.tonemap_tony_p(c, jnp.asarray(lut)))
    # gray in, gray-ish out, monotonically increasing luminance
    lum = out.mean(0)
    assert (np.diff(lum) > -1e-4).all()
    assert lum[0] < 0.02 and lum[-1] > 0.9
    # stays roughly achromatic on the neutral axis
    assert np.abs(out - lum[None, :]).max() < 0.12


def test_tony_registered():
    assert "tony" in post.TONEMAPPERS_P


def test_picked_outline():
    inst = jnp.zeros((16, 16)).at[4:9, 4:9].set(2.0)
    ldr = jnp.zeros((3, 16, 16))
    out = np.asarray(post.picked_outline_p(ldr, inst, 2))
    # outline pixels near the boundary get the overlay color
    assert out[0, 4, 4] > 0.5  # corner of the box is an edge
    assert out[0, 6, 6] == 0.0  # interior untouched
    assert out[0, 0, 0] == 0.0  # far away untouched
    # picking a different id leaves the image alone
    out2 = np.asarray(post.picked_outline_p(ldr, inst, 7))
    assert (out2 == 0).all()
