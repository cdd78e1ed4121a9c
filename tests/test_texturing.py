"""Primary-visibility texturing integration test."""

import numpy as np
import jax
import jax.numpy as jnp

from zetaray_tpu.scene import Camera
from zetaray_tpu.scene.textures import apply_textures_to_gbuffer
from zetaray_tpu.accel.megakernel import gbuffer, G


def test_gbuffer_uv_and_texid(cornell_dev, cornell_cpu):
    cam = Camera.look_at((0, 1.0, 3.5), (0, 1.0, 0.0), vfov_deg=45, aspect=1.0)
    o, d = cam.generate_rays(16, 16)
    gb = gbuffer(cornell_dev, o, d, rt=256, interpret=True)
    assert gb.shape[0] == G.ROWS
    valid = np.asarray(gb[G.VALID]) > 0.5
    uv = np.asarray(gb[G.UV : G.UV + 2])
    assert np.isfinite(uv).all()
    # the 'ground' material (the huge plane) has base_color_tex = 0,
    # everything else -1
    texid = np.asarray(gb[G.TEXID])
    assert set(np.unique(texid[valid])) <= {-1.0, 0.0}


def test_apply_textures_modulates_base(cornell_dev):
    cam = Camera.look_at((0, 1.0, 3.5), (0, 1.0, 0.0), vfov_deg=45, aspect=1.0)
    o, d = cam.generate_rays(16, 16)
    gb = gbuffer(cornell_dev, o, d, rt=256, interpret=True)
    # fake texture 0: solid half-intensity red
    tex = jnp.zeros((8, 8, 4)).at[..., 0].set(0.5).at[..., 3].set(1.0)
    gb2 = apply_textures_to_gbuffer(gb, {0: tex})
    texid = np.asarray(gb[G.TEXID])
    base_before = np.asarray(gb[G.BASE : G.BASE + 3])
    base_after = np.asarray(gb2[G.BASE : G.BASE + 3])
    textured = texid == 0.0
    if textured.any():
        np.testing.assert_allclose(
            base_after[0][textured], base_before[0][textured] * 0.5, rtol=1e-5
        )
        np.testing.assert_allclose(base_after[1][textured], 0.0, atol=1e-6)
    # untextured pixels untouched
    np.testing.assert_array_equal(
        base_after[:, texid < 0], base_before[:, texid < 0]
    )
