"""Temporal reuse under camera motion: reprojection validity + stability."""

import numpy as np
import jax
import pytest

from zetaray_tpu.scene import Camera
from zetaray_tpu.render import render_frame_restir, RenderConfig
from zetaray_tpu.ops.pathtracer import PTConfig


def _orbit_cam(i, deg_per_frame=3.0):
    import math

    ang = math.radians(deg_per_frame * i)
    eye0 = np.array([0.0, 1.0, 3.5])
    target = np.array([0.0, 1.0, 0.0])
    rel = eye0 - target
    rot = np.array(
        [[math.cos(ang), 0, math.sin(ang)], [0, 1, 0],
         [-math.sin(ang), 0, math.cos(ang)]]
    )
    return Camera.look_at(tuple(target + rot @ rel), tuple(target),
                          vfov_deg=45, aspect=1.0)


def test_moving_camera_temporal_chain(cornell_dev):
    """Orbiting camera: reprojection keeps reuse valid (M grows above the
    no-reuse floor), image stays finite and close to the static estimate."""
    cfg = RenderConfig(width=24, height=24, mode="restir_di",
                       pt=PTConfig(max_bounces=1),
                       taa=True)
    state = None
    means, m_vals = [], []
    for i in range(5):
        out, state = render_frame_restir(
            cornell_dev, _orbit_cam(i), jax.random.PRNGKey(i), cfg, state
        )
        h = np.asarray(out["hdr"])
        assert np.isfinite(h).all() and (h >= 0).all(), i
        means.append(h.mean())
        m_vals.append(float(np.asarray(state.reservoirs[10]).mean()))
    # temporal reuse survives motion: average M exceeds the single-frame
    # M0=16 noticeably by frame 4 (some pixels fail reprojection, fine)
    assert m_vals[-1] > 20.0, m_vals
    # exposure-stable: frame means don't drift wildly during the orbit
    assert max(means) / max(min(means), 1e-6) < 1.5, means


def test_camera_projection_roundtrip(cornell_dev):
    """project() inverts generate_rays for points along each pixel ray."""
    cam = _orbit_cam(2)
    w = h = 16
    o, d = cam.generate_rays(w, h)
    t = 2.0
    p = np.asarray(o) + t * np.asarray(d)
    px, py, depth = cam.project(p, w, h)
    px, py = np.asarray(px), np.asarray(py)
    xs = np.tile(np.arange(w), h)
    ys = np.repeat(np.arange(h), w)
    np.testing.assert_allclose(px, xs, atol=5e-3)
    np.testing.assert_allclose(py, ys, atol=5e-3)
    assert (np.asarray(depth) > 0).all()
