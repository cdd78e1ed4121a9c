"""Banded-gather frame equals the plain frame when motion fits the halo."""

import numpy as np
import jax

from zetaray_tpu.render import render_frame_restir, RenderConfig
from zetaray_tpu.render.frame import FrameState
from zetaray_tpu.ops.pathtracer import PTConfig
from zetaray_tpu.scene import Camera


def _cam():
    return Camera.look_at((0, 1.0, 3.5), (0, 1.0, 0.0), vfov_deg=45, aspect=1.0)


def _run(cornell_dev, cfg, frames=3):
    state = None
    outs = []
    for i in range(frames):
        out, state = render_frame_restir(
            cornell_dev, _cam(), jax.random.PRNGKey(i), cfg, state
        )
        outs.append(np.asarray(out["hdr"]))
    return outs, state


def test_banded_matches_plain_static_camera(cornell_dev):
    """Static camera: every reuse index lands in its own band+halo window,
    so the banded frame matches the plain one (up to the banded TAA
    resample's float reduction order, ~1e-7)."""
    base = dict(width=32, height=32, mode="restir_gi",
                pt=PTConfig(max_bounces=1), taa=True)
    plain, _ = _run(cornell_dev, RenderConfig(**base, band_rows=0))
    banded, _ = _run(cornell_dev, RenderConfig(**base, band_rows=8,
                                               band_halo=8))
    for a, b in zip(plain, banded):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_banded_restir_di_mode(cornell_dev):
    cfg = RenderConfig(width=32, height=32, mode="restir_di",
                       pt=PTConfig(max_bounces=1), band_rows=8, band_halo=8)
    outs, state = _run(cornell_dev, cfg, frames=2)
    for h in outs:
        assert np.isfinite(h).all() and (h >= 0).all()
    assert float(np.asarray(state.reservoirs[10]).mean()) > 0.0
