"""ReSTIR GI tests (CPU)."""

import numpy as np
import jax
import pytest

from zetaray_tpu.scene import Camera
from zetaray_tpu.render import render_frame_restir, render_frame, RenderConfig
from zetaray_tpu.ops.pathtracer import PTConfig


@pytest.fixture(scope="module")
def setup(cornell_dev):
    cam = Camera.look_at((0, 1.0, 3.5), (0, 1.0, 0.0), vfov_deg=45, aspect=1.0)
    cfg = RenderConfig(width=20, height=20, mode="restir_gi", pt=PTConfig(max_bounces=2))
    return cornell_dev, cam, cfg


def test_gi_frames_finite_and_accumulate(setup):
    scene, cam, cfg = setup
    state = None
    for i in range(3):
        out, state = render_frame_restir(scene, cam, jax.random.PRNGKey(i), cfg, state)
        h = np.asarray(out["hdr"])
        assert np.isfinite(h).all() and (h >= 0).all()
    assert float(np.asarray(state.gi_reservoirs[10]).mean()) > 1.0


def test_gi_matches_pt_mean(setup):
    scene, cam, cfg = setup
    state = None
    acc = 0.0
    n = 6
    for i in range(n):
        out, state = render_frame_restir(scene, cam, jax.random.PRNGKey(i), cfg, state)
        acc += np.asarray(out["hdr"]).mean()
    gi_mean = acc / n
    ref = np.mean(
        [
            np.asarray(
                render_frame(
                    scene, cam, jax.random.PRNGKey(60 + i),
                    RenderConfig(width=20, height=20, pt=PTConfig(max_bounces=2)),
                )["hdr"]
            )
            for i in range(12)
        ]
    )
    assert abs(gi_mean - ref) / ref < 0.15, (gi_mean, ref)
