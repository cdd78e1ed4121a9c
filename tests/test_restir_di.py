"""ReSTIR DI tests (CPU; kernels in interpret mode via the frame path)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zetaray_tpu.scene import Camera
from zetaray_tpu.render import render_frame_restir, render_frame, RenderConfig
from zetaray_tpu.ops.pathtracer import PTConfig
from zetaray_tpu.ops.restir_di import ReSTIRConfig


@pytest.fixture(scope="module")
def setup(cornell_dev):
    cam = Camera.look_at((0, 1.0, 3.5), (0, 1.0, 0.0), vfov_deg=45, aspect=1.0)
    cfg = RenderConfig(
        width=24, height=24, mode="restir_di",
        pt=PTConfig(max_bounces=2),
        restir=ReSTIRConfig(num_candidates=8, spatial_radius=4),
    )
    return cornell_dev, cam, cfg


def test_temporal_accumulation_and_no_nan(setup):
    scene, cam, cfg = setup
    state = None
    ms = []
    for i in range(3):
        out, state = render_frame_restir(scene, cam, jax.random.PRNGKey(i), cfg, state)
        h = np.asarray(out["hdr"])
        assert np.isfinite(h).all() and (h >= 0).all()
        ms.append(float(np.asarray(state.reservoirs[10]).mean()))
    # temporal M grows across frames (reuse happening)
    assert ms[1] > ms[0] and ms[2] > ms[1]


def test_matches_pt_mean(setup):
    """ReSTIR DI + PT indirect should estimate the same image as plain PT."""
    scene, cam, cfg = setup
    state = None
    acc = 0.0
    n = 6
    for i in range(n):
        out, state = render_frame_restir(scene, cam, jax.random.PRNGKey(i), cfg, state)
        acc += np.asarray(out["hdr"]).mean()
    restir_mean = acc / n
    cfg_pt = RenderConfig(width=24, height=24, pt=PTConfig(max_bounces=2))
    ref = np.mean(
        [
            np.asarray(render_frame(scene, cam, jax.random.PRNGKey(50 + i), cfg_pt)["hdr"])
            for i in range(12)
        ]
    )
    assert abs(restir_mean - ref) / ref < 0.15, (restir_mean, ref)


def test_direct_only_darker_than_full(setup):
    scene, cam, cfg = setup
    from dataclasses import replace

    out_d, _ = render_frame_restir(
        scene, cam, jax.random.PRNGKey(0), replace(cfg, indirect=False), None
    )
    out_f, _ = render_frame_restir(scene, cam, jax.random.PRNGKey(0), cfg, None)
    assert np.asarray(out_d["hdr"]).mean() < np.asarray(out_f["hdr"]).mean()


def test_skip_direct_partition(cornell_dev):
    """direct(skip_direct PT complement) + indirect ~ full PT in expectation."""
    from zetaray_tpu.ops.pathtracer import trace_reference

    cam = Camera.look_at((0, 1.0, 3.5), (0, 1.0, 0.0), vfov_deg=45, aspect=1.0)
    o, d = cam.generate_rays(20, 20)
    cfg_full = PTConfig(max_bounces=2, rr_start=99)
    cfg_ind = PTConfig(
        max_bounces=2, rr_start=99, min_emissive_bounce=2, min_nee_bounce=1
    )
    n = 24
    full = np.mean(
        [np.asarray(trace_reference(cornell_dev, o, d, jax.random.PRNGKey(i), cfg_full)) for i in range(n)]
    )
    ind = np.mean(
        [np.asarray(trace_reference(cornell_dev, o, d, jax.random.PRNGKey(i), cfg_ind)) for i in range(n)]
    )
    assert ind < full
    # indirect share of a bright closed box is substantial but minor
    assert 0.05 < ind / full < 0.7
