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


def test_gi_lvg_matches_gi_mean(setup):
    """ReSTIR_GI_LVG (IndirectLighting.h:28): LVG-fed NEE at x2 must agree
    with the plain GI path in the mean (both unbiased estimators of the
    same integrand)."""
    from zetaray_tpu.ops.restir_gi import ReSTIRGIConfig
    from zetaray_tpu.ops.restir_di import ReSTIRConfig
    from dataclasses import replace

    scene, cam, cfg = setup
    cfg_lvg = replace(
        cfg,
        restir=ReSTIRConfig(lvg_samples=1),
        restir_gi=ReSTIRGIConfig(lvg=True),
    )
    n = 8

    def mean_of(c):
        state, acc = None, 0.0
        for i in range(n):
            out, state = render_frame_restir(
                scene, cam, jax.random.PRNGKey(i), c, state
            )
            acc += np.asarray(out["hdr"]).mean()
        return acc / n

    m_lvg = mean_of(cfg_lvg)
    m_gi = mean_of(replace(cfg, restir=ReSTIRConfig(lvg_samples=1)))
    assert np.isfinite(m_lvg) and m_lvg > 0
    assert abs(m_lvg - m_gi) / m_gi < 0.2, (m_lvg, m_gi)
