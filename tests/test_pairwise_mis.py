"""Pairwise-MIS spatial reuse (reference: PairwiseMIS.hlsli, Bitterli 2022).

The M-clamped combine is biased at geometric discontinuities; pairwise MIS
is unbiased: its many-frame mean must match the no-spatial-reuse estimator.
"""

import numpy as np
import jax
import pytest

from zetaray_tpu.ops.pathtracer import PTConfig
from zetaray_tpu.ops.restir_di import ReSTIRConfig
from zetaray_tpu.render import RenderConfig
from zetaray_tpu.render.frame import render_frame_restir_jit


def _mean_img(scene, cam, cfg, frames=8):
    acc = None
    for i in range(frames):
        out, _ = render_frame_restir_jit(
            scene, cam, jax.random.PRNGKey(100 + i), cfg, None
        )
        h = np.asarray(out["hdr"])
        acc = h if acc is None else acc + h
    return acc / frames


@pytest.fixture(scope="module")
def cam():
    from zetaray_tpu.scene import Camera

    return Camera.look_at((0, 1, 3.5), (0, 1, 0), vfov_deg=45, aspect=1.0)


def _cfg(**restir_kw):
    return RenderConfig(
        width=64, height=64, mode="restir_di", pt=PTConfig(max_bounces=1),
        restir=ReSTIRConfig(temporal=False, **restir_kw),
        taa=False, auto_exposure=False, indirect=False,
    )


def test_pairwise_matches_unreused_mean(cornell_dev, cam):
    ref = _mean_img(cornell_dev, cam, _cfg(spatial_iterations=0))
    pw = _mean_img(
        cornell_dev, cam,
        _cfg(spatial_iterations=1, spatial_mis="pairwise",
             spatial_neighbors=3),
    )
    assert np.isfinite(pw).all()
    lit = ref.mean(-1) > 0.02
    rel = np.abs(ref[lit] - pw[lit]).mean() / ref[lit].mean()
    assert rel < 0.12, rel


def test_pairwise_not_worse_than_biased(cornell_dev, cam):
    """Pairwise's mean error vs the unreused estimator must not exceed the
    biased combine's by more than noise allows (it should usually be lower)."""
    ref = _mean_img(cornell_dev, cam, _cfg(spatial_iterations=0), frames=10)
    pw = _mean_img(
        cornell_dev, cam,
        _cfg(spatial_iterations=1, spatial_mis="pairwise"), frames=10,
    )
    bi = _mean_img(
        cornell_dev, cam,
        _cfg(spatial_iterations=1, spatial_mis="biased"), frames=10,
    )
    lit = ref.mean(-1) > 0.02
    err_pw = np.abs(ref[lit] - pw[lit]).mean()
    err_bi = np.abs(ref[lit] - bi[lit]).mean()
    assert err_pw < err_bi * 1.5, (err_pw, err_bi)


def test_pairwise_m_accumulates(cornell_dev, cam):
    """Spatial pass grows M by the valid neighbors' M (reference M_s)."""
    from zetaray_tpu.accel.megakernel import build_light_sets, gbuffer
    from zetaray_tpu.core.rng import seed_from_key
    from zetaray_tpu.ops import restir_di as RD

    cfg = ReSTIRConfig(temporal=False, spatial_mis="pairwise",
                       spatial_neighbors=3)
    cam64 = cam
    o, d = cam64.generate_rays(64, 64)
    gb = gbuffer(cornell_dev, o, d, interpret=True)
    seed = seed_from_key(jax.random.PRNGKey(3))
    lsets = build_light_sets(cornell_dev, seed)
    res = RD.initial_candidates(gb, lsets, seed, cfg, interpret=True)
    out = RD.spatial_step_pairwise(res, gb, 64, 64, seed, 0, cfg)
    m0 = np.asarray(res[10])
    m1 = np.asarray(out[10])
    valid = np.asarray(gb[15]) > 0.5  # G.VALID
    assert (m1[valid] >= m0[valid] - 1e-5).all()
    assert m1[valid].mean() > m0[valid].mean() * 1.5
    # W stays finite and non-negative
    w = np.asarray(out[11])
    assert np.isfinite(w).all() and (w >= 0).all()
