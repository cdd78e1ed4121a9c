"""Presampled-set scale axis (reference: 128 sets x 512 samples,
DefaultRendererImpl.h:37-38). Sizes are shape-driven: every consumer
derives (n_sets, ps) from the lsets array, so any scale compiles.
"""

import numpy as np
import jax
import jax.numpy as jnp

from zetaray_tpu.accel.megakernel import (
    LSET_ROWS, build_light_sets, gbuffer, trace_megakernel,
)
from zetaray_tpu.core.rng import seed_from_key
from zetaray_tpu.ops.pathtracer import PTConfig
from zetaray_tpu.ops import restir_di as RD


def _rays(n=64):
    from zetaray_tpu.scene import Camera

    cam = Camera.look_at((0, 1.0, 3.5), (0, 1.0, 0.0), vfov_deg=45, aspect=1.0)
    side = int(np.sqrt(n))
    return cam.generate_rays(side, side)


def test_build_light_sets_reference_scale(cornell_dev):
    ls = build_light_sets(cornell_dev, jnp.uint32(7), ns=128, ps=512)
    assert ls.shape == (128, LSET_ROWS, 512)
    flat = np.asarray(ls).transpose(1, 0, 2).reshape(LSET_ROWS, -1)
    assert np.isfinite(flat).all()
    assert (flat[9] > 0).all()  # pdf_area
    assert flat[6:9].max() > 0  # some emission


def test_megakernel_nee_nondefault_scale(cornell_dev):
    """The bounce kernel's NEE derives sizes from the lsets shape; a
    non-default (ns, ps) must stay a consistent estimator (same mean)."""
    o, d = _rays(64)
    cfg = PTConfig(max_bounces=1)
    cfg_big = PTConfig(max_bounces=1, light_ns=8, light_ps=256)

    def mean(cfg, n_seeds=6):
        acc = 0.0
        for i in range(n_seeds):
            acc += float(
                np.asarray(
                    trace_megakernel(
                        cornell_dev, o, d, seed_from_key(jax.random.PRNGKey(i)),
                        cfg, rt=64, interpret=True,
                    )
                ).mean()
            )
        return acc / n_seeds

    a, b = mean(cfg), mean(cfg_big)
    assert abs(a - b) / max(a, 1e-9) < 0.25, (a, b)


def test_restir_di_initial_candidates_nondefault_scale(cornell_dev):
    o, d = _rays(64)
    gb = gbuffer(cornell_dev, o, d, rt=64, interpret=True)
    ls = build_light_sets(cornell_dev, jnp.uint32(3), ns=4, ps=256)
    res = RD.initial_candidates(
        gb, ls, 11, RD.ReSTIRConfig(), rt=64, interpret=True
    )
    r = np.asarray(res)
    assert np.isfinite(r).all()
    # full-set RIS carries M = set size
    valid = r[10] > 0
    assert valid.any()
    np.testing.assert_allclose(r[10][valid], 256.0)


def test_wops_matches_wps_mean(cornell_dev):
    """In-kernel WoPS NEE (per-lane alias sampling, the reference's *_WoPS
    kernel variants) is a consistent estimator: its mean matches the
    presampled-set (WPS) megakernel's."""
    o, d = _rays(64)

    def mean(mode, n_seeds=8):
        cfg = PTConfig(max_bounces=2, nee_mode=mode)
        acc = 0.0
        for i in range(n_seeds):
            acc += float(
                np.asarray(
                    trace_megakernel(
                        cornell_dev, o, d,
                        seed_from_key(jax.random.PRNGKey(100 + i)),
                        cfg, rt=64, interpret=True,
                    )
                ).mean()
            )
        return acc / n_seeds

    wps, wops = mean("wps"), mean("wops")
    assert wops > 0.0 and np.isfinite(wops)
    assert abs(wps - wops) / max(wps, 1e-9) < 0.2, (wps, wops)


def test_wops_oracle_agreement(cornell_dev):
    """WoPS megakernel vs the XLA wavefront (which always samples the
    alias table per pixel): statistical agreement."""
    from zetaray_tpu.ops.pathtracer import trace_reference

    o, d = _rays(64)
    cfg = PTConfig(max_bounces=2, nee_mode="wops")
    mk = np.mean([
        np.asarray(
            trace_megakernel(
                cornell_dev, o, d, seed_from_key(jax.random.PRNGKey(i)),
                cfg, rt=64, interpret=True,
            )
        )
        for i in range(8)
    ])
    xla = np.mean([
        np.asarray(
            trace_reference(cornell_dev, o, d, jax.random.PRNGKey(50 + i), cfg)
        )
        for i in range(8)
    ])
    assert abs(mk - xla) / max(xla, 1e-9) < 0.2, (mk, xla)
