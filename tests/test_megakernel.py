"""Bounce megakernel (interpret mode) vs the XLA reference path tracer."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zetaray_tpu.scene import Camera
from zetaray_tpu.accel.megakernel import trace_megakernel, build_light_sets
from zetaray_tpu.ops.pathtracer import PTConfig, trace_reference
from zetaray_tpu.core.rng import seed_from_key


@pytest.fixture(scope="module")
def setup(cornell_dev):
    cam = Camera.look_at((0, 1.0, 3.5), (0, 1.0, 0.0), vfov_deg=45, aspect=1.0)
    o, d = cam.generate_rays(24, 24)
    return cornell_dev, o, d


def test_matches_reference_statistically(setup):
    scene, o, d = setup
    cfg = PTConfig(max_bounces=2)
    mk = np.mean(
        [
            np.asarray(
                trace_megakernel(
                    scene, o, d, seed_from_key(jax.random.PRNGKey(i)), cfg,
                    rt=192, interpret=True,
                )
            )
            for i in range(5)
        ]
    )
    ref = np.mean(
        [
            np.asarray(
                trace_reference(scene, o, d, jax.random.PRNGKey(100 + i), cfg)
            )
            for i in range(5)
        ]
    )
    assert abs(mk - ref) / ref < 0.08, (mk, ref)


def test_finite_and_deterministic(setup):
    scene, o, d = setup
    cfg = PTConfig(max_bounces=1)
    s = seed_from_key(jax.random.PRNGKey(3))
    r1 = trace_megakernel(scene, o, d, s, cfg, rt=192, interpret=True)
    r2 = trace_megakernel(scene, o, d, s, cfg, rt=192, interpret=True)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    assert np.isfinite(np.asarray(r1)).all() and (np.asarray(r1) >= 0).all()


def test_light_sets_cover_emissives(cornell_dev, cornell_cpu):
    ls = build_light_sets(cornell_dev, jnp.uint32(7))
    assert ls.shape[0] > 0
    flat = np.asarray(ls)  # [NS, ROWS, PS]
    # every set contains positive-pdf samples with Le = light radiance
    assert (flat[:, 9] > 0).all()
    np.testing.assert_allclose(flat[:, 6].max(), 20.0, rtol=1e-5)
    # sample positions lie near the light plane (y ~ 2.02)
    ys = flat[:, 1]
    assert (np.abs(ys - 2.0227) < 0.01).all()


def test_trace_with_first_hit_matches_separate_query(cornell_dev):
    """trace_with_first_hit (GI generation fast path) returns the same
    radiance as trace_megakernel and the same first-hit surface as
    intersect_closest_shaded."""
    import jax
    import jax.numpy as jnp

    from zetaray_tpu.accel.intersect import intersect_closest_shaded
    from zetaray_tpu.accel.megakernel import (
        trace_megakernel, trace_with_first_hit,
    )
    from zetaray_tpu.core.rng import seed_from_key
    from zetaray_tpu.scene import Camera
    from zetaray_tpu.scene.scene import A

    cam = Camera.look_at((0, 1.0, 3.5), (0, 1.0, 0.0), vfov_deg=45, aspect=1.0)
    o, d = cam.generate_rays(16, 16)
    key = jax.random.PRNGKey(5)
    seed = seed_from_key(key)
    cfg = PTConfig(max_bounces=2, min_emissive_bounce=1, min_nee_bounce=0)

    rad_ref = np.asarray(
        trace_megakernel(cornell_dev, o, d, seed, cfg, rt=256, interpret=True)
    )
    rad_rows, surf, alive0 = trace_with_first_hit(
        cornell_dev, o, d, seed, cfg, rt=256, interpret=True
    )
    np.testing.assert_allclose(np.asarray(rad_rows).T, rad_ref, atol=1e-5)

    sh = intersect_closest_shaded(cornell_dev, o, d)
    hit_ref = np.asarray(sh.valid)
    np.testing.assert_array_equal(np.asarray(alive0) > 0.5, hit_ref)
    pos_ref = np.asarray(o) + np.asarray(sh.t)[:, None] * np.asarray(d)
    got = np.asarray(surf[0:3]).T
    np.testing.assert_allclose(got[hit_ref], pos_ref[hit_ref], atol=1e-4)
