"""Sun + sky integration: open scene, shadows, megakernel vs oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zetaray_tpu.scene import Camera
from zetaray_tpu.scene.scene import CpuScene, upload_scene
from zetaray_tpu.ops.pathtracer import PTConfig, trace_reference
from zetaray_tpu.ops.sky import SkyParams
from tests.test_intersect import _random_scene  # reuse MaterialsSoA builder


def _open_scene():
    """A ground quad with a floating box above it (sun-shadow test scene)."""
    base = _random_scene(np.random.default_rng(0), 1)  # template for materials
    quads = []
    # ground quad [-5,5]^2 at y=0 (two triangles)
    g = np.array(
        [
            [[-5, 0, -5], [5, 0, -5], [-5, 0, 5]],
            [[5, 0, -5], [5, 0, 5], [-5, 0, 5]],
        ],
        np.float32,
    )
    # small box roof at y=1 (casts a shadow)
    b = np.array(
        [
            [[-0.7, 1, -0.7], [0.7, 1, -0.7], [-0.7, 1, 0.7]],
            [[0.7, 1, -0.7], [0.7, 1, 0.7], [-0.7, 1, 0.7]],
        ],
        np.float32,
    )
    tris = np.concatenate([g, b])
    v0, v1, v2 = tris[:, 0], tris[:, 1], tris[:, 2]
    n = np.cross(v1 - v0, v2 - v0)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    z2 = np.zeros((4, 2), np.float32)
    return CpuScene(
        v0=v0, v1=v1, v2=v2, n0=n, n1=n, n2=n,
        uv0=z2, uv1=z2, uv2=z2,
        mat_id=np.zeros(4, np.int32),
        materials=base.materials,
        emissive_tris=np.zeros(0, np.int32),
    )


@pytest.fixture(scope="module")
def setup():
    dev = upload_scene(_open_scene())
    cam = Camera.look_at((0, 2.5, 6), (0, 0.5, 0), vfov_deg=50, aspect=1.0)
    o, d = cam.generate_rays(32, 32)
    sky = SkyParams(sun_dir=(0.0, 1.0, 0.0))  # sun straight up
    return dev, o, d, sky


def test_sky_visible_on_miss(setup):
    dev, o, d, sky = setup
    cfg = PTConfig(max_bounces=1, sky=sky)
    rad = np.asarray(trace_reference(dev, o, d, jax.random.PRNGKey(0), cfg)).reshape(32, 32, 3)
    assert np.isfinite(rad).all()
    # top rows miss everything -> sky (blue-ish: b > r away from sun)
    top = rad[:4].mean(axis=(0, 1))
    assert top.sum() > 0.01
    # without sky, misses are black
    cfg0 = PTConfig(max_bounces=1)
    rad0 = np.asarray(trace_reference(dev, o, d, jax.random.PRNGKey(0), cfg0)).reshape(32, 32, 3)
    assert rad0[:4].mean() < 1e-6


def test_sun_shadow(setup):
    dev, o, d, sky = setup
    cfg = PTConfig(max_bounces=1, sky=sky)
    acc = 0.0
    for i in range(8):
        acc = acc + np.asarray(
            trace_reference(dev, o, d, jax.random.PRNGKey(i), cfg)
        )
    rad = (acc / 8).reshape(32, 32, 3)
    img_lum = rad.mean(-1)
    # the box roof's sun shadow lands on the ground around image row ~18,
    # center columns; compare against open ground in the same rows
    shadowed = img_lum[18:20, 13:18].mean()
    open_ground = img_lum[18:20, 2:7].mean()
    assert shadowed < open_ground * 0.5, (shadowed, open_ground)


def test_megakernel_sky_matches_reference(setup):
    dev, o, d, sky = setup
    from zetaray_tpu.accel.megakernel import trace_megakernel
    from zetaray_tpu.core.rng import seed_from_key

    cfg = PTConfig(max_bounces=1, sky=sky)
    mk = np.mean(
        [
            np.asarray(
                trace_megakernel(
                    dev, o, d, seed_from_key(jax.random.PRNGKey(i)), cfg,
                    rt=256, interpret=True,
                )
            )
            for i in range(4)
        ]
    )
    ref = np.mean(
        [
            np.asarray(trace_reference(dev, o, d, jax.random.PRNGKey(40 + i), cfg))
            for i in range(4)
        ]
    )
    assert abs(mk - ref) / ref < 0.1, (mk, ref)
