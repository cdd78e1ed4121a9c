"""Subdivision (scene.subdivide): geometry-preserving triangle scaling."""

import numpy as np
import jax
import pytest

from zetaray_tpu.scene import Camera
from zetaray_tpu.scene.scene import upload_scene
from zetaray_tpu.scene.subdivide import subdivide_scene


def test_counts_and_area_preserved(cornell_cpu):
    sub = subdivide_scene(cornell_cpu, 500)
    assert sub.num_tris >= 500
    np.testing.assert_allclose(
        sub.areas().sum(), cornell_cpu.areas().sum(), rtol=1e-5
    )
    # emissive triangles are held out of the split: bit-identical light set
    np.testing.assert_array_equal(
        sub.v0[sub.emissive_tris], cornell_cpu.v0[cornell_cpu.emissive_tris]
    )
    np.testing.assert_allclose(
        sub.areas()[sub.emissive_tris].sum(),
        cornell_cpu.areas()[cornell_cpu.emissive_tris].sum(), rtol=1e-5,
    )


def test_subdivide_split_emissive(cornell_cpu):
    """keep_emissive=False reproduces the every-triangle-splits behavior."""
    sub = subdivide_scene(cornell_cpu, 500, keep_emissive=False)
    assert sub.num_tris == cornell_cpu.num_tris * 4 ** int(
        np.ceil(np.log(500 / cornell_cpu.num_tris) / np.log(4))
    )
    assert sub.emissive_tris.size == cornell_cpu.emissive_tris.size * (
        sub.num_tris // cornell_cpu.num_tris
    )
    np.testing.assert_allclose(
        sub.areas()[sub.emissive_tris].sum(),
        cornell_cpu.areas()[cornell_cpu.emissive_tris].sum(), rtol=1e-5,
    )


@pytest.mark.slow
def test_subdivided_renders_same_image(cornell_cpu):
    """Same geometry, 16x the triangles (clustered path forced): the
    primary-visibility image must match the dense-path original closely."""
    from zetaray_tpu.render import RenderConfig, render_frame
    from zetaray_tpu.ops.pathtracer import PTConfig

    cam = Camera.look_at((0, 1.0, 3.5), (0, 1.0, 0.0), vfov_deg=45, aspect=1.0)
    cfg = RenderConfig(width=24, height=24, pt=PTConfig(max_bounces=1))
    base = upload_scene(cornell_cpu)
    sub = upload_scene(
        subdivide_scene(cornell_cpu, cornell_cpu.num_tris * 16),
        cluster_size=128,
    )
    assert sub.cluster_aabb is not None
    a = np.asarray(render_frame(base, cam, jax.random.PRNGKey(0), cfg)["hdr"])
    b = np.asarray(render_frame(sub, cam, jax.random.PRNGKey(0), cfg)["hdr"])
    # same surfaces, same RNG; only shared-edge tie-breaks may differ
    close = np.isclose(a, b, rtol=0.05, atol=0.02).mean()
    assert close > 0.95, close
