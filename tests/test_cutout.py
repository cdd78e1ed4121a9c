"""Alpha-cutout traversal tests (reference: GBufferRT TestOpacity loop)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zetaray_tpu.scene.scene import CpuScene, _materials_soa, upload_scene
from zetaray_tpu.scene.gltf import GltfMaterial
from zetaray_tpu.utils.png import write_png


@pytest.fixture(scope="module")
def cutout_scene(tmp_path_factory):
    """A masked panel (left half transparent, right half opaque) in front of
    a solid back wall; camera looks +z -> -z."""
    tmp = tmp_path_factory.mktemp("tex")
    # RGBA texture: alpha 0 on the left half, 255 on the right
    img = np.full((8, 8, 4), 255, np.uint8)
    img[:, :4, 3] = 0
    p = tmp / "mask.png"
    write_png(str(p), img)

    def quad(z, half):
        v0 = np.array([[-half, -half, z], [half, -half, z]], np.float32)
        v1 = np.array([[half, -half, z], [half, half, z]], np.float32)
        v2 = np.array([[-half, half, z], [-half, half, z]], np.float32)
        return v0, v1, v2

    # panel at z=1 (2 tris), wall at z=0 (2 tris)
    v0 = np.array([[-1, -1, 1], [1, 1, 1], [-2, -2, 0], [2, 2, 0]], np.float32)
    v1 = np.array([[1, -1, 1], [-1, 1, 1], [2, -2, 0], [-2, 2, 0]], np.float32)
    v2 = np.array([[1, 1, 1], [-1, -1, 1], [2, 2, 0], [-2, -2, 0]], np.float32)
    n = np.tile(np.array([[0, 0, 1.0]], np.float32), (4, 1))
    # uvs: map x [-1,1] -> u [0,1] for the panel
    def uv_of(v):
        return ((v[:, :2] + 1.0) * 0.5).astype(np.float32)
    mats = _materials_soa([
        GltfMaterial(name="panel", metallic=0.0, roughness=1.0,
                     base_color_tex=0, alpha_mode="MASK", alpha_cutoff=0.5),
        GltfMaterial(name="wall", metallic=0.0, roughness=1.0),
    ])
    cpu = CpuScene(
        v0=v0, v1=v1, v2=v2, n0=n, n1=n, n2=n,
        uv0=uv_of(v0), uv1=uv_of(v1), uv2=uv_of(v2),
        mat_id=np.array([0, 0, 1, 1], np.int32),
        materials=mats,
        emissive_tris=np.zeros(0, np.int32),
        texture_paths=[str(p)],
    )
    return upload_scene(cpu)


def test_scene_has_cutout(cutout_scene):
    assert cutout_scene.has_cutout
    assert cutout_scene.alpha_tex is not None


def test_closest_sees_through_holes(cutout_scene):
    from zetaray_tpu.accel.intersect import intersect_closest_shaded

    # rays from z=2 toward -z: x=-0.5 goes through the transparent half
    # (hits the wall at z=0, t=2); x=+0.5 hits the opaque panel (t=1)
    o = jnp.asarray([[-0.5, 0.0, 2.0], [0.5, 0.0, 2.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]], jnp.float32)
    sh = intersect_closest_shaded(cutout_scene, o, d)
    t = np.asarray(sh.t)
    assert np.asarray(sh.valid).all()
    assert t[0] == pytest.approx(2.0, abs=1e-2), t  # pierced the hole
    assert t[1] == pytest.approx(1.0, abs=1e-2), t  # stopped at the panel


def test_occlusion_respects_cutout(cutout_scene):
    from zetaray_tpu.accel.intersect import intersect_occluded

    # shadow segments from z=2 to z=0.5 (crossing the panel only)
    o = jnp.asarray([[-0.5, 0.0, 2.0], [0.5, 0.0, 2.0]], jnp.float32)
    seg = jnp.asarray([[0.0, 0.0, -1.5], [0.0, 0.0, -1.5]], jnp.float32)
    occ = np.asarray(intersect_occluded(cutout_scene, o, seg, t_min=1e-3, t_max=1.0))
    assert not occ[0]  # transparent half: light passes
    assert occ[1]  # opaque half: blocked


def test_cutout_render_finite(cutout_scene):
    from zetaray_tpu.render.frame import render_frame, RenderConfig
    from zetaray_tpu.ops.pathtracer import PTConfig
    from zetaray_tpu.scene import Camera

    cam = Camera.look_at((0, 0, 3.0), (0, 0, 0), vfov_deg=60, aspect=1.0)
    cfg = RenderConfig(width=16, height=16, pt=PTConfig(max_bounces=2))
    out = render_frame(cutout_scene, cam, jax.random.PRNGKey(0), cfg)
    assert np.isfinite(np.asarray(out["hdr"])).all()
