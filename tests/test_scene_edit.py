"""Dynamic scene editing (scene.edit): SceneCore AddInstance/remove analog.

End-to-end property: adding an emissive quad to the Cornell box lights the
scene more; removing it restores the original light transport.
"""

import numpy as np
import jax
import pytest

from zetaray_tpu.scene.gltf import GltfMaterial


def _quad(y=1.95, half=0.3):
    pos = np.array(
        [[-half, y, -half], [half, y, -half], [half, y, half], [-half, y, half]],
        np.float32,
    )
    idx = np.array([[0, 2, 1], [0, 3, 2]], np.int32)  # facing down (-y)
    return pos, idx


def test_add_remove_roundtrip(cornell_cpu):
    from zetaray_tpu.scene import add_instance, remove_instance

    pos, idx = _quad()
    t0 = cornell_cpu.num_tris
    e0 = len(cornell_cpu.emissive_tris)
    m0 = len(cornell_cpu.materials.metallic)

    mat = GltfMaterial(name="lamp", emissive_factor=np.array([1.0, 1.0, 1.0], np.float32), emissive_strength=40.0)
    cpu2 = add_instance(cornell_cpu, pos, idx, material=mat, name="added_lamp")
    assert cpu2.num_tris == t0 + 2
    assert len(cpu2.materials.metallic) == m0 + 1
    assert len(cpu2.emissive_tris) == e0 + 2  # the new quad is emissive
    assert "added_lamp" in cpu2.inst_names
    # original untouched (functional update)
    assert cornell_cpu.num_tris == t0

    cpu3 = remove_instance(cpu2, "added_lamp")
    assert cpu3.num_tris == t0
    assert len(cpu3.emissive_tris) == e0
    # tombstoned name keeps the other instance ids stable
    assert cpu3.inst_names[-1].startswith("<removed:")
    np.testing.assert_array_equal(cpu3.inst_id, cornell_cpu.inst_id)

    with pytest.raises(KeyError):
        remove_instance(cpu3, "added_lamp")
    with pytest.raises(IndexError):
        add_instance(cornell_cpu, pos, idx, material=999)


def test_added_light_illuminates(cornell_cpu):
    """The rebuilt scene actually renders the new light (TLAS-rebuild
    analog: edit + re-upload changes light transport)."""
    from zetaray_tpu.ops.pathtracer import PTConfig
    from zetaray_tpu.render import RenderConfig, render_frame_jit
    from zetaray_tpu.scene import Camera, add_instance, upload_scene

    pos, idx = _quad(y=1.9, half=0.45)
    mat = GltfMaterial(
        name="lamp", emissive_factor=np.array([1.0, 0.3, 0.1], np.float32), emissive_strength=60.0
    )
    cpu2 = add_instance(cornell_cpu, pos, idx, material=mat, name="lamp")

    cam = Camera.look_at((0, 1, 3.5), (0, 1, 0), vfov_deg=45, aspect=1.0)
    cfg = RenderConfig(width=32, height=32, pt=PTConfig(max_bounces=1), taa=False)
    key = jax.random.PRNGKey(0)
    base = np.asarray(
        render_frame_jit(upload_scene(cornell_cpu), cam, key, cfg)["hdr"]
    )
    lit = np.asarray(render_frame_jit(upload_scene(cpu2), cam, key, cfg)["hdr"])
    assert lit.mean() > base.mean() * 1.3
    # the new light is warm: red gains more than blue
    gain = lit.mean((0, 1)) - base.mean((0, 1))
    assert gain[0] > gain[2] * 1.5
