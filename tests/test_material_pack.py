"""Bit-exact packed Material records (scene.material_pack vs Material.h)."""

import numpy as np

from zetaray_tpu.scene.material_pack import (
    INVALID_ID, pack_materials, unpack_materials,
)


def test_pack_cornell_roundtrip(cornell_cpu):
    m = cornell_cpu.materials
    w = pack_materials(m)
    assert w.shape == (m.base_color.shape[0], 8) and w.dtype == np.uint32
    out = unpack_materials(w)
    np.testing.assert_allclose(
        out["base_color"], np.clip(m.base_color, 0, 1), atol=1 / 255.0
    )
    np.testing.assert_allclose(
        out["roughness"], np.clip(m.roughness, 0, 1), atol=1 / 255.0
    )
    np.testing.assert_allclose(out["ior"], m.ior, atol=2e-4)
    np.testing.assert_array_equal(out["base_color_tex"], m.base_color_tex)
    np.testing.assert_array_equal(out["double_sided"], m.double_sided)
    # emissive round-trips through factor (rgb8) x strength (half)
    em = np.asarray(m.emissive, np.float32)
    rel = np.abs(out["emissive"] - em) / np.maximum(em.max(-1, keepdims=True), 1e-3)
    assert rel.max() < 1 / 128.0
    # metallic/transmissive are threshold flags (Material.h semantics)
    np.testing.assert_array_equal(
        out["metallic"] > 0.5, np.asarray(m.metallic) >= 0.9
    )


def test_invalid_texture_id_encoding():
    """-1 texture slots encode as the reference's INVALID_ID = 0xFFFF."""
    import dataclasses

    class M:
        base_color = np.array([[0.5, 0.2, 0.1]], np.float32)
        metallic = np.array([0.0], np.float32)
        roughness = np.array([0.4], np.float32)
        emissive = np.zeros((1, 3), np.float32)
        ior = np.array([1.5], np.float32)
        transmission = np.array([0.0], np.float32)
        coat_weight = np.array([0.0], np.float32)
        coat_roughness = np.array([0.0], np.float32)
        double_sided = np.array([False])
        base_color_tex = np.array([-1], np.int32)
        normal_tex = np.array([-1], np.int32)
        metallic_roughness_tex = np.array([-1], np.int32)
        emissive_tex = np.array([-1], np.int32)
        alpha_cutoff = np.array([0.0], np.float32)

    w = pack_materials(M)
    assert int(w[0, 1] & 0xFFFF) == INVALID_ID
    out = unpack_materials(w)
    assert out["base_color_tex"][0] == -1 and out["normal_tex"][0] == -1
