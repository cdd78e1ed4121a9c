"""glTF loader + scene flattening tests against the bundled Cornell asset."""

import numpy as np
import pytest

from tests.conftest import CORNELL_EMISSIVE


@pytest.fixture(scope="module")
def doc():
    from zetaray_tpu.scene import load_gltf

    if not CORNELL_EMISSIVE.exists():
        pytest.skip("asset missing")
    return load_gltf(CORNELL_EMISSIVE)


def test_parses_materials(doc):
    assert len(doc.materials) == 9
    light = [m for m in doc.materials if m.name == "light"][0]
    assert light.emissive_strength == 20.0
    np.testing.assert_allclose(light.emissive_factor[0], 1.0)
    assert light.double_sided
    floor = [m for m in doc.materials if m.name == "floor"][0]
    assert floor.metallic == 0.0


def test_instances_and_transforms(doc):
    assert len(doc.instances) == 10
    # node "Plane" (the light) is translated near the ceiling (y ~ 2.02)
    plane = [i for i in doc.instances if i.name == "Plane"][0]
    assert abs(plane.world[1, 3] - 2.02274299) < 1e-5


def test_flattened_scene(cornell_cpu):
    s = cornell_cpu
    assert s.num_tris > 20
    assert s.v0.shape == s.v1.shape == s.v2.shape == (s.num_tris, 3)
    # light quad -> 2 emissive triangles
    assert len(s.emissive_tris) == 2
    # world bounds sane (walls at ~ +-1 around y ~ 1, huge ground plane at 50)
    lo, hi = s.aabb()
    assert lo[1] >= -1e-3 and hi[1] < 3.0
    # normals unit length
    ng = s.geometric_normals()
    np.testing.assert_allclose(np.linalg.norm(ng, axis=-1), 1.0, atol=1e-5)
    # areas positive
    assert (s.areas() > 0).all()


def test_emissive_power_and_alias(cornell_cpu):
    from zetaray_tpu.scene.light_build import emissive_powers
    from zetaray_tpu.core.sampling import build_alias_table

    p = emissive_powers(cornell_cpu)
    assert p.shape == (2,) and (p > 0).all()
    # the two light triangles have equal area/emission
    np.testing.assert_allclose(p[0], p[1], rtol=1e-5)
    prob, alias, pdf = build_alias_table(p)
    np.testing.assert_allclose(pdf, 0.5, rtol=1e-6)


def test_upload_padding(cornell_dev, cornell_cpu):
    d = cornell_dev
    assert d.v0.shape[0] % 128 == 0
    assert d.num_tris == cornell_cpu.num_tris
    assert d.woop.shape == (4, 3 * d.v0.shape[0])
    assert d.num_emissives == 2
    assert float(d.em_power) > 0
