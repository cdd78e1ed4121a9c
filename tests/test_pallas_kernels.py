"""Pallas kernels vs the jnp oracle (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from zetaray_tpu.accel.intersect import intersect_closest, intersect_any
from zetaray_tpu.accel.pallas_kernels import closest_hit_pallas, occlusion_pallas
from zetaray_tpu.scene.scene import upload_scene, A
from tests.test_intersect import _random_scene


@pytest.fixture(scope="module")
def setup(rng):
    cpu = _random_scene(np.random.default_rng(7), 300)
    dev = upload_scene(cpu)
    n = 512
    r = np.random.default_rng(8)
    o = jnp.asarray(r.uniform(-4, 4, (n, 3)).astype(np.float32))
    d = r.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return cpu, dev, o, jnp.asarray(d.astype(np.float32))


def test_closest_matches_jnp(setup):
    cpu, dev, o, d = setup
    ref = intersect_closest(dev, o, d)
    t, tri, u, v, attrs = closest_hit_pallas(
        dev.woop.reshape(4, 3, -1), dev.tri_attrs, o, d, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(tri), np.asarray(ref.tri))
    m = np.asarray(ref.tri) >= 0
    np.testing.assert_allclose(np.asarray(t)[m], np.asarray(ref.t)[m], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(u)[m], np.asarray(ref.u)[m], rtol=1e-5, atol=1e-6)
    # attrs row matches the gathered row
    want = np.asarray(dev.tri_attrs)[np.asarray(ref.tri)[m]]
    np.testing.assert_allclose(np.asarray(attrs)[m], want, rtol=1e-5, atol=1e-6)
    # misses produce zero attrs
    assert (np.asarray(attrs)[~m] == 0).all()


def test_occlusion_matches_jnp(setup):
    cpu, dev, o, d = setup
    ref = intersect_any(dev, o, d, t_min=1e-3, t_max=3.0)
    occ = occlusion_pallas(
        dev.woop.reshape(4, 3, -1), o, d, t_min=1e-3, t_max=3.0, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(ref))


def test_attr_table_layout(cornell_dev, cornell_cpu):
    at = np.asarray(cornell_dev.tri_attrs)
    t = cornell_cpu.num_tris
    np.testing.assert_allclose(
        at[:t, A.NG : A.NG + 3], cornell_cpu.geometric_normals(), atol=1e-6
    )
    np.testing.assert_allclose(
        at[:t, A.BASE : A.BASE + 3],
        cornell_cpu.materials.base_color[cornell_cpu.mat_id],
        atol=1e-6,
    )
    em = cornell_cpu.emissive_tris
    assert (at[em, A.EM_PDF_AREA] > 0).all()
    non_em = np.setdiff1d(np.arange(t), em)
    assert (at[non_em, A.EM_PDF_AREA] == 0).all()
    # emissive radiance present
    assert at[em, A.EMISS] .max() == pytest.approx(20.0, rel=1e-5)
