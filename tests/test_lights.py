"""Emissive light sampling + MIS weight tests (Cornell fixture)."""

import numpy as np
import jax
import jax.numpy as jnp

from zetaray_tpu.ops import lights as L


def test_sample_emissive_on_light(cornell_dev, cornell_cpu, rng):
    n = 5000
    u4 = rng.random((n, 4)).astype(np.float32)
    u = tuple(jnp.asarray(u4[:, i]) for i in range(4))
    ls = L.sample_emissive(cornell_dev, u)
    tri = np.asarray(ls.tri)
    # all samples land on the two emissive triangles
    assert set(np.unique(tri)) <= set(cornell_cpu.emissive_tris.tolist())
    # roughly 50/50 (equal power)
    frac = (tri == cornell_cpu.emissive_tris[0]).mean()
    assert 0.45 < frac < 0.55
    # points lie on the triangle planes: check distance to plane ~ 0
    v0 = cornell_cpu.v0[tri]
    ng = cornell_cpu.geometric_normals()[tri]
    dist = np.abs(np.sum((np.asarray(ls.pos) - v0) * ng, -1))
    assert dist.max() < 1e-5
    # pdf_area = pdf_select / area
    areas = cornell_cpu.areas()[tri]
    np.testing.assert_allclose(np.asarray(ls.pdf_area), 0.5 / areas, rtol=1e-4)
    # radiance = factor * strength (20) with factor ~ (1, 0.776, 0.617)
    le = np.asarray(ls.le)
    np.testing.assert_allclose(le[:, 0], 20.0, rtol=1e-5)


def test_light_pdf_area_inverse(cornell_dev, cornell_cpu):
    tris = jnp.asarray(cornell_cpu.emissive_tris)
    pdf = np.asarray(L.light_pdf_area(cornell_dev, tris))
    areas = cornell_cpu.areas()[cornell_cpu.emissive_tris]
    np.testing.assert_allclose(pdf, 0.5 / areas, rtol=1e-4)
    # non-emissive triangles -> 0
    non_em = jnp.asarray([0, 1, 2], jnp.int32)
    assert (np.asarray(L.light_pdf_area(cornell_dev, non_em)) == 0).all()
    # miss (-1) -> 0
    assert float(L.light_pdf_area(cornell_dev, jnp.asarray([-1]))[0]) == 0.0


def test_power_heuristic():
    w = L.power_heuristic(jnp.asarray([1.0]), jnp.asarray([1.0]))
    np.testing.assert_allclose(np.asarray(w), 0.5)
    w = L.power_heuristic(jnp.asarray([10.0]), jnp.asarray([0.1]))
    assert float(w[0]) > 0.99
    w0 = L.power_heuristic(jnp.asarray([0.0]), jnp.asarray([1.0]))
    assert float(w0[0]) == 0.0


def test_emitted_one_sided(cornell_dev, cornell_cpu):
    tri = jnp.asarray(cornell_cpu.emissive_tris[:1])
    # double-sided material (Cornell light) emits on both sides
    le_front = L.emitted_radiance(cornell_dev, tri, jnp.asarray([1.0]))
    le_back = L.emitted_radiance(cornell_dev, tri, jnp.asarray([-1.0]))
    assert float(le_front[0, 0]) == 20.0
    assert float(le_back[0, 0]) == 20.0
    # miss -> zero
    assert float(L.emitted_radiance(cornell_dev, jnp.asarray([-1]), jnp.asarray([1.0]))[0].sum()) == 0.0
