"""Dense MXU intersector vs brute-force Moller-Trumbore oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from zetaray_tpu.accel.intersect import (
    intersect_closest,
    intersect_any,
    hit_surface,
    reference_closest_hit_np,
)
from zetaray_tpu.scene.scene import CpuScene, MaterialsSoA, upload_scene


def _random_scene(rng, n_tris=40):
    base = rng.uniform(-2, 2, size=(n_tris, 3))
    v0 = base
    v1 = base + rng.normal(0, 0.7, size=(n_tris, 3))
    v2 = base + rng.normal(0, 0.7, size=(n_tris, 3))
    z3 = np.zeros((n_tris, 3), np.float32)
    z2 = np.zeros((n_tris, 2), np.float32)
    mats = MaterialsSoA(
        base_color=np.ones((1, 3), np.float32),
        metallic=np.zeros(1, np.float32),
        roughness=np.ones(1, np.float32),
        emissive=np.zeros((1, 3), np.float32),
        ior=np.full(1, 1.5, np.float32),
        transmission=np.zeros(1, np.float32),
        coat_weight=np.zeros(1, np.float32),
        coat_roughness=np.zeros(1, np.float32),
        double_sided=np.ones(1, bool),
        base_color_tex=np.full(1, -1, np.int32),
    )
    n = np.cross(v1 - v0, v2 - v0)
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    return CpuScene(
        v0=v0.astype(np.float32), v1=v1.astype(np.float32), v2=v2.astype(np.float32),
        n0=n.astype(np.float32), n1=n.astype(np.float32), n2=n.astype(np.float32),
        uv0=z2, uv1=z2, uv2=z2,
        mat_id=np.zeros(n_tris, np.int32),
        materials=mats,
        emissive_tris=np.zeros(0, np.int32),
    )


@pytest.mark.parametrize("n_tris", [5, 40, 300])
def test_closest_matches_oracle(rng, n_tris):
    cpu = _random_scene(rng, n_tris)
    dev = upload_scene(cpu)
    n_rays = 500
    o = rng.uniform(-4, 4, size=(n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = d.astype(np.float32)

    hit = intersect_closest(dev, jnp.asarray(o), jnp.asarray(d))
    rt, rtri, ruv = reference_closest_hit_np(cpu.v0, cpu.v1, cpu.v2, o, d)

    ht = np.asarray(hit.t)
    htri = np.asarray(hit.tri)
    # Hit/miss classification may disagree on rays that graze a triangle edge
    # (f32 Woop transform vs f64 oracle); require < 1% such cases and that
    # every disagreement really is an edge graze (barycentric near boundary).
    cls_mismatch = (htri >= 0) != (rtri >= 0)
    assert cls_mismatch.mean() < 0.01
    for i in np.nonzero(cls_mismatch)[0]:
        hu, hv = float(hit.u[i]), float(hit.v[i])
        edge_dist = min(abs(hu), abs(hv), abs(1.0 - hu - hv)) if htri[i] >= 0 else 0.0
        assert edge_dist < 5e-3, f"non-graze mismatch at ray {i}"
    m = (rtri >= 0) & ~cls_mismatch
    # same triangle (allow ties at shared edges: compare t instead of id)
    np.testing.assert_allclose(ht[m], rt[m], rtol=2e-4, atol=2e-5)
    same = htri[m] == rtri[m]
    # ids match except possibly on exact shared-edge ties
    assert same.mean() > 0.98
    np.testing.assert_allclose(
        np.asarray(hit.u)[m][same], ruv[m][:, 0][same], rtol=1e-3, atol=2e-3
    )


def test_any_matches_closest(rng):
    cpu = _random_scene(rng, 64)
    dev = upload_scene(cpu)
    n_rays = 400
    o = rng.uniform(-4, 4, size=(n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = d.astype(np.float32)
    hit = intersect_closest(dev, jnp.asarray(o), jnp.asarray(d))
    occ = intersect_any(dev, jnp.asarray(o), jnp.asarray(d))
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(hit.tri) >= 0)
    # with limited t_max, only closer hits count
    occ_near = np.asarray(intersect_any(dev, jnp.asarray(o), jnp.asarray(d), t_max=1.0))
    expect = (np.asarray(hit.tri) >= 0) & (np.asarray(hit.t) < 1.0)
    # any-hit with t_max can also find a *different* triangle within range, so
    # occluded must be a superset of "closest hit within range"
    assert (occ_near | ~expect).all()


def test_ray_block_path(rng):
    """Exercise the lax.map ray-blocking path with > chunk rays."""
    cpu = _random_scene(rng, 16)
    dev = upload_scene(cpu)
    n_rays = 3000
    o = rng.uniform(-4, 4, size=(n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = d.astype(np.float32)
    full = intersect_closest(dev, jnp.asarray(o), jnp.asarray(d))
    # force tiny ray blocks through private API
    from zetaray_tpu.accel import intersect as I

    old = I._TRANSIENT_BUDGET
    try:
        I._TRANSIENT_BUDGET = 24 * 128 * 1024  # ray chunk = 1024
        blocked = intersect_closest(dev, jnp.asarray(o), jnp.asarray(d))
    finally:
        I._TRANSIENT_BUDGET = old
    np.testing.assert_allclose(np.asarray(full.t), np.asarray(blocked.t), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(full.tri), np.asarray(blocked.tri))


def test_cornell_center_ray(cornell_dev):
    # Ray from inside the box toward the back wall must hit something ~3-4 away
    o = jnp.asarray([[0.0, 1.0, 3.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    hit = intersect_closest(cornell_dev, o, d)
    assert int(hit.tri[0]) >= 0
    assert 3.0 < float(hit.t[0]) < 4.5
    surf = hit_surface(cornell_dev, o, d, hit)
    # back wall normal faces +z after flipping toward the ray
    assert float(surf.ng[0, 2]) > 0.9
