"""BVH-cluster streaming traversal (accel.stream) vs oracles.

Mirrors the reference's validate-vs-DirectXMath strategy (SURVEY.md section
4): the streaming Pallas kernels run in interpret mode on CPU and must agree
with the brute-force NumPy/XLA intersectors on the same cluster-ordered
arrays.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zetaray_tpu.accel.stream import closest_hit_stream, occlusion_stream
from zetaray_tpu.accel.intersect import reference_closest_hit_np
from zetaray_tpu.scene.scene import CpuScene, _materials_soa, upload_scene
from zetaray_tpu.scene.gltf import GltfMaterial


def _soup(rng, t=1500, emissive_count=8):
    """Random triangle soup CpuScene spread over a 10-unit box."""
    c = (rng.random((t, 3)) - 0.5) * 10.0
    v0 = (c + rng.normal(size=(t, 3)) * 0.3).astype(np.float32)
    v1 = (c + rng.normal(size=(t, 3)) * 0.3).astype(np.float32)
    v2 = (c + rng.normal(size=(t, 3)) * 0.3).astype(np.float32)
    g = np.cross(v1 - v0, v2 - v0)
    g = g / np.maximum(np.linalg.norm(g, axis=-1, keepdims=True), 1e-20)
    uv = np.zeros((t, 2), np.float32)
    mats = _materials_soa([
        GltfMaterial(name="d", metallic=0.0, roughness=1.0),
        GltfMaterial(
            name="e", metallic=0.0, roughness=1.0,
            emissive_factor=np.array([1.0, 1.0, 1.0], np.float32),
            emissive_strength=5.0,
        ),
    ])
    mat_id = np.zeros(t, np.int32)
    mat_id[:emissive_count] = 1
    return CpuScene(
        v0=v0, v1=v1, v2=v2, n0=g.astype(np.float32), n1=g.astype(np.float32),
        n2=g.astype(np.float32), uv0=uv, uv1=uv, uv2=uv, mat_id=mat_id,
        materials=mats, emissive_tris=np.arange(emissive_count, dtype=np.int32),
    )


def _rays(rng, n=512):
    o = np.full((n, 3), np.float32(0.0)) + np.array([0, 0, 12.0], np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] -= 1.5  # bias toward the soup
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.fixture(scope="module")
def clustered(rng):
    cpu = _soup(rng)
    return upload_scene(cpu, cluster_size=128)


def test_clusterized_upload(clustered):
    s = clustered
    assert s.cluster_aabb is not None
    m = s.cluster_aabb.shape[0]
    assert s.woop.shape[1] == 3 * m * 128
    # pad slots are degenerate: zero Woop columns
    lo = np.asarray(s.cluster_aabb[:, 0:3])
    hi = np.asarray(s.cluster_aabb[:, 3:6])
    assert (hi >= lo).all()


def test_stream_closest_matches_oracle(clustered, rng):
    s = clustered
    o, d = _rays(rng)
    woop3 = s.woop.reshape(4, 3, -1)
    t, tri, u, v = closest_hit_stream(
        woop3, s.woop_stream, s.cluster_aabb, o, d, interpret=True
    )
    v0 = np.asarray(s.v0)
    v1 = v0 + np.asarray(s.e1)
    v2 = v0 + np.asarray(s.e2)
    t_ref, tri_ref, uv_ref = reference_closest_hit_np(
        v0, v1, v2, np.asarray(o), np.asarray(d)
    )
    hit = tri_ref >= 0
    assert hit.sum() > 50  # rays actually hit the soup
    np.testing.assert_array_equal(np.asarray(tri >= 0), hit)
    np.testing.assert_allclose(np.asarray(t)[hit], t_ref[hit], rtol=2e-4, atol=1e-5)
    # same winning triangle except where two tris tie within fp tolerance
    same = np.asarray(tri)[hit] == tri_ref[hit]
    assert same.mean() > 0.99


def test_stream_occlusion_matches_oracle(clustered, rng):
    from zetaray_tpu.accel.intersect import intersect_any

    s = clustered
    o, d = _rays(rng)
    occ = occlusion_stream(
        s.woop_stream, s.cluster_aabb, o, d,
        t_min=1e-3, t_max=100.0, interpret=True,
    )
    ref = intersect_any(s, o, d, t_min=1e-3, t_max=100.0)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(ref))


def test_clustered_scene_traces_end_to_end(clustered):
    """The full PT wavefront works on a clustered scene (CPU oracle path)."""
    from zetaray_tpu.ops.pathtracer import trace, PTConfig
    from zetaray_tpu.scene import Camera

    cam = Camera.look_at((0, 0, 14.0), (0, 0, 0), vfov_deg=50, aspect=1.0)
    o, d = cam.generate_rays(32, 32)
    out = trace(clustered, o, d, jax.random.PRNGKey(0), PTConfig(max_bounces=2))
    out = np.asarray(out)
    assert np.isfinite(out).all()
    assert out.max() > 0.0  # emissive tris light the soup


def test_large_scene_not_rerouted_to_megakernel(rng):
    """>8k-tri scenes cluster automatically; the trace dispatch must pick
    the streaming wavefront, not the VMEM megakernel (VERDICT weak #8)."""
    cpu = _soup(rng, t=9000)
    s = upload_scene(cpu)
    assert s.cluster_aabb is not None
    assert s.woop.shape[1] // 3 > 8192


def test_two_phase_cap_matches_single_phase(clustered, rng):
    """Two-phase capped traversal (accel.stream._closest_call with t_cap)
    is exact: phase-1 hits are global closest, phase 2 resolves the rest.
    Must agree with the uncapped sweep for every ray, including rays whose
    closest hit lies beyond the cap."""
    s = clustered
    o, d = _rays(rng)
    woop3 = s.woop.reshape(4, 3, -1)
    ref = closest_hit_stream(
        woop3, s.woop_stream, s.cluster_aabb, o, d, interpret=True
    )
    for cap in (2.0, 6.0):  # soup spans ~10 units from a 12-unit-away origin
        t, tri, u, v = closest_hit_stream(
            woop3, s.woop_stream, s.cluster_aabb, o, d,
            interpret=True, t_cap=cap,
        )
        np.testing.assert_array_equal(np.asarray(tri), np.asarray(ref[1]))
        np.testing.assert_allclose(
            np.asarray(t), np.asarray(ref[0]), rtol=1e-6, atol=1e-6
        )


def test_two_phase_cap_shaded(clustered, rng):
    """closest_hit_stream_shaded honors t_cap (the scene-level
    stream_tcap plumbing) and stays exact."""
    from zetaray_tpu.accel.stream import closest_hit_stream_shaded

    s = clustered
    o, d = _rays(rng)
    ref = closest_hit_stream_shaded(
        s.stream_attrs, s.woop_stream, s.cluster_aabb, o, d, interpret=True
    )
    out = closest_hit_stream_shaded(
        s.stream_attrs, s.woop_stream, s.cluster_aabb, o, d,
        interpret=True, t_cap=3.0,
    )
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(ref[1]))
    np.testing.assert_allclose(
        np.asarray(out[0]), np.asarray(ref[0]), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out[4]), np.asarray(ref[4]), rtol=1e-6, atol=1e-6
    )


def test_upload_sets_stream_tcap(clustered):
    """Clustered uploads carry a positive static traversal cap; dense
    scenes leave it 0 (single-phase)."""
    assert clustered.stream_tcap > 0.0
