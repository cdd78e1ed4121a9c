"""BVH build + traversal oracle tests."""

import numpy as np
import pytest

from zetaray_tpu.accel.bvh import build_bvh, cast_ray
from zetaray_tpu.accel.intersect import reference_closest_hit_np
from tests.test_intersect import _random_scene


@pytest.fixture(scope="module")
def scene_tris():
    cpu = _random_scene(np.random.default_rng(11), 3000)
    return cpu.v0, cpu.v1, cpu.v2


def test_build_invariants(scene_tris):
    v0, v1, v2 = scene_tris
    bvh = build_bvh(v0, v1, v2, leaf_size=32)
    t = v0.shape[0]
    # permutation covers every triangle exactly once
    assert sorted(bvh.perm.tolist()) == list(range(t))
    # leaves cover [0, T) disjointly
    ls = bvh.leaves()
    spans = sorted((int(bvh.first[l]), int(bvh.count[l])) for l in ls)
    cursor = 0
    for f, c in spans:
        assert f == cursor and 0 < c <= 32
        cursor += c
    assert cursor == t
    # children boxes inside parents
    for nid in range(bvh.num_nodes):
        if bvh.count[nid] == 0:
            for ch in (bvh.left[nid], bvh.right[nid]):
                assert (bvh.lo[ch] >= bvh.lo[nid] - 1e-5).all()
                assert (bvh.hi[ch] <= bvh.hi[nid] + 1e-5).all()
    # node count sane: ~2 * T/leaf
    assert bvh.num_nodes < 4 * (t // 16)


def test_cast_ray_matches_bruteforce(scene_tris):
    v0, v1, v2 = scene_tris
    bvh = build_bvh(v0, v1, v2, leaf_size=16)
    p0, p1, p2 = v0[bvh.perm], v1[bvh.perm], v2[bvh.perm]
    rng = np.random.default_rng(3)
    n = 100
    o = rng.uniform(-4, 4, (n, 3))
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rt, rtri, _ = reference_closest_hit_np(v0, v1, v2, o.astype(np.float32), d.astype(np.float32))
    hits = misses = 0
    for i in range(n):
        t, slot = cast_ray(bvh, p0, p1, p2, o[i], d[i])
        if rtri[i] < 0:
            assert slot == -1
            misses += 1
        else:
            assert slot >= 0
            assert abs(t - rt[i]) < 1e-4 * max(1.0, rt[i])
            # same original triangle
            assert bvh.perm[slot] == rtri[i]
            hits += 1
    assert hits > 10 and misses > 10  # both cases exercised


def test_cluster_aabbs_shape(scene_tris):
    v0, v1, v2 = scene_tris
    bvh = build_bvh(v0, v1, v2, leaf_size=64)
    lo, hi, first, count = bvh.cluster_aabbs()
    assert (count > 0).all() and (count <= 64).all()
    assert lo.shape == hi.shape and lo.shape[0] == first.shape[0]
    assert count.sum() == v0.shape[0]
