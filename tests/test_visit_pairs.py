"""Regression tests for accel.stream._visit_pairs (fast tier).

Advisor round 4 (medium): the bucket histogram summed a bfloat16 one-hot,
so counts rounded once a bucket exceeded 512 entries (513 -> 512), shifting
cumulative bucket offsets and colliding ranks in the order scatter -- which
silently dropped clusters from the visit list. These tests pin the f32
accumulation fix at exactly the scene sizes the streaming path targets.
"""

import numpy as np
import jax.numpy as jnp

from zetaray_tpu.accel.stream import _visit_pairs


def _run(mask_np, tnear_np, n_super, n_sub):
    pair_i, pair_c, v, msk, touched = _visit_pairs(
        jnp.asarray(mask_np), jnp.asarray(tnear_np), n_super, n_sub
    )
    return (
        np.asarray(pair_i), np.asarray(pair_c), int(v),
        np.asarray(msk), np.asarray(touched),
    )


def test_visit_pairs_large_bucket_no_dropped_clusters():
    """1015 visited clusters with 600 sharing one t-near bucket: every
    cluster must appear exactly once in the visit list (bf16 histogram
    accumulation dropped some -- advisor round 4)."""
    m, n_super, n_sub = 1015, 1, 4
    rng = np.random.default_rng(0)
    mask = np.ones((n_super * n_sub, m), np.int32)
    # 600 clusters in one t bucket, the rest spread out
    t = rng.uniform(1.0, 100.0, size=(n_super * n_sub, m)).astype(np.float32)
    t[:, :600] = 3.0
    pair_i, pair_c, v, _, touched = _run(mask, t, n_super, n_sub)
    assert v == m
    visited = pair_c[:v]
    assert len(np.unique(visited)) == m, (
        f"dropped {m - len(np.unique(visited))} clusters"
    )
    assert touched.all()


def test_visit_pairs_front_to_back_and_masks():
    """Visit order is front-to-back by bucketed shaft-entry t, pair_i is
    monotone, and the per-pair subtile masks match the input."""
    m, n_super, n_sub = 40, 2, 2
    rng = np.random.default_rng(1)
    mask = (rng.random((n_super * n_sub, m)) < 0.5).astype(np.int32)
    t = rng.uniform(0.5, 50.0, size=(n_super * n_sub, m)).astype(np.float32)
    t = np.where(mask > 0, t, np.float32(3.0e38))
    pair_i, pair_c, v, msk, touched = _run(mask, t, n_super, n_sub)
    sup = mask.reshape(n_super, n_sub, m).max(1) > 0
    assert v == int(sup.sum())
    assert (np.diff(pair_i[:v]) >= 0).all()
    tkey = np.where(sup, t.reshape(n_super, n_sub, m).min(1), np.inf)
    from zetaray_tpu.accel.stream import NB
    for s in range(n_super):
        rows = np.flatnonzero(pair_i[:v] == s)
        cs = pair_c[rows]
        assert set(cs.tolist()) == set(np.flatnonzero(sup[s]).tolist())
        # bucketed order: bucket ids must be non-decreasing along the visit
        tmax = tkey[s][np.isfinite(tkey[s])].max()
        bk = np.clip(
            (tkey[s][cs] / max(tmax, 1e-20) * (NB - 2)).astype(np.int64),
            0, NB - 2,
        )
        assert (np.diff(bk) >= 0).all()
        for r, c in zip(rows, cs):
            np.testing.assert_array_equal(
                msk[r, :, 0], mask.reshape(n_super, n_sub, m)[s, :, c]
            )


def test_visit_pairs_untouched_supertile():
    m, n_super, n_sub = 8, 2, 2
    mask = np.zeros((n_super * n_sub, m), np.int32)
    mask[:n_sub, :3] = 1  # only supertile 0 visits
    t = np.full((n_super * n_sub, m), 5.0, np.float32)
    pair_i, pair_c, v, _, touched = _run(mask, t, n_super, n_sub)
    assert v == 3
    assert touched.tolist() == [True, False]
    assert (pair_i[:v] == 0).all()
