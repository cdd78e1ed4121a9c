"""Alias table + warp tests (mirror of the reference's TestAliasTable.cpp)."""

import numpy as np
import jax
import jax.numpy as jnp

from zetaray_tpu.core.sampling import (
    build_alias_table,
    sample_alias,
    halton,
    square_to_cosine_hemisphere,
    square_to_triangle,
)


def test_alias_pdf_matches_distribution(rng):
    for n in [1, 2, 7, 33, 256, 1000]:
        w = rng.random(n).astype(np.float64) + 1e-3
        prob, alias, pdf = build_alias_table(w)
        assert prob.shape == (n,) and alias.shape == (n,)
        np.testing.assert_allclose(pdf, w / w.sum(), rtol=1e-5)
        # Invariant from Tests/TestAliasTable.cpp: mean-normalized table.
        # Reconstruct sampling probability of each index from the table:
        p = prob.astype(np.float64).copy() / n
        for i in range(n):
            p[alias[i]] += (1.0 - prob[i]) / n
        np.testing.assert_allclose(p, w / w.sum(), atol=1e-6)


def test_alias_sampling_statistics(rng):
    w = np.array([1.0, 2.0, 4.0, 8.0, 1.0])
    prob, alias, pdf = build_alias_table(w)
    key = jax.random.PRNGKey(0)
    u = jax.random.uniform(key, (200000, 2))
    idx = np.asarray(sample_alias(jnp.asarray(prob), jnp.asarray(alias), u[:, 0], u[:, 1]))
    counts = np.bincount(idx, minlength=5) / idx.shape[0]
    np.testing.assert_allclose(counts, w / w.sum(), atol=0.01)


def test_halton_first_values():
    np.testing.assert_allclose(
        [halton(i, 0) for i in [1, 2, 3, 4]], [0.5, 0.25, 0.75, 0.125]
    )
    np.testing.assert_allclose(
        [halton(i, 1) for i in [1, 2, 3]], [1 / 3, 2 / 3, 1 / 9]
    )


def test_cosine_hemisphere_is_normalized_and_upper(rng):
    u = jnp.asarray(rng.random((1000, 2)))
    d = np.asarray(square_to_cosine_hemisphere(u))
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    assert (d[:, 2] >= -1e-6).all()
    # cosine-weighted: mean z = integral cos * cos / pi over hemisphere = 2/3
    assert abs(d[:, 2].mean() - 2.0 / 3.0) < 0.02


def test_triangle_warp_uniform(rng):
    u = jnp.asarray(rng.random((20000, 2)))
    b = np.asarray(square_to_triangle(u))
    assert (b >= 0).all() and (b.sum(-1) <= 1.0 + 1e-6).all()
    # centroid of uniform samples -> (1/3, 1/3)
    np.testing.assert_allclose(b.mean(0), [1 / 3, 1 / 3], atol=0.01)
