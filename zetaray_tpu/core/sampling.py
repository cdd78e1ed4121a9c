"""Sampling primitives: alias tables, Halton sequences, warps.

Counterpart of the reference's Math/Sampling.{h,cpp}: the CPU O(n) alias-table
build (Sampling.h:31 ``AliasTable_Build``) feeding the many-light sampler, and
the Halton low-discrepancy sequence used for camera jitter (Camera.cpp).

Host side is NumPy (alias build happens once per emissive-set change, like the
reference's readback->CPU-build->upload round trip, PreLighting.cpp:483-546).
Device side (``sample_alias``) is jnp and O(1) per sample.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def build_alias_table(weights: np.ndarray):
    """Vose O(n) alias method.

    Returns ``(prob, alias, pdf)`` where for bucket i a uniform pick of bucket
    plus a biased coin ``u < prob[i]`` (else ``alias[i]``) samples index i with
    probability ``pdf[i] = w_i / sum(w)``. Matches the reference's invariants
    (Tests/TestAliasTable.cpp): ``sum(prob) == n * mean-normalized`` and the
    cached pdf equals the input distribution.
    """
    w = np.asarray(weights, dtype=np.float64)
    n = w.shape[0]
    assert n > 0
    total = w.sum()
    if total <= 0:
        # Degenerate: uniform table.
        return (
            np.ones(n, dtype=np.float32),
            np.arange(n, dtype=np.int32),
            np.full(n, 1.0 / n, dtype=np.float32),
        )
    p = w * (n / total)  # mean-normalized, sums to n
    prob = np.zeros(n, dtype=np.float64)
    alias = np.arange(n, dtype=np.int32)
    small = [i for i in range(n) if p[i] < 1.0]
    large = [i for i in range(n) if p[i] >= 1.0]
    while small and large:
        s = small.pop()
        l = large.pop()
        prob[s] = p[s]
        alias[s] = l
        p[l] = (p[l] + p[s]) - 1.0
        (small if p[l] < 1.0 else large).append(l)
    for i in large:
        prob[i] = 1.0
    for i in small:
        prob[i] = 1.0
    return (
        prob.astype(np.float32),
        alias.astype(np.int32),
        (w / total).astype(np.float32),
    )


def sample_alias(prob: jnp.ndarray, alias: jnp.ndarray, u1, u2):
    """O(1) alias-table sample (device). ``u1, u2`` uniform in [0,1).

    Returns sampled indices with the same shape as ``u1``.
    """
    n = prob.shape[0]
    k = jnp.minimum((u1 * n).astype(jnp.int32), n - 1)
    take_alias = u2 >= prob[k]
    return jnp.where(take_alias, alias[k], k)


_PRIMES = np.array([2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37], dtype=np.int64)


def halton(index, dim: int = 0):
    """Radical-inverse Halton sample(s) in [0,1). ``index`` scalar or array."""
    base = int(_PRIMES[dim])
    i = np.asarray(index, dtype=np.int64)
    f = np.ones(i.shape, dtype=np.float64) if i.shape else 1.0
    r = np.zeros_like(i, dtype=np.float64)
    f = np.full(i.shape if i.shape else (), 1.0)
    while np.any(i > 0):
        f = f / base
        r = r + f * (i % base)
        i = i // base
    return r


def halton_jitter(frame: int) -> tuple[float, float]:
    """Per-frame sub-pixel jitter in [-0.5, 0.5)^2 (TAA camera jitter).

    Mirrors the reference's Halton(2,3) pixel jitter (Camera.cpp).
    """
    i = (frame % 64) + 1
    return float(halton(i, 0)) - 0.5, float(halton(i, 1)) - 0.5


# ---------------------------------------------------------------------------
# Warps (device, jnp) -- used by BSDF sampling / lens sampling.
# ---------------------------------------------------------------------------


def square_to_disk_concentric(u: jnp.ndarray):
    """[..., 2] uniform square -> unit disk, concentric (Shirley) mapping."""
    a = 2.0 * u[..., 0] - 1.0
    b = 2.0 * u[..., 1] - 1.0
    cond = jnp.abs(a) > jnp.abs(b)
    r = jnp.where(cond, a, b)
    safe = jnp.where(r == 0.0, 1.0, r)
    phi = jnp.where(
        cond,
        (jnp.pi / 4.0) * (b / safe),
        (jnp.pi / 2.0) - (jnp.pi / 4.0) * (a / safe),
    )
    phi = jnp.where(r == 0.0, 0.0, phi)
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def square_to_cosine_hemisphere(u: jnp.ndarray):
    """[..., 2] -> cosine-weighted direction about +Z, pdf = cos(theta)/pi."""
    d = square_to_disk_concentric(u)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - d[..., 0] ** 2 - d[..., 1] ** 2))
    return jnp.stack([d[..., 0], d[..., 1], z], axis=-1)


def square_to_triangle(u: jnp.ndarray):
    """[..., 2] -> uniform barycentrics (b1, b2), low-distortion sqrt-free map.

    Eric Heitz's "A Low-Distortion Map Between Triangle and Square" variant.
    """
    u1, u2 = u[..., 0], u[..., 1]
    flip = u2 > u1
    b1 = jnp.where(flip, u1 * 0.5, u1 - u2 * 0.5)
    b2 = jnp.where(flip, u2 - u1 * 0.5, u2 * 0.5)
    return jnp.stack([b1, b2], axis=-1)
