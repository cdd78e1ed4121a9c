"""BSDF correctness: furnace, sample/eval consistency, reciprocity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zetaray_tpu.ops import bsdf as B


def _mat(n, base=1.0, metallic=0.0, rough=1.0, ior=1.5):
    ones = jnp.ones((n,))
    return B.MatParams(
        base_color=jnp.full((n, 3), base),
        metallic=ones * metallic,
        roughness=ones * rough,
        ior=ones * ior,
        transmission=ones * 0.0,
    )


def _random_wo(rng, n):
    v = rng.normal(size=(n, 3))
    v[:, 2] = np.abs(v[:, 2]) + 0.05
    return jnp.asarray((v / np.linalg.norm(v, axis=-1, keepdims=True)).astype(np.float32))


def test_frame_orthonormal(rng):
    n = rng.normal(size=(500, 3))
    n = jnp.asarray((n / np.linalg.norm(n, axis=-1, keepdims=True)).astype(np.float32))
    t, b = B.make_frame(n)
    for a, bb in [(t, b), (t, n), (b, n)]:
        dots = np.abs(np.asarray(jnp.sum(a * bb, -1)))
        assert dots.max() < 1e-5
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(t, axis=-1)), 1.0, atol=1e-5)
    # to_local/to_world round trip
    w = _random_wo(np.random.default_rng(1), 500)
    wl = B.to_local(n, t, b, w)
    w2 = B.to_world(n, t, b, wl)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-5)


@pytest.mark.parametrize("metallic,rough", [(0.0, 1.0), (0.0, 0.4), (1.0, 0.3), (0.5, 0.7)])
def test_white_furnace(rng, metallic, rough):
    """Integral of f*cos over the hemisphere should be <= ~1 (energy
    conservation) and, for the rough white diffuse case, close to 1."""
    n = 50000
    mat = _mat(n, base=1.0, metallic=metallic, rough=rough)
    wo = jnp.broadcast_to(jnp.asarray([0.3, 0.1, 0.95]), (n, 3))
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    u = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    wi, w, pdf = B.bsdf_sample(mat, wo, u)
    est = float(jnp.mean(jnp.where(pdf[:, None] > 0, w, 0.0)[:, 0]))
    # single-scatter GGX loses energy at high roughness; no multiscatter comp yet
    assert est < 1.12, f"energy gain: {est}"
    if metallic == 0.0 and rough == 1.0:
        assert 0.85 < est <= 1.08, est


def test_sample_eval_consistency(rng):
    n = 20000
    mat = _mat(n, base=0.7, metallic=0.3, rough=0.5)
    wo = _random_wo(rng, n)
    u = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    wi, w, pdf = B.bsdf_sample(mat, wo, u)
    f, pdf2 = B.bsdf_eval(mat, wo, wi)
    m = np.asarray(pdf) > 1e-6
    np.testing.assert_allclose(np.asarray(pdf2)[m], np.asarray(pdf)[m], rtol=1e-4)
    w2 = np.asarray(f * (jnp.maximum(wi[..., 2], 0.0) / jnp.maximum(pdf2, 1e-12))[..., None])
    np.testing.assert_allclose(w2[m], np.asarray(w)[m], rtol=1e-3, atol=1e-5)


def test_pdf_integrates_to_one(rng):
    """MC integral of the mixture pdf over the hemisphere ~ 1."""
    n = 200000
    mat = _mat(n, base=0.6, metallic=0.2, rough=0.6)
    wo = jnp.broadcast_to(jnp.asarray([0.4, 0.0, 0.9165151]), (n, 3))
    # uniform hemisphere sampling
    u = rng.random((n, 2))
    z = u[:, 0]
    r = np.sqrt(np.maximum(0, 1 - z * z))
    phi = 2 * np.pi * u[:, 1]
    wi = jnp.asarray(
        np.stack([r * np.cos(phi), r * np.sin(phi), z], -1).astype(np.float32)
    )
    _, pdf = B.bsdf_eval(mat, wo, wi)
    integral = float(jnp.mean(pdf)) * 2 * np.pi
    assert abs(integral - 1.0) < 0.05, integral


def test_reciprocity(rng):
    n = 5000
    mat = _mat(n, base=0.8, metallic=0.4, rough=0.5)
    wo = _random_wo(rng, n)
    wi = _random_wo(np.random.default_rng(7), n)
    f1, _ = B.bsdf_eval(mat, wo, wi)
    f2, _ = B.bsdf_eval(mat, wi, wo)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=1e-3, atol=1e-5)


def test_ggx_vndf_distribution(rng):
    """Sampled half-vectors should reproduce the visible NDF: check the
    weight w = f*cos/pdf stays bounded and sane for a smooth-ish surface."""
    n = 50000
    mat = _mat(n, base=0.0, metallic=1.0, rough=0.2)
    wo = jnp.broadcast_to(jnp.asarray([0.6, 0.0, 0.8]), (n, 3))
    u = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    u = u.at[:, 0].set(0.0)  # force specular lobe
    wi, w, pdf = B.bsdf_sample(mat, wo, u)
    m = np.asarray(pdf) > 0
    assert m.mean() > 0.95
    # VNDF weight = F * G2/G1 <= ~1 per channel
    assert float(np.asarray(w)[m].max()) < 1.2


# ---------------------------------------------------------------------------
# Multiscatter energy compensation + coat lobe (reference BSDF.hlsli COAT)
# ---------------------------------------------------------------------------


def _mat_coat(n, base=1.0, metallic=0.0, rough=1.0, coat=1.0, coat_rough=0.3):
    ones = jnp.ones((n,))
    return B.MatParams(
        base_color=jnp.full((n, 3), base),
        metallic=ones * metallic,
        roughness=ones * rough,
        ior=ones * 1.5,
        transmission=ones * 0.0,
        coat=ones * coat,
        coat_roughness=ones * coat_rough,
    )


def test_ggx_albedo_fit_sane():
    from zetaray_tpu.ops import shading_soa as S

    e_smooth = float(S.ggx_albedo(jnp.asarray(0.9), jnp.asarray(0.05)))
    assert 0.95 < e_smooth <= 1.0, e_smooth
    e_rough_grazing = float(S.ggx_albedo(jnp.asarray(0.1), jnp.asarray(1.0)))
    assert 0.3 < e_rough_grazing < 0.95, e_rough_grazing
    # monotone-ish: rougher loses more energy
    assert e_rough_grazing < float(S.ggx_albedo(jnp.asarray(0.1), jnp.asarray(0.3)))


def test_metal_furnace_energy_comp(rng):
    """White rough metal furnace ~ 1 with multiple-scattering compensation
    (single-scatter GGX alone loses ~30-40% at roughness 1)."""
    n = 100000
    mat = _mat(n, base=1.0, metallic=1.0, rough=1.0)
    wo = jnp.broadcast_to(jnp.asarray([0.3, 0.1, 0.95]), (n, 3))
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    u = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    wi, w, pdf = B.bsdf_sample(mat, wo, u)
    est = float(jnp.mean(jnp.where(pdf[:, None] > 0, w, 0.0)[:, 0]))
    assert 0.9 < est < 1.1, f"furnace with comp: {est}"


def test_coat_zero_matches_uncoated(rng):
    n = 5000
    plain = _mat(n, base=0.6, metallic=0.2, rough=0.5)
    coated0 = _mat_coat(n, base=0.6, metallic=0.2, rough=0.5, coat=0.0)
    wo = _random_wo(rng, n)
    wi = _random_wo(np.random.default_rng(7), n)
    f0, p0 = B.bsdf_eval(plain, wo, wi)
    f1, p1 = B.bsdf_eval(coated0, wo, wi)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p0), rtol=1e-5, atol=1e-7)


def test_coat_sample_eval_consistency(rng):
    n = 20000
    mat = _mat_coat(n, base=0.7, metallic=0.1, rough=0.6, coat=0.8, coat_rough=0.15)
    wo = _random_wo(rng, n)
    u = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    wi, w, pdf = B.bsdf_sample(mat, wo, u)
    f, pdf2 = B.bsdf_eval(mat, wo, wi)
    m = np.asarray(pdf) > 1e-6
    np.testing.assert_allclose(np.asarray(pdf2)[m], np.asarray(pdf)[m], rtol=1e-4)
    w2 = np.asarray(f * (jnp.maximum(wi[..., 2], 0.0) / jnp.maximum(pdf2, 1e-12))[..., None])
    np.testing.assert_allclose(w2[m], np.asarray(w)[m], rtol=1e-3, atol=1e-5)


def test_coat_energy_conservation(rng):
    """Full coat on white diffuse: no energy gain, bounded loss."""
    n = 100000
    mat = _mat_coat(n, base=1.0, metallic=0.0, rough=1.0, coat=1.0, coat_rough=0.3)
    wo = jnp.broadcast_to(jnp.asarray([0.2, 0.0, 0.98]), (n, 3))
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    u = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    wi, w, pdf = B.bsdf_sample(mat, wo, u)
    est = float(jnp.mean(jnp.where(pdf[:, None] > 0, w, 0.0)[:, 0]))
    assert 0.65 < est < 1.08, f"coated furnace: {est}"


def test_coat_adds_specular_highlight(rng):
    """A smooth coat on a rough base adds near-mirror response."""
    n = 1
    wo = jnp.asarray([[0.6, 0.0, 0.8]])
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    mirror = jnp.asarray([[-0.6, 0.0, 0.8]])
    mirror = mirror / jnp.linalg.norm(mirror, axis=-1, keepdims=True)
    plain = _mat(n, base=0.5, metallic=0.0, rough=0.9)
    coated = _mat_coat(n, base=0.5, metallic=0.0, rough=0.9, coat=1.0, coat_rough=0.05)
    f_plain, _ = B.bsdf_eval(plain, wo, mirror)
    f_coat, _ = B.bsdf_eval(coated, wo, mirror)
    assert float(f_coat[0, 0]) > 3.0 * float(f_plain[0, 0])
