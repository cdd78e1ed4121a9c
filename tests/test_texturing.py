"""Primary-visibility texturing integration test."""

import numpy as np
import jax
import jax.numpy as jnp

from zetaray_tpu.scene import Camera
from zetaray_tpu.scene.textures import apply_textures_to_gbuffer
from zetaray_tpu.accel.megakernel import gbuffer, G


def test_gbuffer_uv_and_texid(cornell_dev, cornell_cpu):
    cam = Camera.look_at((0, 1.0, 3.5), (0, 1.0, 0.0), vfov_deg=45, aspect=1.0)
    o, d = cam.generate_rays(16, 16)
    gb = gbuffer(cornell_dev, o, d, rt=256, interpret=True)
    assert gb.shape[0] == G.ROWS
    valid = np.asarray(gb[G.VALID]) > 0.5
    uv = np.asarray(gb[G.UV : G.UV + 2])
    assert np.isfinite(uv).all()
    # the 'ground' material (the huge plane) has base_color_tex = 0,
    # everything else -1
    texid = np.asarray(gb[G.TEXID])
    assert set(np.unique(texid[valid])) <= {-1.0, 0.0}


def test_apply_textures_modulates_base(cornell_dev):
    cam = Camera.look_at((0, 1.0, 3.5), (0, 1.0, 0.0), vfov_deg=45, aspect=1.0)
    o, d = cam.generate_rays(16, 16)
    gb = gbuffer(cornell_dev, o, d, rt=256, interpret=True)
    # fake texture 0: solid half-intensity red
    tex = jnp.zeros((8, 8, 4)).at[..., 0].set(0.5).at[..., 3].set(1.0)
    gb2 = apply_textures_to_gbuffer(gb, {0: tex})
    texid = np.asarray(gb[G.TEXID])
    base_before = np.asarray(gb[G.BASE : G.BASE + 3])
    base_after = np.asarray(gb2[G.BASE : G.BASE + 3])
    textured = texid == 0.0
    if textured.any():
        np.testing.assert_allclose(
            base_after[0][textured], base_before[0][textured] * 0.5, rtol=1e-5
        )
        np.testing.assert_allclose(base_after[1][textured], 0.0, atol=1e-6)
    # untextured pixels untouched
    np.testing.assert_array_equal(
        base_after[:, texid < 0], base_before[:, texid < 0]
    )


def test_full_texture_maps_and_mips(cornell_dev, cornell_cpu):
    """Normal / metallic-roughness / emissive maps + trilinear mips applied
    through the material-id path (apply_texture_maps)."""
    import numpy as np
    from zetaray_tpu.scene.textures import apply_texture_maps, build_mips

    cam = Camera.look_at((0, 1.0, 3.5), (0, 1.0, 0.0), vfov_deg=45, aspect=1.0)
    o, d = cam.generate_rays(16, 16)
    gb = gbuffer(cornell_dev, o, d, rt=256, interpret=True)
    n_mats = len(cornell_cpu.materials.metallic)

    # synthetic bundle: every material gets the same maps
    mr = np.zeros((8, 8, 4), np.float32)
    mr[..., 1] = 0.5  # roughness x0.5
    mr[..., 2] = 0.25  # metallic x0.25
    nrm = np.zeros((8, 8, 4), np.float32)
    nrm[..., 0] = 0.5  # tangent-space normal = +z (identity)
    nrm[..., 1] = 0.5
    nrm[..., 2] = 1.0
    em = np.full((8, 8, 4), 0.5, np.float32)
    texmaps = {
        "base": {},
        "mr": {0: [jnp.asarray(m) for m in build_mips(mr)]},
        "normal": {1: [jnp.asarray(m) for m in build_mips(nrm)]},
        "emissive": {2: [jnp.asarray(m) for m in build_mips(em)]},
        "ids": {
            "base": np.full(n_mats, -1, np.int32),
            "mr": np.zeros(n_mats, np.int32),
            "normal": np.ones(n_mats, np.int32),
            "emissive": np.full(n_mats, 2, np.int32),
        },
    }
    gb2 = apply_texture_maps(gb, texmaps, spread_angle=0.01)
    valid = np.asarray(gb[G.VALID]) > 0.5
    # MR: roughness halved, metallic quartered on valid pixels
    np.testing.assert_allclose(
        np.asarray(gb2[G.ROUGH])[valid], np.asarray(gb[G.ROUGH])[valid] * 0.5,
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(gb2[G.METAL])[valid], np.asarray(gb[G.METAL])[valid] * 0.25,
        rtol=1e-4, atol=1e-7,
    )
    # emissive halved
    np.testing.assert_allclose(
        np.asarray(gb2[G.EMISS])[valid], np.asarray(gb[G.EMISS])[valid] * 0.5,
        rtol=1e-3, atol=1e-7,
    )
    # identity normal map: shading normal unchanged (within fp)
    ns_before = np.asarray(gb[G.NS : G.NS + 3])[:, valid]
    ns_after = np.asarray(gb2[G.NS : G.NS + 3])[:, valid]
    np.testing.assert_allclose(ns_after, ns_before, atol=2e-2)


def test_normal_map_perturbs(cornell_dev):
    """A non-identity normal map actually tilts the shading normal."""
    import numpy as np
    from zetaray_tpu.scene.textures import apply_texture_maps, build_mips

    cam = Camera.look_at((0, 1.0, 3.5), (0, 1.0, 0.0), vfov_deg=45, aspect=1.0)
    o, d = cam.generate_rays(16, 16)
    gb = gbuffer(cornell_dev, o, d, rt=256, interpret=True)
    nrm = np.zeros((8, 8, 4), np.float32)
    nrm[..., 0] = 0.9  # strong +x tilt in tangent space
    nrm[..., 1] = 0.5
    nrm[..., 2] = 0.8
    n_mats = 64
    texmaps = {
        "base": {}, "mr": {}, "emissive": {},
        "normal": {0: [jnp.asarray(m) for m in build_mips(nrm)]},
        "ids": {
            "base": np.full(n_mats, -1, np.int32),
            "mr": np.full(n_mats, -1, np.int32),
            "normal": np.zeros(n_mats, np.int32),
            "emissive": np.full(n_mats, -1, np.int32),
        },
    }
    gb2 = apply_texture_maps(gb, texmaps)
    valid = np.asarray(gb[G.VALID]) > 0.5
    ns_before = np.asarray(gb[G.NS : G.NS + 3])[:, valid]
    ns_after = np.asarray(gb2[G.NS : G.NS + 3])[:, valid]
    delta = np.abs(ns_after - ns_before).max()
    assert delta > 0.1, delta
    # still unit length
    np.testing.assert_allclose(
        np.linalg.norm(ns_after, axis=0), 1.0, atol=1e-4
    )


def test_secondary_bounce_texturing_paths_agree(cornell_dev):
    """VERDICT r2 #5: base color fetched at every path vertex. A solid
    half-red texture on texid 0 must change the indirect bounce color, and
    the split megakernel (interpret) must agree with the XLA wavefront."""
    import os

    from zetaray_tpu.accel.megakernel import trace_megakernel
    from zetaray_tpu.core.rng import seed_from_key
    from zetaray_tpu.ops.pathtracer import PTConfig, trace_reference

    cam = Camera.look_at((0, 1.0, 3.5), (0, 1.0, 0.0), vfov_deg=45, aspect=1.0)
    o, d = cam.generate_rays(16, 16)
    key = jax.random.PRNGKey(7)
    cfg = PTConfig(max_bounces=2)
    tex = jnp.zeros((8, 8, 4)).at[..., 0].set(0.5).at[..., 3].set(1.0)
    textures = {0: tex}

    seed = seed_from_key(key)
    mk_plain = np.asarray(
        trace_megakernel(cornell_dev, o, d, seed, cfg, rt=256, interpret=True)
    )
    mk_tex = np.asarray(
        trace_megakernel(
            cornell_dev, o, d, seed, cfg, rt=256, interpret=True,
            textures=textures, spread_angle=0.002,
        )
    )
    # texturing at bounce vertices must change the indirect component
    assert np.abs(mk_tex - mk_plain).max() > 1e-4
    # textured green/blue bounce light off texid-0 surfaces drops
    assert mk_tex.mean() < mk_plain.mean()

    ref_tex = np.asarray(
        trace_reference(
            cornell_dev, o, d, key, cfg, textures=textures,
            spread_angle=0.002,
        )
    )
    # statistical agreement (different RNG stream structures)
    m, r = mk_tex.mean(), ref_tex.mean()
    assert abs(m - r) / max(r, 1e-9) < 0.15, (m, r)
