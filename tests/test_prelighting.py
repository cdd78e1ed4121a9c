"""PreLighting: GPU emissive power estimation + light voxel grid.

Reference parity: EstimateTriEmissivePower.hlsl (texture-integrated
per-triangle power -> alias table round trip, PreLighting.cpp:354-546) and
BuildLightVoxelGrid.hlsl / LightVoxelGrid.hlsli (camera-space stochastic
light reservoirs).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zetaray_tpu.ops import prelighting as PL


def _textured_light_scene():
    """Two quads: an emissive one with a half-bright texture, plus a floor."""
    from zetaray_tpu.scene.scene import CpuScene, MaterialsSoA, upload_scene

    # quad 0 (light, y=2, facing down), quad 1 (floor, y=0)
    def quad(y, flip):
        v = np.array(
            [[-1, y, -1], [1, y, -1], [1, y, 1], [-1, y, 1]], np.float64
        )
        tris = ([0, 2, 1], [0, 3, 2]) if flip else ([0, 1, 2], [0, 2, 3])
        return v, tris

    v_l, t_l = quad(2.0, True)
    v_f, t_f = quad(0.0, False)
    v0, v1, v2, uv0, uv1, uv2, mid = [], [], [], [], [], [], []
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    for verts, tris, m in ((v_l, t_l, 0), (v_f, t_f, 1)):
        for tr in tris:
            v0.append(verts[tr[0]]); v1.append(verts[tr[1]]); v2.append(verts[tr[2]])
            uv0.append(uvs[tr[0]]); uv1.append(uvs[tr[1]]); uv2.append(uvs[tr[2]])
            mid.append(m)
    n = np.zeros((4, 3), np.float64)
    mats = MaterialsSoA(
        base_color=np.array([[1, 1, 1], [0.8, 0.8, 0.8]], np.float32),
        metallic=np.zeros(2, np.float32),
        roughness=np.ones(2, np.float32),
        emissive=np.array([[4, 4, 4], [0, 0, 0]], np.float32),
        ior=np.full(2, 1.5, np.float32),
        transmission=np.zeros(2, np.float32),
        coat_weight=np.zeros(2, np.float32),
        coat_roughness=np.zeros(2, np.float32),
        double_sided=np.zeros(2, bool),
        base_color_tex=np.full(2, -1, np.int32),
        normal_tex=np.full(2, -1, np.int32),
        metallic_roughness_tex=np.full(2, -1, np.int32),
        emissive_tex=np.array([0, -1], np.int32),
        alpha_cutoff=np.zeros(2, np.float32),
    )
    cpu = CpuScene(
        v0=np.asarray(v0), v1=np.asarray(v1), v2=np.asarray(v2),
        n0=n.copy(), n1=n.copy(), n2=n.copy(),
        uv0=np.asarray(uv0, np.float32), uv1=np.asarray(uv1, np.float32),
        uv2=np.asarray(uv2, np.float32),
        mat_id=np.asarray(mid, np.int32),
        materials=mats,
        emissive_tris=np.array([0, 1], np.int32),
    )
    # recompute degenerate normals from geometry
    g = cpu.geometric_normals()
    cpu.n0, cpu.n1, cpu.n2 = g.copy(), g.copy(), g.copy()
    scene = upload_scene(cpu)
    # emissive texture: left half black, right half white (u < 0.5 -> 0)
    tex = np.zeros((8, 8, 4), np.float32)
    tex[:, 4:, :3] = 1.0
    tex[..., 3] = 1.0
    texmaps = {
        "emissive": {0: [jnp.asarray(tex)]},
        "base": {}, "normal": {}, "mr": {},
        "ids": {"emissive": np.array([0, -1], np.int32),
                "base": np.full(2, -1, np.int32),
                "normal": np.full(2, -1, np.int32),
                "mr": np.full(2, -1, np.int32)},
    }
    return cpu, scene, texmaps


def test_power_estimation_untextured(cornell_dev, cornell_cpu):
    from zetaray_tpu.scene.light_build import emissive_powers

    p, mean_rgb = PL.estimate_tri_power(cornell_dev)
    expected = emissive_powers(cornell_cpu)
    np.testing.assert_allclose(np.asarray(p), expected, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(mean_rgb), 1.0)


def test_power_estimation_textured():
    cpu, scene, texmaps = _textured_light_scene()
    p_plain, _ = PL.estimate_tri_power(scene)
    p_tex, mean_rgb = PL.estimate_tri_power(scene, texmaps, n_samples=256)
    # texture halves the integrated power (left half of UV space is black);
    # bilinear edge filtering makes it approximate
    ratio = np.asarray(p_tex).sum() / np.asarray(p_plain).sum()
    assert 0.4 < ratio < 0.6
    assert 0.4 < np.asarray(mean_rgb).mean() < 0.6


def test_apply_tri_powers_rebuilds_tables():
    from zetaray_tpu.scene.scene import EA

    cpu, scene, texmaps = _textured_light_scene()
    # fake: triangle 0 gets 3x the power of triangle 1
    powers = np.array([3.0, 1.0])
    s2 = PL.apply_tri_powers(scene, powers, mean_rgb=np.array([[0.5] * 3] * 2))
    pdf = np.asarray(s2.em_pdf[:2])
    np.testing.assert_allclose(pdf, [0.75, 0.25], rtol=1e-6)
    np.testing.assert_allclose(float(s2.em_power), 4.0)
    # EA.LE scaled by mean_rgb
    np.testing.assert_allclose(
        np.asarray(s2.em_attrs[:2, EA.LE]),
        np.asarray(scene.em_attrs[:2, EA.LE]) * 0.5,
        rtol=1e-6,
    )
    # alias sampling follows the new pdf
    from zetaray_tpu.core.sampling import sample_alias

    u = np.random.default_rng(7).random((20000, 2)).astype(np.float32)
    idx = np.asarray(sample_alias(
        s2.em_prob[:2], s2.em_alias[:2],
        jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1]),
    ))
    frac = (idx == 0).mean()
    assert 0.73 < frac < 0.77


# ---------------------------------------------------------------------------
# Light voxel grid
# ---------------------------------------------------------------------------


def test_voxel_mapping_roundtrip(cornell_dev):
    from zetaray_tpu.scene import Camera

    cam = Camera.look_at((0, 1, 3.5), (0, 1, 0), vfov_deg=45, aspect=1.0)
    cfg = PL.LVGConfig(dim=(8, 4, 10), extents=(0.25, 0.25, 0.25))
    centers, _ = PL._voxel_centers(cam, cfg)
    vox, inside = PL.voxel_of_position(centers, cam, cfg)
    assert bool(inside.all())
    np.testing.assert_array_equal(
        np.asarray(vox), np.arange(int(np.prod(cfg.dim)))
    )
    # a point far outside maps to inside=False
    _, ins = PL.voxel_of_position(jnp.asarray([[0.0, 1.0, 500.0]]), cam, cfg)
    assert not bool(ins[0])


def test_lvg_build_cornell(cornell_dev):
    from zetaray_tpu.scene import Camera
    from zetaray_tpu.scene.scene import EA

    cam = Camera.look_at((0, 1, 3.5), (0, 1, 0), vfov_deg=45, aspect=1.0)
    cfg = PL.LVGConfig(dim=(8, 4, 10), extents=(0.3, 0.3, 0.3), slots=4)
    lvg = np.asarray(PL.build_light_voxel_grid(cornell_dev, cam, 123, cfg))
    assert lvg.shape == (8 * 4 * 10 * 4, PL.LVG_ROWS)
    filled = lvg[:, 9] > 0
    # voxels in front of the camera see the ceiling light
    assert filled.mean() > 0.2
    # every filled slot stores a point on one of the two light triangles
    le = lvg[filled][:, 6:9]
    exp_le = np.asarray(cornell_dev.em_attrs[0, EA.LE : EA.LE + 3])
    np.testing.assert_allclose(
        le, np.broadcast_to(exp_le, le.shape), rtol=1e-4
    )
    pos = lvg[filled][:, 0:3]
    # light plane is y ~ 2.0227 in the Cornell asset
    assert np.allclose(pos[:, 1], pos[0, 1], atol=1e-3)


def test_lvg_candidates_match_baseline(cornell_dev):
    """restir_di with LVG candidates converges to the same image as the
    presampled-set-only estimator (both are unbiased RIS streams)."""
    from dataclasses import replace as drep

    from zetaray_tpu.ops.pathtracer import PTConfig
    from zetaray_tpu.ops.restir_di import ReSTIRConfig
    from zetaray_tpu.render import RenderConfig
    from zetaray_tpu.render.frame import render_frame_restir_jit
    from zetaray_tpu.scene import Camera

    cam = Camera.look_at((0, 1, 3.5), (0, 1, 0), vfov_deg=45, aspect=1.0)
    base = RenderConfig(
        width=64, height=64, mode="restir_di", pt=PTConfig(max_bounces=1),
        restir=ReSTIRConfig(temporal=False, spatial_iterations=0),
        taa=False, auto_exposure=False, indirect=False,
    )
    with_lvg = drep(
        base,
        restir=ReSTIRConfig(temporal=False, spatial_iterations=0,
                            lvg_samples=4),
        lvg_cfg=PL.LVGConfig(dim=(8, 4, 10), extents=(0.3, 0.3, 0.3),
                             slots=4),
    )

    def mean_img(cfg, frames=6):
        acc = None
        for i in range(frames):
            out, _ = render_frame_restir_jit(
                cornell_dev, cam, jax.random.PRNGKey(i), cfg, None
            )
            h = np.asarray(out["hdr"])
            acc = h if acc is None else acc + h
        return acc / frames

    a = mean_img(base)
    b = mean_img(with_lvg)
    lit = a.mean(-1) > 0.01
    rel = np.abs(a[lit] - b[lit]).mean() / a[lit].mean()
    assert rel < 0.15, rel
    assert np.isfinite(b).all()
