"""SkyDI reservoir pass (reference: DirectLighting/Sky/SkyDI.h:1-137).

The estimator is unbiased: E[shade] over seeds must match a brute-force
Monte-Carlo quadrature of f * Le_sky * cos over the hemisphere.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zetaray_tpu.ops import skydi as SD
from zetaray_tpu.ops.sky import SkyParams


@pytest.fixture(scope="module")
def floor_scene():
    from zetaray_tpu.scene.scene import CpuScene, MaterialsSoA, upload_scene

    v = np.array(
        [[-50, 0, -50], [50, 0, -50], [50, 0, 50], [-50, 0, 50]], np.float64
    )
    tris = ([0, 2, 1], [0, 3, 2])  # +y facing
    v0 = np.stack([v[t[0]] for t in tris])
    v1 = np.stack([v[t[1]] for t in tris])
    v2 = np.stack([v[t[2]] for t in tris])
    g = np.cross(v1 - v0, v2 - v0)
    g /= np.linalg.norm(g, axis=-1, keepdims=True)
    assert np.allclose(g[:, 1], 1.0)
    mats = MaterialsSoA(
        base_color=np.array([[0.6, 0.5, 0.4]], np.float32),
        metallic=np.zeros(1, np.float32),
        roughness=np.ones(1, np.float32),
        emissive=np.zeros((1, 3), np.float32),
        ior=np.full(1, 1.5, np.float32),
        transmission=np.zeros(1, np.float32),
        coat_weight=np.zeros(1, np.float32),
        coat_roughness=np.zeros(1, np.float32),
        double_sided=np.zeros(1, bool),
        base_color_tex=np.full(1, -1, np.int32),
        normal_tex=np.full(1, -1, np.int32),
        metallic_roughness_tex=np.full(1, -1, np.int32),
        emissive_tex=np.full(1, -1, np.int32),
        alpha_cutoff=np.zeros(1, np.float32),
    )
    z2 = np.zeros((2, 2), np.float32)
    cpu = CpuScene(
        v0=v0, v1=v1, v2=v2, n0=g.copy(), n1=g.copy(), n2=g.copy(),
        uv0=z2, uv1=z2, uv2=z2,
        mat_id=np.zeros(2, np.int32), materials=mats,
        emissive_tris=np.zeros(0, np.int32),
    )
    return upload_scene(cpu)


@pytest.fixture(scope="module")
def sky():
    return SkyParams(sun_dir=(0.3, 0.8, 0.2))


def _floor_gbuffer(scene, n=256):
    """G-buffer of n pixels all on the floor, camera above looking down."""
    from zetaray_tpu.accel.megakernel import gbuffer
    from zetaray_tpu.scene import Camera

    cam = Camera.look_at((0, 3.0, 0.01), (0, 0, 0), vfov_deg=40, aspect=1.0)
    side = int(np.sqrt(n))
    o, d = cam.generate_rays(side, side)
    return gbuffer(scene, o, d, rt=128, interpret=True), cam


def _quadrature(sky, albedo, n=200_000):
    """Stratified E[f * Le * cos] for an up-facing Lambertian surface:
    cosine-sampled sky dome (disk excluded) + uniform-cone-sampled sun disk
    (cosine sampling alone almost never hits the ~7e-5 sr disk)."""
    from zetaray_tpu.core.vec3 import V3
    from zetaray_tpu.ops import sky as SK

    rng = np.random.default_rng(0)
    u = rng.random((n, 2)).astype(np.float32)
    r = np.sqrt(u[:, 0])
    phi = 2 * np.pi * u[:, 1]
    wi = np.stack(
        [r * np.cos(phi), np.sqrt(np.maximum(1 - u[:, 0], 0.0)), r * np.sin(phi)],
        -1,
    )  # y-up cosine distribution, pdf = cos/pi
    env = SK.sky_radiance(
        V3(jnp.asarray(wi[:, 0]), jnp.asarray(wi[:, 1]), jnp.asarray(wi[:, 2])),
        sky, with_disk=False,
    )
    env_np = np.stack([np.asarray(env.x), np.asarray(env.y), np.asarray(env.z)], -1)
    out = albedo * env_np.mean(0)  # albedo/pi * pi * mean(Le)

    # sun stratum: uniform directions in a cone 2x the disk radius (covers
    # the smooth edge), pdf = 1/omega
    sun, t, b = SD._sun_basis(sky)
    cos_r2 = np.cos(2.0 * sky.sun_angular_radius)
    omega = 2 * np.pi * (1 - cos_r2)
    m = 50_000
    u2 = rng.random((m, 2)).astype(np.float32)
    cz = 1 - u2[:, 0] * (1 - cos_r2)
    sz = np.sqrt(np.maximum(1 - cz * cz, 0))
    ph = 2 * np.pi * u2[:, 1]
    wd = (
        sun[None, :] * cz[:, None]
        + (t[None, :] * np.cos(ph)[:, None] + b[None, :] * np.sin(ph)[:, None])
        * sz[:, None]
    )
    disk = np.asarray(SK.sun_disk(jnp.asarray(wd), sky))  # [m, 3]
    cos_s = np.maximum(wd[:, 1], 0.0)
    out = out + (albedo / np.pi) * (disk * cos_s[:, None]).mean(0) * omega
    return out


def test_initial_candidates_unbiased(floor_scene, sky):
    gb, cam = _floor_gbuffer(floor_scene)
    cfg = SD.SkyDIConfig(temporal=False, spatial_iterations=0)
    acc = None
    frames = 20
    for i in range(frames):
        res = SD.initial_candidates(gb, sky, 1000 + i, cfg)
        out = np.asarray(SD.shade(floor_scene, res, gb))
        acc = out if acc is None else acc + out
    got = (acc / frames).mean(axis=1)  # mean over pixels
    exp = _quadrature(sky, np.array([0.6, 0.5, 0.4]))
    np.testing.assert_allclose(got, exp, rtol=0.1)


def test_spatial_and_temporal_reuse(floor_scene, sky):
    from zetaray_tpu.scene import Camera

    gb, cam = _floor_gbuffer(floor_scene)
    cfg = SD.SkyDIConfig()
    res = SD.initial_candidates(gb, sky, 7, cfg)
    m0 = np.asarray(res[10])
    # temporal: merge the same reservoirs (static camera); prev planes are
    # the PACKED temporal G-buffer
    from zetaray_tpu.ops.gbuffer_pack import pack_temporal

    res_t = SD.temporal_reuse(
        res, res, pack_temporal(gb), gb, cam, 16, 16, 8, cfg, sky
    )
    m1 = np.asarray(res_t[10])
    assert (m1 >= m0 - 1e-5).all() and m1.mean() > m0.mean() * 1.5
    res_s = SD.spatial_reuse(res_t, gb, 16, 16, 9, cfg)
    assert np.isfinite(np.asarray(res_s)).all()
    assert (np.asarray(res_s[11]) >= 0).all()
    # reuse keeps the estimator consistent on the uniform floor
    out0 = np.asarray(SD.shade(floor_scene, res, gb)).mean()
    out1 = np.asarray(SD.shade(floor_scene, res_s, gb)).mean()
    assert abs(out1 - out0) / max(out0, 1e-9) < 0.35


def test_spatial_pairwise_unbiased(floor_scene, sky):
    """Pairwise-MIS spatial reuse keeps E[shade] on the quadrature value
    (wrong MIS denominators shift the mean even on a uniform scene, since
    the estimator must self-normalize over neighbor strategies)."""
    gb, cam = _floor_gbuffer(floor_scene)
    cfg = SD.SkyDIConfig(
        temporal=False, spatial_iterations=1, spatial_mis="pairwise",
        spatial_neighbors=3,
    )
    acc = None
    frames = 20
    for i in range(frames):
        res = SD.initial_candidates(gb, sky, 2000 + i, cfg)
        res = SD.spatial_reuse(res, gb, 16, 16, 3000 + i, cfg)
        out = np.asarray(SD.shade(floor_scene, res, gb))
        acc = out if acc is None else acc + out
    got = (acc / frames).mean(axis=1)
    exp = _quadrature(sky, np.array([0.6, 0.5, 0.4]))
    np.testing.assert_allclose(got, exp, rtol=0.12)


def test_skydi_frame_end_to_end(cornell_dev):
    """restir_gi + skydi on the (closed) Cornell box: runs, finite, and the
    sky adds only background pixels (the box blocks the dome)."""
    from zetaray_tpu.ops.pathtracer import PTConfig
    from zetaray_tpu.render import RenderConfig
    from zetaray_tpu.render.frame import render_frame_restir_jit
    from zetaray_tpu.scene import Camera

    cam = Camera.look_at((0, 1, 3.5), (0, 1, 0), vfov_deg=45, aspect=1.0)
    cfg = RenderConfig(
        width=64, height=64, mode="restir_gi",
        pt=PTConfig(max_bounces=2, sky=SkyParams()),
        skydi=True, taa=True,
    )
    state = None
    for i in range(3):
        out, state = render_frame_restir_jit(
            cornell_dev, cam, jax.random.PRNGKey(i), cfg, state
        )
    hdr = np.asarray(out["hdr"])
    assert np.isfinite(hdr).all()
    assert hdr.max() > 0
    assert state.sky_reservoirs is not None
