"""PreLighting: GPU emissive-power estimation + light voxel grid.

Counterpart of the reference's PreLighting pass (PreLighting.h:20-128):

- ``estimate_tri_power``: per-emissive-triangle power integrating the
  emissive *texture* over the triangle (EstimateTriEmissivePower.hlsl:
  64 Halton samples per triangle, luminance * area * pi). Runs on device;
  the host then rebuilds the alias table from the readback exactly like the
  reference's GPU->readback->CPU AliasTable_Build->upload round trip
  (PreLighting.cpp:354-359, 483-546; SURVEY.md section 3.5).

- ``build_light_voxel_grid``: camera-space voxel grid of stochastic light
  reservoirs for many-light sampling (BuildLightVoxelGrid.hlsl,
  LightVoxelGrid.hlsli:6-55). Each of the V*K (voxel, slot) reservoirs runs
  weighted RIS over NUM_CANDIDATES alias-table samples with target
  luminance(Le)/dist(voxel_center)^2, culling lights that face away from
  the whole voxel; the stored pdf is target / (voxel-mean RIS weight), an
  effective area-measure pdf (the reference stores the same, r.pdf).
  Everything is one vectorized [V*K] jnp pass -- voxels are lanes, the
  candidate loop is unrolled (C=6), matching the reference's one-thread-
  per-slot dispatch without any groupshared reduction (the voxel mean is a
  segment mean over K*C lanes).

Grid mapping difference vs the reference: LightVoxelGrid.hlsli uses a
symmetric index mapping around the camera in all three axes; here the grid
is a regular camera-space lattice centered in x/y and extending only
*forward* in z (rays behind the camera can't receive reservoirs anyway),
which spends all V voxels on visible space.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..core import vec3 as v3
from ..core.rng import uniform4
from ..core.sampling import sample_alias, square_to_triangle, halton
from ..scene.scene import A, EA

_LUM = (0.2126, 0.7152, 0.0722)


def _luminance(r, g, b):
    return _LUM[0] * r + _LUM[1] * g + _LUM[2] * b


# ---------------------------------------------------------------------------
# EstimateTriEmissivePower
# ---------------------------------------------------------------------------


def estimate_tri_power(scene, texmaps=None, n_samples: int = 64):
    """[E] per-emissive-triangle power (luminance * area * pi), integrating
    the emissive texture when the material has one.

    Returns (powers [E] f32, mean_rgb [E, 3] f32): mean_rgb is the mean
    texture modulation over the triangle (ones when untextured), used to
    scale the light-sampling radiance EA.LE so NEE sees the same energy the
    power estimate counted. Jittable; E = scene.num_emissives (static).
    """
    e = scene.num_emissives
    if e == 0:
        return jnp.zeros((0,)), jnp.zeros((0, 3))
    etri = jnp.maximum(scene.em_tri[:e], 0)
    e1 = scene.e1[etri]
    e2 = scene.e2[etri]
    area = 0.5 * jnp.linalg.norm(jnp.cross(e1, e2), axis=-1)
    le = scene.tri_attrs[etri, A.EMISS : A.EMISS + 3]  # factor * strength

    mean_rgb = jnp.ones((e, 3))
    if texmaps and texmaps.get("emissive"):
        from ..scene.textures import sample_bilinear

        # fixed low-discrepancy sample points, shared by every triangle
        # (the reference's g_halton buffer, EstimateTriEmissivePower.hlsl)
        pts = np.stack(
            [halton(np.arange(1, n_samples + 1), 0),
             halton(np.arange(1, n_samples + 1), 1)], axis=-1,
        )
        bary = square_to_triangle(jnp.asarray(pts, jnp.float32))  # [S, 2]
        uv0 = scene.uv0[etri]
        uv1 = scene.uv1[etri]
        uv2 = scene.uv2[etri]
        b1 = bary[None, :, 0]
        b2 = bary[None, :, 1]
        w0 = 1.0 - b1 - b2
        uv = (
            w0[..., None] * uv0[:, None, :]
            + b1[..., None] * uv1[:, None, :]
            + b2[..., None] * uv2[:, None, :]
        )  # [E, S, 2]
        mat = scene.mat_id[etri]
        ids = jnp.asarray(texmaps["ids"]["emissive"])
        tex_of = ids[mat]  # [E]
        acc = jnp.ones((e, 3))
        for idx, mips in sorted(texmaps["emissive"].items()):
            rgba = sample_bilinear(mips[0], uv.reshape(-1, 2)).reshape(e, n_samples, 4)
            m = rgba[..., :3].mean(axis=1)
            acc = jnp.where((tex_of == idx)[:, None], m, acc)
        mean_rgb = acc

    lum = _luminance(
        le[:, 0] * mean_rgb[:, 0],
        le[:, 1] * mean_rgb[:, 1],
        le[:, 2] * mean_rgb[:, 2],
    )
    return jnp.maximum(lum * area * jnp.pi, 0.0), mean_rgb


def apply_tri_powers(scene, powers, mean_rgb=None):
    """Host step: rebuild the emissive alias table from device-estimated
    powers and return an updated SceneBuffers (the reference's
    EmissiveTriangleAliasTable node, PreLighting.h:97-128).

    ``mean_rgb``: optional [E, 3] texture modulation folded into the
    light-sampling radiance (EA.LE) so NEE matches the counted power.
    """
    from dataclasses import replace

    from ..core.sampling import build_alias_table

    e = scene.num_emissives
    if e == 0:
        return scene
    p = np.maximum(np.asarray(powers, np.float64), 0.0)
    prob, alias, pdf = build_alias_table(p)
    ep = scene.em_prob.shape[0]

    def pad(x, fill=0.0):
        out = np.full((ep,), fill, np.float32)
        out[:e] = x
        return jnp.asarray(out)

    em_area = np.asarray(scene.em_area[:e])
    pdf_area = (pdf / np.maximum(em_area, 1e-12)).astype(np.float32)
    em_attrs = np.array(scene.em_attrs)  # writable copy
    em_attrs[:e, EA.PDF_AREA] = pdf_area
    if mean_rgb is not None:
        em_attrs[:e, EA.LE : EA.LE + 3] *= np.asarray(mean_rgb, np.float32)
    tri_attrs = scene.tri_attrs
    etri = np.asarray(scene.em_tri[:e])
    tri_attrs = tri_attrs.at[etri, A.EM_PDF_AREA].set(jnp.asarray(pdf_area))
    return replace(
        scene,
        em_prob=pad(prob),
        em_alias=jnp.asarray(
            np.concatenate([alias.astype(np.int32),
                            np.zeros(ep - e, np.int32)])
        ),
        em_pdf=pad(pdf),
        em_attrs=jnp.asarray(em_attrs),
        tri_attrs=tri_attrs,
        em_power=jnp.asarray(float(p.sum()), jnp.float32),
    )


# ---------------------------------------------------------------------------
# Light voxel grid
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class LVGConfig:
    """Grid defaults follow the reference (DefaultRendererImpl.h:42-43:
    32x8x40 voxels of extents (0.6, 0.45, 0.6); 64 slots -- here K is
    smaller because every pixel merges an *extra* reservoir rather than
    replacing its candidate stream)."""

    dim: tuple = (32, 8, 40)  # voxels in camera-space (x, y, z-forward)
    extents: tuple = (0.6, 0.45, 0.6)  # per-voxel half extents
    slots: int = 8  # reservoirs per voxel (K)
    candidates: int = 6  # RIS candidates per slot (NUM_CANDIDATES)
    offset_y: float = 0.1


LVG_ROWS = 16  # same layout as megakernel LSET rows: pos|ng|Le|pdf|two_sided


def _to_cam(p, camera):
    rel_x = p[..., 0] - camera.eye[0]
    rel_y = p[..., 1] - camera.eye[1]
    rel_z = p[..., 2] - camera.eye[2]
    r, u, f = camera.right, camera.up, camera.forward
    return jnp.stack(
        [
            rel_x * r[0] + rel_y * r[1] + rel_z * r[2],
            rel_x * u[0] + rel_y * u[1] + rel_z * u[2],
            rel_x * f[0] + rel_y * f[1] + rel_z * f[2],
        ],
        axis=-1,
    )


def voxel_of_position(p, camera, cfg: LVGConfig):
    """World positions [..., 3] -> (flat voxel index [...], in_grid mask).

    LightVoxelGrid.hlsli MapPosToVoxel equivalent for the forward-z lattice.
    """
    pc = _to_cam(p, camera)
    dx, dy, dz = cfg.dim
    ex, ey, ez = cfg.extents
    ix = jnp.floor((pc[..., 0] + dx * ex) / (2 * ex)).astype(jnp.int32)
    iy = jnp.floor((pc[..., 1] - cfg.offset_y + dy * ey) / (2 * ey)).astype(jnp.int32)
    iz = jnp.floor(pc[..., 2] / (2 * ez)).astype(jnp.int32)
    inside = (
        (ix >= 0) & (ix < dx) & (iy >= 0) & (iy < dy) & (iz >= 0) & (iz < dz)
    )
    flat = (iz * dy + iy) * dx + ix
    return jnp.where(inside, flat, 0), inside


def _voxel_centers(camera, cfg: LVGConfig):
    """[V, 3] world-space voxel centers (+ [3] world half-extents axes)."""
    dx, dy, dz = cfg.dim
    ex, ey, ez = cfg.extents
    ix = jnp.arange(dx)
    iy = jnp.arange(dy)
    iz = jnp.arange(dz)
    cx = (ix + 0.5) * 2 * ex - dx * ex
    cy = (iy + 0.5) * 2 * ey - dy * ey + cfg.offset_y
    cz = (iz + 0.5) * 2 * ez
    # flat order matches voxel_of_position: (z, y, x)
    gz, gy, gx = jnp.meshgrid(cz, cy, cx, indexing="ij")
    cam = jnp.stack([gx.ravel(), gy.ravel(), gz.ravel()], -1)  # [V, 3]
    r = jnp.asarray(camera.right)
    u = jnp.asarray(camera.up)
    f = jnp.asarray(camera.forward)
    eye = jnp.asarray(camera.eye)
    world = eye + cam[:, :1] * r + cam[:, 1:2] * u + cam[:, 2:3] * f
    return world, (r * ex, u * ey, f * ez)


def build_light_voxel_grid(scene, camera, seed, cfg: LVGConfig = LVGConfig()):
    """Per-frame LVG build -> [V*K, LVG_ROWS] reservoir rows.

    Row layout matches the megakernel's presampled-set rows so consumers
    share code: 0-2 light pos, 3-5 light normal, 6-8 Le, 9 effective
    pdf_area, 10 two_sided flag (pdf_area == 0 marks an empty reservoir).
    """
    e = scene.num_emissives
    v = int(np.prod(cfg.dim))
    k = cfg.slots
    n = v * k
    if e == 0:
        return jnp.zeros((n, LVG_ROWS))

    centers, axes = _voxel_centers(camera, cfg)  # [V, 3]
    ctr = jnp.repeat(centers, k, axis=0)  # [V*K, 3]
    ids = jnp.arange(n, dtype=jnp.int32)

    prob = scene.em_prob[:e]
    alias = scene.em_alias[:e]
    pdf_sel = scene.em_pdf[:e]

    # 8 voxel corners in world space, [V*K, 8, 3]
    ax, ay, az = axes
    signs = jnp.asarray(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        jnp.float32,
    )  # [8, 3]
    corners = (
        ctr[:, None, :]
        + signs[None, :, 0:1] * ax[None, None, :]
        + signs[None, :, 1:2] * ay[None, None, :]
        + signs[None, :, 2:3] * az[None, None, :]
    )

    # reservoir state, vectorized over [V*K]
    r_rows = jnp.zeros((LVG_ROWS, n))
    w_sum = jnp.zeros((n,))
    target_z = jnp.zeros((n,))
    count = jnp.zeros((n,))

    for c in range(cfg.candidates):
        u = uniform4(ids, c, seed, salt=0x17C0)
        u2 = uniform4(ids, c, seed, salt=0x17C1)
        idx = sample_alias(prob, alias, u[0], u[1])  # [N] in [0, E)
        row = scene.em_attrs[idx]  # [N, EA.WIDTH]
        v0 = row[:, EA.V0 : EA.V0 + 3]
        e1_ = row[:, EA.E1 : EA.E1 + 3]
        e2_ = row[:, EA.E2 : EA.E2 + 3]
        ng = row[:, EA.NG : EA.NG + 3]
        le = row[:, EA.LE : EA.LE + 3]
        two = row[:, EA.TWO_SIDED]
        bary = square_to_triangle(jnp.stack([u[2], u[3]], -1))
        lp = v0 + bary[:, :1] * e1_ + bary[:, 1:2] * e2_
        area = 0.5 * jnp.linalg.norm(jnp.cross(e1_, e2_), axis=-1)
        pdf_a = pdf_sel[idx] / jnp.maximum(area, 1e-12)

        # backface cull: light must face at least one voxel corner
        # (BuildLightVoxelGrid.hlsl IsBackfacing), unless two-sided or the
        # light sits inside the voxel
        facing = (
            jnp.einsum("nck,nk->nc", corners - lp[:, None, :], ng) > 0.0
        ).any(axis=1)
        d_cam = _to_cam(lp, camera) - _to_cam(ctr, camera)
        inside = (
            (jnp.abs(d_cam[:, 0]) <= cfg.extents[0])
            & (jnp.abs(d_cam[:, 1]) <= cfg.extents[1])
            & (jnp.abs(d_cam[:, 2]) <= cfg.extents[2])
        )
        ok = (two > 0.5) | facing | inside

        t2 = jnp.maximum(jnp.sum((lp - ctr) ** 2, -1), 1e-6)
        target = _luminance(le[:, 0], le[:, 1], le[:, 2]) / t2
        target = jnp.where(ok, target, 0.0)
        w = target / jnp.maximum(pdf_a, 1e-9)
        w_sum = w_sum + w
        count = count + ok.astype(jnp.float32)

        take = u2[0] * jnp.maximum(w_sum, 1e-12) < w
        cand = jnp.concatenate(
            [lp, ng, le, pdf_a[:, None], two[:, None],
             jnp.zeros((n, LVG_ROWS - 11))], axis=1,
        ).T  # [LVG_ROWS, N]
        r_rows = jnp.where(take[None, :], cand, r_rows)
        target_z = jnp.where(take, target, target_z)

    # voxel-mean RIS weight over all K slots x C candidates
    w_vox = w_sum.reshape(v, k).sum(axis=1)
    c_vox = count.reshape(v, k).sum(axis=1)
    w_mean = jnp.repeat(
        w_vox / jnp.maximum(c_vox, 1.0), k
    )
    pdf_eff = jnp.where(w_mean > 0, target_z / jnp.maximum(w_mean, 1e-12), 0.0)
    out = r_rows.T  # [N, LVG_ROWS]
    return out.at[:, 9].set(pdf_eff)


def sample_lvg_at(lvg, p, ok, camera, seed, cfg: LVGConfig, salt=0x51AB):
    """LVG light candidate at arbitrary positions ``p`` [N, 3]:
    (rows [LSET-layout, N], valid [N]).

    Jitters the lookup position by the voxel extents (LightVoxelGrid.hlsli
    Sample) and picks a uniform slot. pdf_area == 0 or off-grid positions
    return valid=False (callers fall back to their other candidates).
    """
    n = p.shape[0]
    pix = jnp.arange(n, dtype=jnp.int32)
    u = uniform4(pix, 0, seed, salt=salt)
    ex = jnp.asarray(cfg.extents)
    jit = (jnp.stack(u[0:3], -1) * 2.0 - 1.0) * ex[None, :]
    r = jnp.asarray(camera.right)
    up = jnp.asarray(camera.up)
    f = jnp.asarray(camera.forward)
    pj = p + jit[:, 0:1] * r + jit[:, 1:2] * up + jit[:, 2:3] * f
    vox, inside = voxel_of_position(pj, camera, cfg)
    slot = jnp.minimum((u[3] * cfg.slots).astype(jnp.int32), cfg.slots - 1)
    rows = lvg[vox * cfg.slots + slot]  # [N, LVG_ROWS]
    valid = inside & (rows[:, 9] > 0.0) & ok
    return rows.T, valid


def sample_lvg(lvg, gbuf, camera, seed, cfg: LVGConfig, salt=0x51AB):
    """Per-pixel LVG light candidate at the G-buffer hit points (see
    :func:`sample_lvg_at`)."""
    from ..accel.megakernel import G

    p = jnp.stack([gbuf[G.POS], gbuf[G.POS + 1], gbuf[G.POS + 2]], -1)
    return sample_lvg_at(lvg, p, gbuf[G.VALID] > 0.5, camera, seed, cfg,
                         salt=salt)
