"""Where does streaming-traversal occupancy go? (round-5 analysis, CPU)

For the GI-like ray set at N tris, computes:
  - per-RAY cluster-pierce occupancy (the frustum-free floor);
  - subtile occupancy at rt in {32, 64, 128, 256} under the current sort;
  - fraction of subtiles whose rays span >1 direction octant (frustum
    blowup: a mixed-octant subtile's direction box contains 0 on some
    axis, making its interval frustum unbounded);
  - the same under alternate sort keys (direction-major vs origin-major).

Pure numpy on a ray sample -- run anywhere: python tools/analyze_occupancy.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

REPO = Path(__file__).resolve().parents[1]
ASSET = REPO.parent / "reference" / "Assets" / "CornellBox" / "cornell_emissive.gltf"
N_TRIS = int(sys.argv[1]) if len(sys.argv) > 1 else 229_000
SAMPLE = 65_536


def ray_aabb(o, d, lo, hi):
    """Per (ray, box) slab overlap (t in [0, inf)). o,d [n,3]; lo,hi [m,3]."""
    inv = 1.0 / np.where(np.abs(d) < 1e-20, 1e-20, d)
    t0 = (lo[None, :, :] - o[:, None, :]) * inv[:, None, :]
    t1 = (hi[None, :, :] - o[:, None, :]) * inv[:, None, :]
    tn = np.minimum(t0, t1).max(-1)
    tf = np.maximum(t0, t1).min(-1)
    return tf >= np.maximum(tn, 0.0)


def subtile_occ(o, d, lo, hi, rt):
    """Interval-frustum occupancy at subtile size rt (mirrors
    accel.stream._overlap_tnear)."""
    n = o.shape[0]
    rows = n // rt
    oT = o[: rows * rt].reshape(rows, rt, 3)
    dT = d[: rows * rt].reshape(rows, rt, 3)
    olo, ohi = oT.min(1), oT.max(1)
    dlo, dhi = dT.min(1), dT.max(1)
    n_lo = lo[None] - ohi[:, None]  # [rows, m, 3]
    n_hi = hi[None] - olo[:, None]
    zero_in = (dlo[:, None] <= 0) & (dhi[:, None] >= 0)
    b1 = np.where(np.abs(dlo) < 1e-20, 1e-20, dlo)[:, None]
    b2 = np.where(np.abs(dhi) < 1e-20, 1e-20, dhi)[:, None]
    qs = np.stack([n_lo / b1, n_lo / b2, n_hi / b1, n_hi / b2])
    t_lo = np.where(zero_in, -3e38, qs.min(0)).max(-1)
    t_hi = np.where(zero_in, 3e38, qs.max(0)).min(-1)
    ok = t_hi >= np.maximum(t_lo, 0.0)
    mixed = ((dlo < 0) & (dhi > 0)).any(-1)  # any axis direction-mixed
    return ok.mean(), mixed.mean(), ok


def main():
    import jax
    import jax.numpy as jnp

    from zetaray_tpu.scene import Camera, load_scene, upload_scene
    from zetaray_tpu.scene.subdivide import subdivide_scene
    from zetaray_tpu.accel import stream as S
    from zetaray_tpu.accel.intersect import intersect_closest_shaded
    from zetaray_tpu.scene.scene import A as _A

    cpu = subdivide_scene(load_scene(ASSET), N_TRIS)
    sc = upload_scene(cpu)
    aabb = np.asarray(sc.cluster_aabb)
    m = aabb.shape[0]
    lo, hi = aabb[:, 0:3], aabb[:, 3:6]
    print(f"tris={cpu.num_tris} clusters={m}")

    cam = Camera.look_at((0, 1.0, 3.5), (0, 1.0, 0.0), vfov_deg=45, aspect=1.0)
    res = int(np.sqrt(SAMPLE))
    o_pri, d_pri = cam.generate_rays(res, res)
    n = res * res

    sh = jax.jit(lambda o, d: intersect_closest_shaded(sc, o, d))(o_pri, d_pri)
    pos = np.asarray(o_pri) + np.asarray(sh.t)[:, None] * np.asarray(d_pri)
    ngv = np.asarray(sh.attrs[:, _A.NG:_A.NG + 3])
    flip = (np.asarray(d_pri) * ngv).sum(-1) > 0
    ngv = np.where(flip[:, None], -ngv, ngv)
    rng2 = np.random.default_rng(7)
    u1, u2 = rng2.random(n), rng2.random(n)
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    loc = np.stack([r * np.cos(phi), r * np.sin(phi),
                    np.sqrt(np.maximum(1 - u1, 0.0))], -1)
    t_ax = np.cross(ngv, np.where(np.abs(ngv[:, 2:3]) < 0.9,
                                  [0, 0, 1.0], [1.0, 0, 0]))
    t_ax /= np.maximum(np.linalg.norm(t_ax, axis=-1, keepdims=True), 1e-12)
    b_ax = np.cross(ngv, t_ax)
    d_gi = (loc[:, 0:1] * t_ax + loc[:, 1:2] * b_ax + loc[:, 2:3] * ngv)
    valid = np.asarray(sh.valid)
    o_gi = np.where(valid[:, None], pos + ngv * 1e-3, 3.0e7).astype(np.float32)
    d_gi = np.where(valid[:, None], d_gi, [1.0, 0, 0]).astype(np.float32)

    # per-ray floor on a 4k subsample
    sub = np.random.default_rng(1).choice(n, 4096, replace=False)
    pierce = ray_aabb(o_gi[sub], d_gi[sub], lo, hi)
    print(f"per-ray pierce occupancy (floor): {pierce.mean():.4f} "
          f"({pierce.mean() * m:.0f} clusters/ray, {pierce.mean() * m * 256:.0f} tri tests/ray)")

    # current sort
    perm, _ = jax.jit(
        lambda o, d: S._sort_perm(jnp.asarray(o), jnp.asarray(d), sc.cluster_aabb)
    )(o_gi, d_gi)
    perm = np.asarray(perm)
    os_, ds_ = o_gi[perm], d_gi[perm]
    for rt in (32, 64, 128, 256):
        occ, mixed, _ = subtile_occ(os_, ds_, lo, hi, rt)
        print(f"current sort rt={rt:4d}: occ={occ:.4f} ({occ*m:.0f}/subtile)"
              f"  mixed-dir-axis subtiles={mixed:.3f}")

    # alternate key: direction-major (octant | cone | morton)
    def key_dirmajor(o, d, bits_cone=4):
        ctr = 0.5 * (lo + hi)
        mu, sd = ctr.mean(0), ctr.std(0)
        klo = np.maximum(lo.min(0), mu - 2.5 * sd)
        khi = np.minimum(hi.max(0), mu + 2.5 * sd)
        q = np.clip((o - klo) / np.maximum(khi - klo, 1e-6), 0, 1)
        qi = (q * 1023).astype(np.uint64)

        def spread(x):
            x = (x | (x << 16)) & 0x030000FF
            x = (x | (x << 8)) & 0x0300F00F
            x = (x | (x << 4)) & 0x030C30C3
            x = (x | (x << 2)) & 0x09249249
            return x

        morton = (spread(qi[:, 0]) << 2) | (spread(qi[:, 1]) << 1) | spread(qi[:, 2])
        octant = ((d[:, 0] < 0).astype(np.uint64) << 2) | \
                 ((d[:, 1] < 0).astype(np.uint64) << 1) | (d[:, 2] < 0).astype(np.uint64)
        a = np.abs(d)
        s = np.maximum(a.sum(-1), 1e-20)
        half = 1 << (bits_cone // 2)
        du = np.clip(a[:, 1] / s * half, 0, half - 1).astype(np.uint64)
        dv = np.clip(a[:, 2] / s * half, 0, half - 1).astype(np.uint64)
        cone = (du << (bits_cone // 2)) | dv
        return (octant << 40) | (cone << (40 - bits_cone)) | morton

    for bits in (4, 6):
        k = key_dirmajor(o_gi, d_gi, bits)
        p2 = np.argsort(k, kind="stable")
        for rt in (64, 128, 256):
            occ, mixed, _ = subtile_occ(o_gi[p2], d_gi[p2], lo, hi, rt)
            print(f"dir-major cone{bits}b rt={rt:4d}: occ={occ:.4f} "
                  f"({occ*m:.0f}/subtile)  mixed={mixed:.3f}")


if __name__ == "__main__":
    main()
