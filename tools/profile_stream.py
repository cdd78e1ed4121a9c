"""Profile the BVH-cluster streaming traversal on the live chip.

Isolates where the clustered-scene frame time goes (VERDICT r3 #1):
  - raw closest/occlusion stream rate for coherent primary rays;
  - same for incoherent (hemisphere GI / shadow-like) rays;
  - culling efficiency: fraction of (subtile, cluster) pairs visited;
  - the XLA overlap pre-pass cost on its own.

Run on the TPU:  python tools/profile_stream.py [n_tris] [res]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/zetaray_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REPO = Path(__file__).resolve().parents[1]
ASSET = REPO.parent / "reference" / "Assets" / "CornellBox" / "cornell_emissive.gltf"

N_TRIS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
RES = int(sys.argv[2]) if len(sys.argv) > 2 else 256


def timeit(f, *a, reps=10):
    out = f(*a)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, out
    )
    # forced scalar sync (tunnel-safe)
    leaves = jax.tree_util.tree_leaves(out)
    _ = float(jnp.asarray(leaves[0]).astype(jnp.float32).sum())
    t0 = time.time()
    for _ in range(reps):
        out = f(*a)
    leaves = jax.tree_util.tree_leaves(out)
    _ = float(jnp.asarray(leaves[0]).astype(jnp.float32).sum())
    return (time.time() - t0) / reps * 1000.0


def main():
    from zetaray_tpu.scene import Camera, load_scene, upload_scene
    from zetaray_tpu.scene.subdivide import subdivide_scene
    from zetaray_tpu.accel import stream as S

    cpu = subdivide_scene(load_scene(ASSET), N_TRIS)
    sc = upload_scene(cpu)
    assert sc.cluster_aabb is not None
    m = sc.cluster_aabb.shape[0]
    woop3 = sc.woop.reshape(4, 3, -1)
    c = woop3.shape[2] // m
    print(f"tris={cpu.num_tris} clusters={m} c={c} res={RES}")

    cam = Camera.look_at((0, 1.0, 3.5), (0, 1.0, 0.0), vfov_deg=45, aspect=1.0)
    n = RES * RES
    o_pri, d_pri = cam.generate_rays(RES, RES)

    # incoherent set: same surface-ish origins, random unit directions
    key = jax.random.PRNGKey(0)
    o_inc = jnp.asarray(
        np.random.default_rng(0).uniform(-0.9, 0.9, (n, 3)) * np.array([1, 1, 1])
        + np.array([0, 1, 0])
    ).astype(jnp.float32)
    d_inc = jax.random.normal(key, (n, 3))
    d_inc = d_inc / jnp.linalg.norm(d_inc, axis=1, keepdims=True)

    # GI-like set: origins at the primary-hit points (+normal offset proxy),
    # cosine-hemisphere directions -- what restir_gi's secondary rays see
    from zetaray_tpu.accel.intersect import intersect_closest_shaded
    from zetaray_tpu.scene.scene import A as _A

    sh = jax.jit(lambda o, d: intersect_closest_shaded(sc, o, d))(o_pri, d_pri)
    pos = o_pri + np.asarray(sh.t)[:, None] * np.asarray(d_pri)
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
    o_gi = jnp.asarray(np.where(valid[:, None], pos + ngv * 1e-3, 3.0e7),
                       jnp.float32)
    d_gi = jnp.asarray(np.where(valid[:, None], d_gi, [1.0, 0, 0]),
                       jnp.float32)

    sets = {"primary": (o_pri, d_pri), "incoherent": (o_inc, d_inc),
            "gi": (o_gi, d_gi)}

    # culling efficiency (pre-pass mask occupancy) on the SORTED rays --
    # what the kernel actually sees
    rs, rt = S._pick_rs(n)
    for name, (o, d) in sets.items():
        def occf(o, d):
            perm, _ = S._sort_perm(o, d, sc.cluster_aabb)
            return S._overlap_mask(o[perm], d[perm], sc.cluster_aabb, rt, S.INF)
        mask = jax.jit(occf)(o, d)
        occ = float(jnp.mean(mask.astype(jnp.float32)))
        print(f"mask occupancy {name} (sorted): {occ:.4f} ({occ*m:.0f}/{m} clusters/subtile)")

    f_mask = jax.jit(lambda o, d: S._overlap_mask(o, d, sc.cluster_aabb, rt, S.INF))
    print(f"overlap prepass ms: {timeit(f_mask, o_pri, d_pri):.3f}")

    f_closest = jax.jit(
        lambda o, d: S.closest_hit_stream(
            woop3, sc.woop_stream, sc.cluster_aabb, o, d
        )
    )
    f_occl = jax.jit(
        lambda o, d: S.occlusion_stream(
            sc.woop_stream, sc.cluster_aabb, o, d
        )
    )

    for name, (o, d) in sets.items():
        ms = timeit(f_closest, o, d)
        print(f"closest {name}: {ms:.3f} ms  ({n/ms/1e3:.2f} Mrays/s)")
        ms = timeit(f_occl, o, d)
        print(f"occlusion {name}: {ms:.3f} ms  ({n/ms/1e3:.2f} Mrays/s)")


if __name__ == "__main__":
    main()
