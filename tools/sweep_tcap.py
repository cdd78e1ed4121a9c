"""Sweep the two-phase traversal cap on the live chip (round-5 tuning).

Measures closest_hit_stream for the GI-like ray set at 229k tris with
t_cap = 0 (single phase) and a range of caps, plus phase-1 mask occupancy
per cap. Run: python tools/sweep_tcap.py [n_tris] [res]
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

N_TRIS = int(sys.argv[1]) if len(sys.argv) > 1 else 229_000
RES = int(sys.argv[2]) if len(sys.argv) > 2 else 256


def timeit(f, *a, reps=10):
    out = f(*a)
    _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32).sum())
    t0 = time.time()
    for _ in range(reps):
        out = f(*a)
    _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32).sum())
    return (time.time() - t0) / reps * 1000.0


def main():
    from zetaray_tpu.scene import Camera, load_scene, upload_scene
    from zetaray_tpu.scene.subdivide import subdivide_scene
    from zetaray_tpu.accel import stream as S
    from zetaray_tpu.accel.intersect import intersect_closest_shaded
    from zetaray_tpu.scene.scene import A as _A

    cpu = subdivide_scene(load_scene(ASSET), N_TRIS)
    sc = upload_scene(cpu)
    m = sc.cluster_aabb.shape[0]
    woop3 = sc.woop.reshape(4, 3, -1)
    print(f"tris={cpu.num_tris} clusters={m} stream_tcap={sc.stream_tcap:.3f}")

    cam = Camera.look_at((0, 1.0, 3.5), (0, 1.0, 0.0), vfov_deg=45, aspect=1.0)
    n = RES * RES
    o_pri, d_pri = cam.generate_rays(RES, RES)

    # GI-like set (see tools/profile_stream.py)
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
    o_gi = jnp.asarray(np.where(valid[:, None], pos + ngv * 1e-3, 3.0e7), jnp.float32)
    d_gi = jnp.asarray(np.where(valid[:, None], d_gi, [1.0, 0, 0]), jnp.float32)

    rs, rt = S._pick_rs(n)

    sets = {"primary": (o_pri, d_pri), "gi": (o_gi, d_gi)}
    for name, (o, d) in sets.items():
        base = None
        for cap in (0.0, 0.5, 1.0, 2.0, 4.0, float(sc.stream_tcap)):
            f = jax.jit(lambda o, d, cap=cap: S.closest_hit_stream(
                woop3, sc.woop_stream, sc.cluster_aabb, o, d, t_cap=cap))
            # phase-1 occupancy + unresolved fraction at this cap
            def occf(o, d, cap=cap):
                perm, _ = S._sort_perm(o, d, sc.cluster_aabb)
                tm = cap if cap > 0.0 else S.INF
                mk = S._overlap_mask(o[perm], d[perm], sc.cluster_aabb, rt, tm)
                return mk
            mk = jax.jit(occf)(o, d)
            occ = float(jnp.mean(mk.astype(jnp.float32)))
            t, tri, u, v = f(o, d)
            unres = float(jnp.mean(((tri < 0) if cap == 0 else (t >= S.INF)).astype(jnp.float32)))
            ms = timeit(f, o, d)
            if base is None:
                base = ms
            print(f"{name} cap={cap:6.2f}: {ms:8.3f} ms ({n/ms/1e3:6.2f} Mrays/s)"
                  f"  occ1={occ:.4f}  speedup={base/ms:4.2f}x")


if __name__ == "__main__":
    main()
