"""Dynamic scenes: glTF animation sampling, device refit, motion vectors.

Reference parity: SceneCore's per-frame animation -> transform update task
(SceneCore.cpp:102, SceneCore.h:239-351) and the TLAS/BLAS refit path
(RtAccelerationStructure.h:83-110); motion vectors from the per-instance
previous transform (RtCommon.h:47-63 MeshInstance).
"""

import base64
import json

import numpy as np
import pytest

from tests.conftest import CORNELL_EMISSIVE


# ---------------------------------------------------------------------------
# Sampler semantics (glTF 2.0 3.11)
# ---------------------------------------------------------------------------


def _chan(path, times, values, interp):
    from zetaray_tpu.scene.gltf import GltfChannel

    return GltfChannel(
        node=0, path=path, times=np.asarray(times, np.float32),
        values=np.asarray(values, np.float32), interpolation=interp,
    )


def test_sampler_linear_and_clamp():
    from zetaray_tpu.scene.animation import sample_channel

    ch = _chan("translation", [0.0, 1.0, 3.0], [[0, 0, 0], [2, 0, 0], [2, 4, 0]],
               "LINEAR")
    np.testing.assert_allclose(sample_channel(ch, 0.5), [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(sample_channel(ch, 2.0), [2, 2, 0], atol=1e-6)
    # clamped outside the keyframe range
    np.testing.assert_allclose(sample_channel(ch, -1.0), [0, 0, 0])
    np.testing.assert_allclose(sample_channel(ch, 99.0), [2, 4, 0])


def test_sampler_step():
    from zetaray_tpu.scene.animation import sample_channel

    ch = _chan("scale", [0.0, 1.0], [[1, 1, 1], [3, 3, 3]], "STEP")
    np.testing.assert_allclose(sample_channel(ch, 0.999), [1, 1, 1])
    np.testing.assert_allclose(sample_channel(ch, 1.0), [3, 3, 3])


def test_sampler_rotation_slerp():
    from zetaray_tpu.scene.animation import sample_channel

    # identity -> 90 deg about z; halfway must be 45 deg (slerp, not lerp)
    q0 = [0, 0, 0, 1]
    q1 = [0, 0, np.sin(np.pi / 4), np.cos(np.pi / 4)]
    ch = _chan("rotation", [0.0, 1.0], [q0, q1], "LINEAR")
    q = sample_channel(ch, 0.5)
    np.testing.assert_allclose(np.linalg.norm(q), 1.0, atol=1e-7)
    np.testing.assert_allclose(q[2], np.sin(np.pi / 8), atol=1e-6)
    np.testing.assert_allclose(q[3], np.cos(np.pi / 8), atol=1e-6)


def test_sampler_cubicspline_hermite():
    from zetaray_tpu.scene.animation import sample_channel

    # keys [K, 3, C]: (in-tangent, value, out-tangent); zero tangents give
    # the smoothstep-weighted blend of the two values
    vals = np.zeros((2, 3, 3), np.float32)
    vals[0, 1] = [0, 0, 0]
    vals[1, 1] = [1, 0, 0]
    ch = _chan("translation", [0.0, 2.0], vals, "CUBICSPLINE")
    np.testing.assert_allclose(sample_channel(ch, 1.0)[0], 0.5, atol=1e-6)
    np.testing.assert_allclose(sample_channel(ch, 0.5)[0], 0.15625, atol=1e-6)


# ---------------------------------------------------------------------------
# Animated glTF end-to-end
# ---------------------------------------------------------------------------


def _animated_gltf(tmp_path):
    """Tiny scene: emissive ceiling quad + floor + a unit quad 'flag' whose
    node is animated (translation LINEAR 0->+1x over 1s)."""
    pos = np.array(
        [[-0.5, -0.5, 0], [0.5, -0.5, 0], [0.5, 0.5, 0], [-0.5, 0.5, 0]],
        np.float32,
    )
    idx = np.array([0, 1, 2, 0, 2, 3], np.uint16)
    times = np.array([0.0, 1.0], np.float32)
    vals = np.array([[0, 1, 0], [1, 1, 0]], np.float32)
    blob = pos.tobytes() + idx.tobytes() + times.tobytes() + vals.tobytes()
    uri = "data:application/octet-stream;base64," + base64.b64encode(blob).decode()
    o_idx = pos.nbytes
    o_t = o_idx + idx.nbytes
    o_v = o_t + times.nbytes
    doc = {
        "asset": {"version": "2.0"},
        "buffers": [{"uri": uri, "byteLength": len(blob)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": pos.nbytes},
            {"buffer": 0, "byteOffset": o_idx, "byteLength": idx.nbytes},
            {"buffer": 0, "byteOffset": o_t, "byteLength": times.nbytes},
            {"buffer": 0, "byteOffset": o_v, "byteLength": vals.nbytes},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 6, "type": "SCALAR"},
            {"bufferView": 2, "componentType": 5126, "count": 2, "type": "SCALAR"},
            {"bufferView": 3, "componentType": 5126, "count": 2, "type": "VEC3"},
        ],
        "meshes": [
            {"primitives": [{"attributes": {"POSITION": 0}, "indices": 1,
                             "material": 0}]},
            {"primitives": [{"attributes": {"POSITION": 0}, "indices": 1,
                             "material": 1}]},
        ],
        "materials": [
            {"name": "white", "pbrMetallicRoughness":
                {"baseColorFactor": [0.8, 0.8, 0.8, 1], "metallicFactor": 0,
                 "roughnessFactor": 0.8}},
            {"name": "light", "emissiveFactor": [1, 1, 1], "doubleSided": True,
             "extensions": {"KHR_materials_emissive_strength":
                            {"emissiveStrength": 10.0}}},
        ],
        "nodes": [
            # floor: quad rotated flat, scaled 4x
            {"mesh": 0, "name": "floor",
             "rotation": [-0.7071068, 0, 0, 0.7071068], "scale": [4, 4, 1]},
            # light: flat quad near the top, facing down
            {"mesh": 1, "name": "light", "translation": [0, 2, 0],
             "rotation": [0.7071068, 0, 0, 0.7071068]},
            # flag: vertical quad, animated
            {"mesh": 0, "name": "flag", "translation": [0, 1, 0]},
        ],
        "scenes": [{"nodes": [0, 1, 2]}],
        "scene": 0,
        "animations": [
            {"name": "slide",
             "samplers": [{"input": 2, "output": 3, "interpolation": "LINEAR"}],
             "channels": [{"sampler": 0,
                           "target": {"node": 2, "path": "translation"}}]}
        ],
    }
    p = tmp_path / "anim.gltf"
    p.write_text(json.dumps(doc))
    return p


def test_parse_and_rig(tmp_path):
    from zetaray_tpu.scene import AnimationRig, load_gltf

    doc = load_gltf(_animated_gltf(tmp_path))
    assert len(doc.animations) == 1
    assert doc.animations[0].channels[0].path == "translation"
    assert abs(doc.animations[0].duration - 1.0) < 1e-6
    rig = AnimationRig(doc)
    assert rig.animated
    w0 = rig.instance_worlds(0.0)
    w1 = rig.instance_worlds(1.0, loop=False)
    # flag is instance 2 (scene order)
    np.testing.assert_allclose(w1[2, 0, 3] - w0[2, 0, 3], 1.0, atol=1e-6)
    np.testing.assert_allclose(w1[0], w0[0])  # floor static


def test_refit_matches_fresh_bake(tmp_path):
    """Device refit to time t must match numpy-rebaking the scene at t."""
    import jax

    from zetaray_tpu.scene import (
        AnimationRig, load_gltf, load_scene, refit_scene, transform_deltas,
        upload_scene,
    )

    doc = load_gltf(_animated_gltf(tmp_path))
    cpu = load_scene(doc)
    sc = upload_scene(cpu)
    rig = AnimationRig(doc)
    t = 0.75
    dp, dn = rig.deltas(t, loop=False)
    sc_t = jax.jit(refit_scene)(sc, dp, dn)
    # rebake on host: transform flag triangles by the delta
    iid = cpu.inst_id
    d = np.asarray(dp[2])
    v0_exp = cpu.v0.copy()
    v0_exp[iid == 2] = cpu.v0[iid == 2] @ d[:, :3].T + d[:, 3]
    got = np.asarray(sc_t.v0)[: cpu.num_tris]
    np.testing.assert_allclose(got, v0_exp, atol=1e-5)
    # Woop transforms: refit == fresh numpy build on the moved verts
    from zetaray_tpu.scene.scene import _woop_matrices

    t_pad = np.asarray(sc_t.v0).shape[0]
    v0p = np.zeros((t_pad, 3), np.float32)
    v0p[: cpu.num_tris] = v0_exp
    v1p = v0p + np.asarray(sc_t.e1)
    v2p = v0p + np.asarray(sc_t.e2)
    woop_exp = _woop_matrices(v0p, v1p, v2p)
    np.testing.assert_allclose(np.asarray(sc_t.woop), woop_exp, atol=2e-4)
    # emissive table positions follow (light is static here: unchanged)
    np.testing.assert_allclose(
        np.asarray(sc_t.em_attrs), np.asarray(sc.em_attrs), atol=1e-5
    )


def test_refit_identity_cornell(cornell_dev):
    import jax

    from zetaray_tpu.scene import refit_scene, transform_deltas

    n_inst = int(np.asarray(cornell_dev.inst_id).max()) + 1
    eye = np.tile(np.eye(4), (n_inst, 1, 1))
    dp, dn = transform_deltas(eye, eye)
    sc2 = jax.jit(refit_scene)(cornell_dev, dp, dn)
    np.testing.assert_allclose(
        np.asarray(sc2.woop), np.asarray(cornell_dev.woop), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(sc2.tri_attrs), np.asarray(cornell_dev.tri_attrs), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(sc2.world_lo), np.asarray(cornell_dev.world_lo), atol=1e-5
    )


def test_refit_clustered(tmp_path):
    """Refit updates cluster AABBs so the streaming traversal stays correct."""
    import jax

    from zetaray_tpu.scene import (
        AnimationRig, load_gltf, load_scene, refit_scene, upload_scene,
    )

    doc = load_gltf(_animated_gltf(tmp_path))
    cpu = load_scene(doc)
    sc = upload_scene(cpu, cluster_size=2)  # force the streaming path
    assert sc.cluster_aabb is not None
    rig = AnimationRig(doc)
    dp, dn = rig.deltas(1.0, loop=False)
    sc_t = refit_scene(sc, dp, dn)
    aabb = np.asarray(sc_t.cluster_aabb)
    v0 = np.asarray(sc_t.v0)
    iid = np.asarray(sc_t.inst_id)
    m, c = aabb.shape[0], v0.shape[0] // aabb.shape[0]
    for k in range(m):
        sl = slice(k * c, (k + 1) * c)
        mask = iid[sl] >= 0
        if not mask.any():
            continue
        pts = np.concatenate([
            v0[sl][mask],
            (v0 + np.asarray(sc_t.e1))[sl][mask],
            (v0 + np.asarray(sc_t.e2))[sl][mask],
        ])
        assert (pts >= aabb[k, 0:3] - 1e-4).all()
        assert (pts <= aabb[k, 3:6] + 1e-4).all()


def test_motion_vectors_and_temporal(tmp_path):
    """Animated frames with motion table: _prev_positions lands on the
    previous-frame hit position, and the restir frame runs end to end."""
    import jax
    import jax.numpy as jnp

    from zetaray_tpu.render import RenderConfig
    from zetaray_tpu.render.frame import _prev_positions, render_frame_restir_jit
    from zetaray_tpu.accel.megakernel import G, gbuffer
    from zetaray_tpu.ops.pathtracer import PTConfig
    from zetaray_tpu.scene import (
        AnimationRig, Camera, load_gltf, load_scene, refit_scene,
        transform_deltas, upload_scene,
    )

    doc = load_gltf(_animated_gltf(tmp_path))
    cpu = load_scene(doc)
    sc = upload_scene(cpu)
    rig = AnimationRig(doc)
    cam = Camera.look_at((0, 1.0, 4.0), (0, 1.0, 0.0), vfov_deg=45, aspect=1.0)

    t0, t1 = 0.0, 0.5
    w_t0 = rig.instance_worlds(t0, loop=False)
    w_t1 = rig.instance_worlds(t1, loop=False)
    sc1 = refit_scene(sc, *rig.deltas(t1, loop=False))
    o, d = cam.generate_rays(64, 64)
    gb = gbuffer(sc1, o, d, interpret=True)
    motion, _ = transform_deltas(w_t1, w_t0)  # curr -> prev
    p_prev = np.asarray(_prev_positions(gb, jnp.asarray(motion)))
    inst = np.asarray(gb[G.INST])
    p = np.asarray(gb[G.POS : G.POS + 3]).T
    flag = inst == 2
    assert flag.any()
    # flag moved +0.5x between t0 and t1 -> prev position is 0.5 behind
    np.testing.assert_allclose(p_prev[flag, 0], p[flag, 0] - 0.5, atol=1e-5)
    static = inst == 0
    np.testing.assert_allclose(p_prev[static], p[static], atol=1e-6)

    # full animated restir_di frame loop with refit + motion
    cfg = RenderConfig(width=64, height=64, mode="restir_di",
                       pt=PTConfig(max_bounces=2), taa=True)
    state = None
    w_prev = rig.instance_worlds(0.0)
    for i in range(3):
        t = 0.25 * i
        w_curr = rig.instance_worlds(t)
        sc_t = refit_scene(sc, *rig.deltas(t))
        mo, _ = transform_deltas(w_curr, w_prev)
        out, state = render_frame_restir_jit(
            sc_t, cam, jax.random.PRNGKey(i), cfg, state,
            motion=jnp.asarray(mo),
        )
        w_prev = w_curr
    hdr = np.asarray(out["hdr"])
    assert np.isfinite(hdr).all()
    assert hdr.max() > 0
