"""Picking + checkpoint/resume tests."""

import numpy as np
import jax
import pytest

from zetaray_tpu.scene import Camera
from zetaray_tpu.render.picking import pick
from zetaray_tpu.utils.checkpoint import save_frame_state, load_frame_state


def test_pick_center_and_miss(cornell_dev, cornell_cpu):
    cam = Camera.look_at((0, 1.0, 3.5), (0, 1.0, 0.0), vfov_deg=45, aspect=1.0)
    r = pick(cornell_dev, cornell_cpu, cam, 32, 32, 64, 64)
    assert r.hit and r.tri >= 0 and r.t > 0
    assert r.instance_name  # Cornell nodes are named
    assert 0 <= r.material < cornell_cpu.materials.base_color.shape[0]
    # a ray through the open front (top-left corner misses the side walls?)
    # use a camera pointing away from the scene for a guaranteed miss
    cam_away = Camera.look_at((0, 1.0, 60.0), (0, 1.0, 120.0), vfov_deg=45, aspect=1.0)
    r2 = pick(cornell_dev, cornell_cpu, cam_away, 0, 0, 8, 8)
    assert not r2.hit and r2.tri == -1


def test_pick_identifies_light(cornell_dev, cornell_cpu):
    # aim straight up under the light
    cam = Camera.look_at(
        (-0.004, 1.2, -0.04), (-0.004, 3.0, -0.04), up=(0, 0, 1),
        vfov_deg=30, aspect=1.0,
    )
    r = pick(cornell_dev, cornell_cpu, cam, 4, 4, 9, 9)
    assert r.hit
    assert r.tri in cornell_cpu.emissive_tris.tolist()
    assert r.instance_name == "Plane"


def test_checkpoint_roundtrip(tmp_path, cornell_dev):
    from zetaray_tpu.render import render_frame_restir, RenderConfig
    from zetaray_tpu.ops.pathtracer import PTConfig

    cam = Camera.look_at((0, 1.0, 3.5), (0, 1.0, 0.0), vfov_deg=45, aspect=1.0)
    cfg = RenderConfig(width=16, height=16, mode="restir_di", pt=PTConfig(max_bounces=1))
    out, state = render_frame_restir(cornell_dev, cam, jax.random.PRNGKey(0), cfg, None)
    p = str(tmp_path / "ckpt.npz")
    save_frame_state(p, state, params_snapshot={"a/b/c": 1.5})
    state2, params = load_frame_state(p)
    assert params == {"a/b/c": 1.5}
    np.testing.assert_array_equal(np.asarray(state.reservoirs), np.asarray(state2.reservoirs))
    np.testing.assert_array_equal(np.asarray(state.history), np.asarray(state2.history))
    # resumed state continues the temporal chain identically
    out_a, _ = render_frame_restir(cornell_dev, cam, jax.random.PRNGKey(1), cfg, state)
    out_b, _ = render_frame_restir(cornell_dev, cam, jax.random.PRNGKey(1), cfg, state2)
    np.testing.assert_allclose(
        np.asarray(out_a["hdr"]), np.asarray(out_b["hdr"]), rtol=1e-6
    )
