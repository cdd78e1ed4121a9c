"""Interactive viewer/editor (gui package): drive every endpoint headless.

The reference's editor is ImGui over the swapchain (GuiPass.cpp:343-589);
ours is a local web app. These tests run the real render loop (pt mode,
tiny frame) with the real HTTP server on an ephemeral port and exercise
the same surfaces the page uses: param tree, viewport PNG, stats, pick,
camera orbit, graph dump, quit.
"""

import json
import threading
import urllib.request

import numpy as np
import pytest

from conftest import CORNELL_EMISSIVE


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=30) as r:
        return r.status, r.read(), dict(r.headers)


def _post(port, path, obj):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=json.dumps(obj).encode(),
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.status, json.loads(r.read())


@pytest.fixture(scope="module")
def gui():
    if not CORNELL_EMISSIVE.exists():
        pytest.skip("Cornell asset not available")
    from zetaray_tpu.gui import Viewer, make_server
    from zetaray_tpu.ops.pathtracer import PTConfig
    from zetaray_tpu.render import RenderConfig
    from zetaray_tpu.utils.params import registry

    # tiny + pt mode: fast CPU compile; the endpoints are mode-agnostic
    registry._params.clear()  # test isolation (params self-register)
    cfg = RenderConfig(width=32, height=32, mode="pt", pt=PTConfig(max_bounces=1))
    viewer = Viewer(str(CORNELL_EMISSIVE), cfg, textures=False)
    server = make_server(viewer, 0)
    port = server.server_address[1]
    srv_t = threading.Thread(target=server.serve_forever, daemon=True)
    srv_t.start()
    viewer.render_one(0)  # compile + publish one frame synchronously
    yield viewer, port
    viewer.stop()
    server.shutdown()


def test_page_and_frame(gui):
    viewer, port = gui
    status, body, _ = _get(port, "/")
    assert status == 200 and b"zetaray_tpu" in body
    status, png, headers = _get(port, "/frame.png")
    assert status == 200
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    assert int(headers["X-Frame-Index"]) >= 1


def test_params_roundtrip(gui):
    viewer, port = gui
    status, body, _ = _get(port, "/api/params")
    params = json.loads(body)
    paths = {p["path"] for p in params}
    assert "Renderer/General/Tonemapper" in paths
    assert "PathTracer/Path/MaxBounces" in paths
    # queue a set; it must apply at the next frame boundary
    _post(port, "/api/set", {"path": "Renderer/General/Tonemapper",
                             "value": "neutral"})
    viewer.render_one(1)
    assert viewer.cfg_holder[0].tonemapper == "neutral"
    # unknown param -> 404, not a crash
    with pytest.raises(urllib.error.HTTPError):
        _post(port, "/api/set", {"path": "No/Such/Param", "value": 1})
    # bad enum value -> 400 at POST time, and even a directly-queued bad
    # value must not kill the frame loop (found live: a bad tonemapper
    # ValueError crashed the render thread)
    with pytest.raises(urllib.error.HTTPError):
        _post(port, "/api/set", {"path": "Renderer/General/Tonemapper",
                                 "value": "no_such_tonemapper"})
    from zetaray_tpu.utils.params import registry

    registry.queue_set("Renderer/General/Tonemapper", "also_bad")
    viewer.render_one(10)  # must not raise
    assert viewer.cfg_holder[0].tonemapper == "neutral"
    # every TONEMAPPERS_P key is a legal choice (found live: "tony" missing)
    from zetaray_tpu.ops.post import TONEMAPPERS_P

    choices = registry.get("Renderer/General/Tonemapper").choices
    assert set(TONEMAPPERS_P) <= set(choices)


def test_stats_and_graph(gui):
    viewer, port = gui
    status, body, _ = _get(port, "/api/stats")
    s = json.loads(body)
    assert s["width"] == 32 and s["frame_index"] >= 1
    assert s["tris"] > 0
    status, body, _ = _get(port, "/api/graph")
    assert "digraph" in json.loads(body)["dot"]


def test_pick_and_outline(gui):
    viewer, port = gui
    _post(port, "/api/pick", {"x": 3, "y": 16})  # left wall: jitter-stable
    viewer.render_one(2)  # pick resolves at the frame boundary
    status, body, _ = _get(port, "/api/pick")
    res = json.loads(body)
    assert res["hit"] is True
    assert res["instance"] >= 0
    assert viewer.state.picked_instance == res["instance"]
    # picking the same instance again toggles the outline off (a different
    # instance re-targets it)
    _post(port, "/api/pick", {"x": 3, "y": 16})
    viewer.render_one(3)
    res2 = json.loads(_get(port, "/api/pick")[1])
    expect = -1 if res2["instance"] == res["instance"] else res2["instance"]
    assert viewer.state.picked_instance == expect


def test_camera_orbit(gui):
    viewer, port = gui
    eye0 = viewer.eye.copy()
    r0 = np.linalg.norm(eye0 - viewer.target)
    _post(port, "/api/camera", {"dyaw": 0.3, "ddolly": 0.2})
    viewer.render_one(4)
    assert not np.allclose(viewer.eye, eye0)
    r1 = np.linalg.norm(viewer.eye - viewer.target)
    assert r1 > r0  # dollied out
    # orbit preserves the target
    assert np.allclose(viewer.target, (0, 1.0, 0.0))


def test_hot_reload(gui):
    """The dxc-shader-reload analog: POST /api/reload re-imports the op
    modules + drops jit traces at the next frame boundary; rendering after
    the reload is bit-identical for the same seeds (nothing changed on
    disk), and temporal state is reset."""
    viewer, port = gui
    before = np.asarray(viewer.render_one(20))
    viewer._frame_state = object()  # sentinel: must be cleared by reload
    status, resp = _post(port, "/api/reload", {})
    assert resp["ok"]
    after = np.asarray(viewer.render_one(20))
    status, body, _ = _get(port, "/api/reload_result")
    reloaded = json.loads(body)["reloaded"]
    assert "zetaray_tpu.render.frame" in reloaded
    assert "zetaray_tpu.ops.shading_soa" in reloaded
    assert viewer._frame_state is None  # sentinel cleared (pt mode leaves it)
    np.testing.assert_array_equal(before, after)


def test_profile_endpoint_queued(gui):
    viewer, port = gui
    status, resp = _post(port, "/api/profile", {})
    assert resp["ok"]
    assert viewer.state.profile_req is True
    # don't actually run time_passes here (slow on CPU); clear the flag
    with viewer.state.lock:
        viewer.state.profile_req = False


def test_material_editor_roundtrip(gui):
    """POST /api/material edits the table; the next frame re-uploads the
    scene with the new value (GET /api/materials reflects it)."""
    viewer, port = gui
    st, mats = _post(port, "/api/material",
                     {"index": 0, "field": "roughness", "value": 0.33})
    assert st == 200 and mats["queued"]
    viewer.render_one(101)  # applies the queued edit
    _, body, _ = _get(port, "/api/materials")
    mats = json.loads(body)
    assert abs(mats[0]["roughness"] - 0.33) < 1e-6
    # bad field rejected
    try:
        _post(port, "/api/material", {"index": 0, "field": "nope", "value": 1})
        assert False, "expected 400"
    except Exception:
        pass


def test_transform_gizmo_moves_instance(gui):
    """POST /api/transform translates the picked instance through the
    scene refit: the device scene's world bounds move accordingly."""
    viewer, port = gui
    sel = np.asarray(viewer.scene.inst_id) == 0
    x_before = float(np.asarray(viewer.scene.v0)[sel, 0].mean())
    st, r = _post(port, "/api/transform",
                  {"instance": 0, "translate": [0.25, 0.0, 0.0]})
    assert st == 200 and r["queued"]
    viewer.render_one(102)
    x_after = float(np.asarray(viewer.scene.v0)[sel, 0].mean())
    assert abs((x_after - x_before) - 0.25) < 1e-3, (x_before, x_after)
    # move it back (keep the module-scoped fixture's scene consistent)
    _post(port, "/api/transform", {"instance": 0, "translate": [-0.25, 0, 0]})
    viewer.render_one(103)


def test_log_endpoint(gui):
    viewer, port = gui
    from zetaray_tpu.utils import log as L

    L.info("gui-test marker")
    _, body, _ = _get(port, "/api/log")
    entries = json.loads(body)["log"]
    assert any("gui-test marker" in e[2] for e in entries)
