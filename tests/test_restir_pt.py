"""ReSTIR PT tests (CPU): reconnection-shift path reuse.

Per-shift-case unit tests + convergence vs the PT oracle, the VERDICT
round-1 done-criteria for the reference's flagship integrator
(IndirectLighting.h ReSTIR_PT)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zetaray_tpu.scene import Camera
from zetaray_tpu.render import render_frame_restir, render_frame, RenderConfig
from zetaray_tpu.render.frame import FrameState
from zetaray_tpu.ops.pathtracer import PTConfig
from zetaray_tpu.ops import restir_pt as RP


@pytest.fixture(scope="module")
def setup(cornell_dev):
    cam = Camera.look_at((0, 1.0, 3.5), (0, 1.0, 0.0), vfov_deg=45, aspect=1.0)
    cfg = RenderConfig(width=20, height=20, mode="restir_pt", pt=PTConfig(max_bounces=3))
    return cornell_dev, cam, cfg


def test_pt_frames_finite_and_accumulate(setup):
    scene, cam, cfg = setup
    state = None
    for i in range(3):
        out, state = render_frame_restir(scene, cam, jax.random.PRNGKey(i), cfg, state)
        h = np.asarray(out["hdr"])
        assert np.isfinite(h).all() and (h >= 0).all()
    # temporal reuse grows M
    assert float(np.asarray(state.gi_reservoirs[RP.PR.M]).mean()) > 1.0


def test_pt_matches_pt_oracle(setup):
    scene, cam, cfg = setup
    state = None
    acc = 0.0
    warm, n = 2, 10
    # skip the first 2 frames: before temporal reuse accumulates M the
    # single-sample GRIS estimate is high-variance (measured ~0.10 vs the
    # 0.073 oracle on frames 0-1, converged by frame 2)
    for i in range(warm + n):
        out, state = render_frame_restir(scene, cam, jax.random.PRNGKey(i), cfg, state)
        if i >= warm:
            acc += np.asarray(out["hdr"]).mean()
    rp_mean = acc / n
    ref = np.mean(
        [
            np.asarray(
                render_frame(
                    scene, cam, jax.random.PRNGKey(60 + i),
                    RenderConfig(width=20, height=20, pt=PTConfig(max_bounces=3)),
                )["hdr"]
            )
            for i in range(12)
        ]
    )
    assert abs(rp_mean - ref) / ref < 0.15, (rp_mean, ref)


def test_pt_glass_scene_converges(cornell_cpu):
    """Cornell-with-glass: restir_pt agrees with the PT oracle when the
    prefix crosses a transmissive box (the reference's hybrid-shift
    stress case)."""
    import copy

    from zetaray_tpu.scene.scene import upload_scene

    cpu = copy.deepcopy(cornell_cpu)
    # turn the first non-emissive material into rough glass
    em = cpu.materials.emissive.max(-1) > 0
    mat_idx = int(np.nonzero(~em)[0][0])
    cpu.materials.transmission[mat_idx] = 1.0
    cpu.materials.roughness[mat_idx] = 0.1
    scene = upload_scene(cpu)
    assert scene.has_transmission
    cam = Camera.look_at((0, 1.5, 6.0), (0, 1.0, 0.0), vfov_deg=50, aspect=1.0)
    cfg = RenderConfig(
        width=16, height=16, mode="restir_pt", pt=PTConfig(max_bounces=3)
    )
    state = None
    acc = 0.0
    n = 5
    for i in range(n):
        out, state = render_frame_restir(scene, cam, jax.random.PRNGKey(i), cfg, state)
        h = np.asarray(out["hdr"])
        assert np.isfinite(h).all()
        acc += h.mean()
    rp_mean = acc / n
    ref = np.mean(
        [
            np.asarray(
                render_frame(
                    scene, cam, jax.random.PRNGKey(80 + i),
                    RenderConfig(width=16, height=16, pt=PTConfig(max_bounces=3)),
                )["hdr"]
            )
            for i in range(10)
        ]
    )
    assert abs(rp_mean - ref) / ref < 0.25, (rp_mean, ref)


# ---------------------------------------------------------------------------
# Per-shift-case unit tests
# ---------------------------------------------------------------------------


def _make_reservoir(n, x_rc, n_rc, le, w_s, l_s, base=0.7, metal=0.0, rough=0.5, dist=1.0):
    res = np.zeros((RP.PR.ROWS, n), np.float32)
    res[RP.PR.X : RP.PR.X + 3] = np.asarray(x_rc)[:, None]
    res[RP.PR.N : RP.PR.N + 3] = np.asarray(n_rc)[:, None]
    res[RP.PR.LE : RP.PR.LE + 3] = np.asarray(le)[:, None]
    res[RP.PR.WS : RP.PR.WS + 3] = np.asarray(w_s)[:, None]
    res[RP.PR.LS : RP.PR.LS + 3] = np.asarray(l_s)[:, None]
    res[RP.PR.BASE : RP.PR.BASE + 3] = base
    res[RP.PR.METAL] = metal
    res[RP.PR.ROUGH] = rough
    res[RP.PR.M] = 1.0
    res[RP.PR.W] = 1.0
    res[RP.PR.DIST] = dist
    return jnp.asarray(res)


def _surf_at(p, normal, albedo=0.5):
    """Minimal surf tuple at positions p [n,3] facing ``normal``."""
    from zetaray_tpu.core.vec3 import V3
    from zetaray_tpu.ops import shading_soa as S

    n = p.shape[0]
    pos = V3(*jnp.asarray(p, jnp.float32).T)
    ns = V3(*jnp.broadcast_to(jnp.asarray(normal, jnp.float32), (n, 3)).T)
    wo = ns  # viewing along the normal
    ones = jnp.ones((n,))
    mat = S.MatSoA(base=V3(ones * albedo, ones * albedo, ones * albedo),
                   metallic=ones * 0.0, roughness=ones, ior=ones * 1.5)
    frame = S.make_frame(ns)
    return pos, ns, ns, wo, mat, frame, jnp.ones((n,), bool)


def test_shift_reconnection_target_scales_with_geometry():
    """Reconnection shift: re-anchoring the same path sample at a pixel
    twice as far from the vertex scales the area-measure target by the
    geometry term (1/d^2 falloff + cosines), with BSDF terms equal."""
    x_rc = [0.0, 2.0, 0.0]
    res = _make_reservoir(
        2, x_rc, [0.0, -1.0, 0.0], [1.0, 1.0, 1.0], [0.0, 1.0, 0.0],
        [0.3, 0.3, 0.3],
    )
    surf = _surf_at(np.array([[0.0, 0.0, 0.0], [0.0, -2.0, 0.0]]), [0.0, 1.0, 0.0])
    phat, f1, lout, geom, wi, dist2 = RP._phat_pt(surf, res, full=False)
    phat = np.asarray(phat)
    d2 = np.asarray(dist2)
    assert d2[0] == pytest.approx(4.0) and d2[1] == pytest.approx(16.0)
    # same direction, same cosines -> target ratio is exactly d2 ratio
    assert phat[0] / phat[1] == pytest.approx(4.0, rel=1e-4)


def test_shift_reevaluates_rc_bsdf():
    """The rc BSDF must be re-evaluated per shift: moving the destination
    pixel sideways changes the incoming direction at rc, so a glossy rc
    lobe changes the shifted target (this is what restir_gi cannot do)."""
    x_rc = [0.0, 2.0, 0.0]
    # glossy rc (normal down); suffix = mirror direction of pixel A's
    # connection, so A is on-peak and the far-off-axis pixel B is off-peak
    w_s = np.array([-0.265, -0.964, 0.0])
    w_s = (w_s / np.linalg.norm(w_s)).tolist()
    res = _make_reservoir(
        2, x_rc, [0.0, -1.0, 0.0], [0.0, 0.0, 0.0], w_s,
        [1.0, 1.0, 1.0], metal=1.0, rough=0.2,
    )
    surf = _surf_at(np.array([[0.55, 0.0, 0.0], [3.5, 0.0, 0.0]]), [0.0, 1.0, 0.0])
    phat, *_ = RP._phat_pt(surf, res, full=False)
    phat = np.asarray(phat)
    # normalize out the geometry term to isolate the rc BSDF change
    _, _, lout, geom, _, _ = RP._phat_pt(surf, res, full=False)
    lum = np.asarray(phat) / np.maximum(np.asarray(geom), 1e-12)
    assert lum[0] > 2.0 * lum[1], lum  # glossy rc: aligned >> off-axis


def test_shift_invalid_cases_zero_the_merge():
    """Hybrid-shift validity: near-vertex or near-specular reconnection
    rejects the transfer (merge weight 0, M unchanged)."""
    cfg = RP.ReSTIRPTConfig()
    x_rc = [0.0, 0.5, 0.0]
    ok_res = _make_reservoir(
        1, x_rc, [0.0, -1.0, 0.0], [1.0, 1.0, 1.0], [0.0, 1.0, 0.0],
        [0.0, 0.0, 0.0], rough=0.5, dist=0.5,
    )
    # (a) destination pixel almost at the vertex -> distance condition fails
    near_surf = _surf_at(np.array([[0.0, 0.499, 0.0]]), [0.0, 1.0, 0.0])
    ok = np.asarray(RP._shift_valid(near_surf, ok_res, cfg))
    assert not ok[0]
    # (b) near-specular rc -> roughness condition fails everywhere
    spec_res = _make_reservoir(
        1, x_rc, [0.0, -1.0, 0.0], [1.0, 1.0, 1.0], [0.0, 1.0, 0.0],
        [0.0, 0.0, 0.0], rough=0.01, dist=0.5,
    )
    far_surf = _surf_at(np.array([[0.0, 0.0, 0.0]]), [0.0, 1.0, 0.0])
    assert not np.asarray(RP._shift_valid(far_surf, spec_res, cfg))[0]
    # (c) valid case passes
    assert np.asarray(RP._shift_valid(far_surf, ok_res, cfg))[0]
    # and the merge honors it: an invalid-shift candidate transfers nothing
    a = _make_reservoir(
        1, [0.3, 1.0, 0.0], [0.0, -1.0, 0.0], [1.0, 1.0, 1.0],
        [0.0, 1.0, 0.0], [0.0, 0.0, 0.0],
    )
    merged = RP._merge(a, spec_res, far_surf, jnp.asarray([0.99]), cfg)
    np.testing.assert_allclose(
        np.asarray(merged[RP.PR.X : RP.PR.X + 3, 0]),
        np.asarray(a[RP.PR.X : RP.PR.X + 3, 0]),
    )


def test_replay_self_shift_is_identity(cornell_dev):
    """Replaying a fresh path at its own generating pixel reproduces the
    stored reconnection vertex exactly (same surface + same RNG stream ->
    same prefix ray -> same closest hit), and the area-convention target
    equals the folded target times the stored convention bridge PDFS3."""
    from zetaray_tpu.accel.megakernel import gbuffer
    from zetaray_tpu.core.rng import seed_from_key

    cam = Camera.look_at((0, 1.0, 3.5), (0, 1.0, 0.0), vfov_deg=45, aspect=1.0)
    w = h = 16
    o, d = cam.generate_rays(w, h)
    gb = gbuffer(cornell_dev, o, d, interpret=True)
    key = jax.random.PRNGKey(3)
    seed = seed_from_key(key)
    cfg = RP.ReSTIRPTConfig()
    res = RP.initial_samples(
        cornell_dev, gb, key, PTConfig(max_bounces=3), seed, cfg
    )
    surf = RP._surf(gb)
    # force every lane down the replay path
    phat_r, w_factor, rows_r, ok_r = RP._replay_shift(cornell_dev, surf, res, cfg)
    has3 = np.asarray(res[RP.PR.HAS3]) > 0.5
    okn = np.asarray(ok_r) & has3
    assert okn.sum() > 20  # cornell: most lanes have a second vertex
    # replayed vertex == stored vertex on its own pixel
    np.testing.assert_allclose(
        np.asarray(rows_r[RP.PR.X : RP.PR.X + 3])[:, okn],
        np.asarray(res[RP.PR.X : RP.PR.X + 3])[:, okn],
        atol=1e-3,
    )
    # area target = folded target * p_A(x3|x2): the convention bridge
    phat_folded, *_ = RP._phat_pt(surf, res, full=cfg.full_target)
    lhs = np.asarray(phat_r)[okn]
    rhs = (np.asarray(phat_folded) * np.asarray(res[RP.PR.PDFS3]))[okn]
    pos_m = (rhs > 1e-10) & (lhs > 1e-10)
    np.testing.assert_allclose(lhs[pos_m], rhs[pos_m], rtol=2e-2)
    # Jacobian at the generating pixel is 1 -> w_factor = 1/PDFS3
    wf = np.asarray(w_factor)[okn]
    pdfs3 = np.asarray(res[RP.PR.PDFS3])[okn]
    np.testing.assert_allclose(wf[pos_m] * pdfs3[pos_m], 1.0, rtol=2e-2)


def test_replay_recovers_reuse_when_reconnection_invalid(setup):
    """force_replay routes EVERY merge through replay + reconnect-at-x3;
    the estimator must stay consistent with the PT oracle (reuse flows
    exclusively through the replay shift)."""
    scene, cam, _ = setup
    cfg = RenderConfig(
        width=20, height=20, mode="restir_pt",
        pt=PTConfig(max_bounces=3),
        restir_pt=RP.ReSTIRPTConfig(replay=True, force_replay=True),
    )
    state = None
    acc = 0.0
    n = 6
    for i in range(n):
        out, state = render_frame_restir(scene, cam, jax.random.PRNGKey(i), cfg, state)
        h = np.asarray(out["hdr"])
        assert np.isfinite(h).all() and (h >= 0).all()
        acc += h.mean()
    rp_mean = acc / n
    ref = np.mean(
        [
            np.asarray(
                render_frame(
                    scene, cam, jax.random.PRNGKey(60 + i),
                    RenderConfig(width=20, height=20, pt=PTConfig(max_bounces=3)),
                )["hdr"]
            )
            for i in range(12)
        ]
    )
    assert abs(rp_mean - ref) / ref < 0.2, (rp_mean, ref)


def test_identity_shift_preserves_target():
    """Shifting a sample to its own generating pixel must reproduce the
    original target exactly (identity shift, Jacobian 1)."""
    res = _make_reservoir(
        1, [0.0, 2.0, 0.0], [0.0, -1.0, 0.0], [0.5, 0.5, 0.5],
        [0.0, 1.0, 0.0], [0.2, 0.2, 0.2],
    )
    surf = _surf_at(np.array([[0.0, 0.0, 0.0]]), [0.0, 1.0, 0.0])
    p1, *_ = RP._phat_pt(surf, res, full=False)
    p2, *_ = RP._phat_pt(surf, res, full=False)
    assert float(p1[0]) == float(p2[0]) and float(p1[0]) > 0.0


def test_replay_glass_scene(cornell_cpu):
    """Replay + rc-transmission on a glass Cornell: forcing every merge
    through the replay shift must stay consistent with the PT oracle
    (VERDICT r2 #4 done-criterion scene)."""
    import copy

    from zetaray_tpu.scene.scene import upload_scene

    cpu = copy.deepcopy(cornell_cpu)
    em = cpu.materials.emissive.max(-1) > 0
    mat_idx = int(np.nonzero(~em)[0][0])
    cpu.materials.transmission[mat_idx] = 1.0
    cpu.materials.roughness[mat_idx] = 0.15
    scene = upload_scene(cpu)
    assert scene.has_transmission
    cam = Camera.look_at((0, 1.5, 6.0), (0, 1.0, 0.0), vfov_deg=50, aspect=1.0)

    def run(force_replay, n):
        cfg = RenderConfig(
            width=16, height=16, mode="restir_pt", pt=PTConfig(max_bounces=3),
            restir_pt=RP.ReSTIRPTConfig(replay=True, force_replay=force_replay),
        )
        state = None
        acc = 0.0
        for i in range(n):
            out, state = render_frame_restir(
                scene, cam, jax.random.PRNGKey(i), cfg, state
            )
            h = np.asarray(out["hdr"])
            assert np.isfinite(h).all() and (h >= 0).all()
            acc += h.mean()
        return acc / n

    ref = np.mean(
        [
            np.asarray(
                render_frame(
                    scene, cam, jax.random.PRNGKey(90 + i),
                    RenderConfig(width=16, height=16, pt=PTConfig(max_bounces=3)),
                )["hdr"]
            )
            for i in range(10)
        ]
    )
    # the user-facing hybrid config (replay only on invalid reconnections)
    # must track the oracle (measured ~0.028 vs 0.026 over 12 frames)
    hy_mean = run(False, 5)
    assert abs(hy_mean - ref) / ref < 0.25, (hy_mean, ref)
    # all-replay stress case: known limitation (GAPS.md) -- transmitted
    # PREFIX segments are not generated (live requires the sampled
    # direction above the geometric surface), so through-glass paths are
    # missing. With the x3 material now evaluated as real glass (no
    # phantom diffuse lobe), the stress case stabilizes at ~0.58x the
    # oracle (0.0150 vs 0.0259 over 12 frames); guard it stays finite,
    # positive, and in that regime rather than silently collapsing.
    rp_mean = run(True, 5)
    assert 0.35 < rp_mean / ref < 1.3, (rp_mean, ref)


def test_spatial_search_finds_more_partners(cornell_dev):
    """ReSTIR_PT_SpatialSearch analog: probing several candidate neighbors
    raises the spatial-reuse hit rate (merged M) at geometry edges while
    staying finite, and spatial_search=1 reproduces the single-neighbor
    path bit-exactly."""
    import jax.numpy as jnp

    from zetaray_tpu.accel.megakernel import gbuffer
    from zetaray_tpu.ops import restir_pt as RPT

    cam = Camera.look_at((0, 1.0, 3.5), (0, 1.0, 0.0), vfov_deg=45, aspect=1.0)
    o, d = cam.generate_rays(32, 32)
    gb = gbuffer(cornell_dev, o, d, rt=256, interpret=True)
    from zetaray_tpu.core.rng import seed_from_key

    seed = seed_from_key(jax.random.PRNGKey(2))
    cfg1 = RPT.ReSTIRPTConfig(temporal=False, spatial_search=1, replay=False)
    cfg4 = RPT.ReSTIRPTConfig(temporal=False, spatial_search=4, replay=False)
    res = RPT.initial_samples(
        cornell_dev, gb, jax.random.PRNGKey(3), PTConfig(max_bounces=2),
        seed, cfg1,
    )
    s1 = RPT.spatial_step(res, gb, 32, 32, seed, 0, cfg1)
    s1b = RPT.spatial_step(res, gb, 32, 32, seed, 0, cfg1)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s1b))
    s4 = RPT.spatial_step(res, gb, 32, 32, seed, 0, cfg4)
    a1, a4 = np.asarray(s1), np.asarray(s4)
    # invalid lanes carry garbage in masked rows by design (their merge
    # weight is 0); the resampling-facing rows must be finite
    for row in (RPT.PR.WSUM, RPT.PR.M, RPT.PR.W, RPT.PR.PHAT):
        assert np.isfinite(a4[row]).all(), row
    # search merges at least as much reservoir mass on average
    assert a4[RPT.PR.M].mean() >= a1[RPT.PR.M].mean() - 1e-6


# ---------------------------------------------------------------------------
# Case-A (reconnection-taken) replay eligibility (IndirectLighting.h:32-52)
# ---------------------------------------------------------------------------


def test_case_a_take_keeps_replay_identity(cornell_cpu):
    """A reconnection-shift take copies the candidate's rows verbatim --
    the reconnection shift is identity on the path vertices -- so the
    taken reservoir must KEEP its replay identity (HAS3, SRCPIX/SRCSEED,
    PDFA, PDFS3, x3 block) and stay replayable at a third pixel, matching
    the reference's chained replays (IndirectLighting.h:32-52)."""
    import copy

    from zetaray_tpu.accel.megakernel import gbuffer
    from zetaray_tpu.core.rng import seed_from_key
    from zetaray_tpu.scene.scene import upload_scene

    # every surface mildly emissive -> every suffix carries radiance, so
    # takes are plentiful (the stock box yields ~0.7% radiant 1-frame
    # reservoirs: BSDF-only suffixes rarely hit the small panel)
    cpu = copy.deepcopy(cornell_cpu)
    cpu.materials.emissive[:] = np.maximum(cpu.materials.emissive, 0.2)
    cornell_dev = upload_scene(cpu)

    cam = Camera.look_at((0, 1.0, 3.5), (0, 1.0, 0.0), vfov_deg=45, aspect=1.0)
    w = h = 16
    o, d = cam.generate_rays(w, h)
    gb = gbuffer(cornell_dev, o, d, interpret=True)
    key = jax.random.PRNGKey(7)
    seed = seed_from_key(key)
    cfg = RP.ReSTIRPTConfig(replay=True)
    res = RP.initial_samples(
        cornell_dev, gb, key, PTConfig(max_bounces=3), seed, cfg
    )
    surf = RP._surf(gb)

    # spatial-style merge: candidate = left neighbor, u=0 forces a take
    # wherever the candidate transfers any weight
    res_b = jnp.roll(res, 1, axis=1)
    shift_a = np.asarray(RP._shift_valid(surf, res_b, cfg))
    merged = RP._merge(
        res_a=res, res_b=res_b, surf=surf, u=jnp.zeros(res.shape[1]),
        cfg=cfg, scene=cornell_dev,
    )
    m = np.asarray(merged)
    b = np.asarray(res_b)
    # lanes that did a case-A take of a replay-eligible candidate
    took = m[RP.PR.WSUM] > np.asarray(res)[RP.PR.WSUM] + 1e-12
    case_a = took & shift_a & (b[RP.PR.HAS3] > 0.5)
    assert case_a.sum() > 10, case_a.sum()
    # the replay identity survived the take, verbatim
    for row in (RP.PR.HAS3, RP.PR.SRCPIX, RP.PR.SRCSEED, RP.PR.PDFA,
                RP.PR.PDFS3, RP.PR.X3, RP.PR.X3 + 1, RP.PR.X3 + 2):
        np.testing.assert_array_equal(m[row][case_a], b[row][case_a], str(row))

    # ...and the kept identity is USABLE: replaying the merged reservoir at
    # yet another pixel succeeds on a nontrivial share of those lanes
    surf3 = RP._surf(jnp.roll(gb, 2, axis=1))
    _, _, _, ok_r = RP._replay_shift(cornell_dev, surf3, merged, cfg)
    assert (np.asarray(ok_r) & case_a).sum() > 5


def test_case_a_eligibility_survives_take_chain(setup):
    """Mixed temporal+spatial take chains over >=3 frames keep a healthy
    replay-eligible share (the old behavior decayed HAS3 with every
    reconnection take), and the estimator's mean stays on the PT oracle
    (VERDICT r4 next #6a done-criterion)."""
    scene, cam, _ = setup
    cfg = RenderConfig(
        width=20, height=20, mode="restir_pt", pt=PTConfig(max_bounces=3),
        restir_pt=RP.ReSTIRPTConfig(replay=True),
    )
    state = None
    acc = 0.0
    n = 6
    frac = []
    for i in range(n):
        out, state = render_frame_restir(scene, cam, jax.random.PRNGKey(i), cfg, state)
        h = np.asarray(out["hdr"])
        assert np.isfinite(h).all() and (h >= 0).all()
        acc += h.mean()
        res = np.asarray(state.gi_reservoirs)
        alive = res[RP.PR.M] > 0
        frac.append((res[RP.PR.HAS3] > 0.5)[alive].mean())
    # after 3+ frames of temporal+spatial takes, most surviving paths are
    # still replayable (a surface-hit suffix exists for most of Cornell)
    assert frac[-1] > 0.5, frac
    assert frac[3] > 0.5, frac
    rp_mean = acc / n
    ref = np.mean(
        [
            np.asarray(
                render_frame(
                    scene, cam, jax.random.PRNGKey(160 + i),
                    RenderConfig(width=20, height=20, pt=PTConfig(max_bounces=3)),
                )["hdr"]
            )
            for i in range(12)
        ]
    )
    assert abs(rp_mean - ref) / ref < 0.2, (rp_mean, ref)
