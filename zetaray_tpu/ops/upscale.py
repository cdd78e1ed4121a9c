"""Temporal upscaling (TAAU): render-res < display-res reconstruction.

Counterpart of the reference's FSR2 integration (FSR2/FSR2.h:13-65, which
wraps AMD's prebuilt closed-source lib; mutually exclusive with TAA,
DefaultRendererImpl.h:46-55). Since the reference itself does not implement
the algorithm, this is an original TAAU reconstruction with the same
inputs/outputs as the FSR2 wrapper (jittered low-res color + depth +
reprojection + exposure-independent history):

  - the display-res history is reprojected with depth-dilated motion and
    resampled with Catmull-Rom (shared with ops.taa);
  - the current low-res frame is splatted to display res with a Gaussian
    kernel centered on the *jittered* sample position -- per-frame jitter
    makes the low-res grid cover different display-pixel phases, so
    detail accumulates over frames (the core FSR2/TAAU idea);
  - history is rectified against the low-res 3x3 neighborhood min/max;
  - blend weight scales with the sample-to-pixel distance confidence, so
    display pixels far from any current sample lean on history.

State contract (render.frame): reservoirs/G-buffer stay at render res;
only the color history and the output are display res.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .taa import _cubic_w, _depth_dilated_motion, _neighborhood_minmax_p


@dataclass(frozen=True)
class UpscaleConfig:
    blend: float = 0.1  # base current-frame weight
    clamp: bool = True
    sigma: float = 0.45  # Gaussian splat radius, in render-res texels
    depth_dilate: bool = True
    # FSR2-tier internals (the reference ships these inside AMD's prebuilt
    # lib, FSR2/FSR2.h:13-65; implemented natively here):
    # depth clip -- disocclusion test of the reprojection against the
    # previous frame's depth plane; failing pixels drop their history.
    # 0 disables; value = relative depth tolerance.
    depth_clip_tol: float = 0.1
    # auto-reactive mask -- luminance divergence between current sample
    # and (rectified) history raises the current-frame weight, so fast
    # shading changes (specular, emissive flicker) do not ghost.
    # 0 disables; value scales the reactivity -> alpha boost. Default off:
    # FSR2's reactive mask is an app-PROVIDED input (fsr2 reactive
    # resource), and an always-on luminance heuristic fights the 1-spp
    # path-tracing noise the temporal accumulation exists to integrate.
    reactive_scale: float = 0.0
    # luminance locks -- display pixels whose current sample falls outside
    # the render-res neighborhood range are thin features the clamp would
    # erase; they acquire a decaying lock that relaxes the clamp.
    locks: bool = True
    lock_decay: float = 0.1  # per-frame lock strength decay
    # RCAS sharpening of the upscaled output (FidelityFX RCAS algorithm);
    # 0 = off, else [0, 1] sharpening strength (applied by render.frame).
    rcas_sharpness: float = 0.0


def _bilinear_p(img, px, py):
    """Bilinear resample of planar [C, H, W] at texel coords [N] -> [C, N]."""
    c, h, w = img.shape
    x0 = jnp.clip(jnp.floor(px), 0, w - 1)
    y0 = jnp.clip(jnp.floor(py), 0, h - 1)
    fx = jnp.clip(px - x0, 0.0, 1.0)
    fy = jnp.clip(py - y0, 0.0, 1.0)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w - 1)
    y1i = jnp.minimum(y0i + 1, h - 1)
    flat = img.reshape(c, -1)

    def at(yi, xi):
        return jnp.take(flat, yi * w + xi, axis=1)

    top = at(y0i, x0i) * (1 - fx) + at(y0i, x1i) * fx
    bot = at(y1i, x0i) * (1 - fx) + at(y1i, x1i) * fx
    return top * (1 - fy) + bot * fy


def _axis_weights(p, n):
    """Dense bilinear interpolation matrix [len(p), n] for resampling a
    length-n axis at positions ``p``, with _bilinear_p's edge semantics
    (x0 = clip(floor(p)), x1 = min(x0 + 1, n - 1), f = clip(p - x0, 0, 1);
    at the border both taps land on the same texel and the weights sum
    to 1).

    The display->render sample mapping is a fixed affine of the pixel
    coordinate, so resampling the render-res planes is SEPARABLE: two
    small dense matmuls (Wy @ img @ Wx^T) ride the MXU instead of 4
    serialized per-pixel gathers per plane -- the gathers were the
    upscaler's entire cost (50 ms for 256->512 in BENCH_r04)."""
    x0 = jnp.clip(jnp.floor(p), 0, n - 1)
    f = jnp.clip(p - x0, 0.0, 1.0)
    x0i = x0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, n - 1)
    cols = jnp.arange(n, dtype=jnp.int32)
    return (
        (cols[None, :] == x0i[:, None]) * (1.0 - f)[:, None]
        + (cols[None, :] == x1i[:, None]) * f[:, None]
    )


def _sep_bilinear(imgs, wy, wx):
    """Separable resample of stacked planes [C, h, w] with axis matrices
    wy [OH, h], wx [OW, w] -> [C, OH, OW]. HIGHEST precision: the mask
    plane is thresholded at 0.99 downstream, bf16 passes would leak."""
    p = jax.lax.Precision.HIGHEST
    t = jnp.einsum("oh,chw->cow", wy, imgs, precision=p)
    return jnp.einsum("pw,cow->cop", wx, t, precision=p)


def _fetch_hist_lock(history, lock, px, py):
    """Catmull-Rom history + bilinear lock resample from ONE row gather.

    history: [3, H, W]; lock: [H, W] or None; px/py: clipped texel coords
    [N]. The 4x4 window table ([64, H*W] with the lock plane stacked in)
    is pure strided slices (ops.taa.catmull_rom_p's trick); each pixel
    fetches its whole window with one gather. The lock reads the window's
    inner 2x2 with bilinear weights in _bilinear_p's lerp association, so
    it is bit-identical to the separate-gather form it replaces."""
    _, h, w = history.shape
    stacked = (
        history if lock is None else jnp.concatenate([history, lock[None]], 0)
    )
    cs = stacked.shape[0]
    x1 = jnp.floor(px)
    y1 = jnp.floor(py)
    fx = px - x1
    fy = py - y1
    wx = jnp.stack(_cubic_w(fx), -1)  # [N, 4]
    wy = jnp.stack(_cubic_w(fy), -1)
    pad = jnp.pad(stacked, ((0, 0), (1, 2), (1, 2)), mode="edge")
    wins = jnp.stack(
        [pad[:, j:j + h, i:i + w] for j in range(4) for i in range(4)], 1
    )  # [cs, 16, h, w]
    idx = y1.astype(jnp.int32) * w + x1.astype(jnp.int32)
    g = jnp.take(wins.reshape(cs * 16, h * w), idx, axis=1).reshape(
        cs, 16, -1
    )
    n = px.shape[0]
    wgt = (wy[:, :, None] * wx[:, None, :]).reshape(n, 16)
    hist = jnp.einsum("ckn,nk->cn", g[:3], wgt)
    lock_out = None
    if lock is not None:
        gl = g[3]  # taps: 5=(y1,x1) 6=(y1,x1+1) 9=(y1+1,x1) 10=(y1+1,x1+1)
        top = gl[5] * (1.0 - fx) + gl[6] * fx
        bot = gl[9] * (1.0 - fx) + gl[10] * fx
        lock_out = top * (1.0 - fy) + bot * fy
    return hist, lock_out


def _bilinear_gather_1(plane, px, py):
    """Bilinear sample of one [H, W] plane via a 2x2 window table + ONE
    row gather (vs 4 serialized takes), exact _bilinear_p semantics."""
    h, w = plane.shape
    x0 = jnp.clip(jnp.floor(px), 0, w - 1)
    y0 = jnp.clip(jnp.floor(py), 0, h - 1)
    fx = jnp.clip(px - x0, 0.0, 1.0)
    fy = jnp.clip(py - y0, 0.0, 1.0)
    pad = jnp.pad(plane, ((0, 1), (0, 1)), mode="edge")
    wins = jnp.stack(
        [pad[j:j + h, i:i + w] for j in (0, 1) for i in (0, 1)], 0
    ).reshape(4, h * w)
    idx = y0.astype(jnp.int32) * w + x0.astype(jnp.int32)
    g = jnp.take(wins, idx, axis=1)
    top = g[0] * (1.0 - fx) + g[1] * fx
    bot = g[2] * (1.0 - fx) + g[3] * fx
    return top * (1.0 - fy) + bot * fy


def taau_resolve(
    curr_lr, history, pos_lr, valid_lr, depth_lr, prev_cam, jitter,
    out_w, out_h, cfg: UpscaleConfig = UpscaleConfig(),
    out_row0=0, out_rows=None, lr_row0=0, hr_full=None, hist_row0=0,
    prev_depth_lr=None, lock=None,
):
    """One temporal-upscale step.

    curr_lr: [3, hr, wr] this frame's render-res color (rendered with
    sub-pixel ``jitter``, in render-res pixels); history: [3, H, W]
    display-res accumulated output (None on the first frame); pos_lr /
    valid_lr / depth_lr: render-res G-buffer planes; prev_cam: previous
    camera. Returns the new display-res image (= next history).

    Sharding hooks (parallel.mesh, the FSR2-slot equivalent of the TAA
    halo path): this call may produce only the display-row band
    [``out_row0``, ``out_row0 + out_rows``); the render-res inputs are then
    halo-extended with their first row at global render row ``lr_row0``
    (``hr_full`` = full render height), and ``history`` is halo-extended
    with first row at global display row ``hist_row0``. Defaults reproduce
    the single-chip whole-image call exactly.

    FSR2-tier inputs: ``prev_depth_lr`` = previous frame's render-res
    depth plane (rows aligned with the other lr inputs) enables the depth
    clip; ``lock`` = previous luminance-lock plane (rows aligned with
    ``history``). Returns ``(out, new_lock)``; ``new_lock`` is None when
    cfg.locks is off.
    """
    _, hr, wr = curr_lr.shape
    if out_rows is None:
        out_rows = out_h
    if hr_full is None:
        hr_full = hr  # sharded callers must pass the full render height
    sx = wr / out_w
    sy = hr_full / out_h

    # display-pixel centers (of this band) in render-res texel coords
    xs = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * sx - 0.5
    ys = (jnp.arange(out_rows, dtype=jnp.float32) + out_row0 + 0.5) * sy - 0.5
    px = jnp.tile(xs, out_rows)
    py = jnp.repeat(ys, out_w)

    # jittered sample coords: a fixed affine of the pixel coordinate, so
    # every render-res resample below is SEPARABLE (see _axis_weights)
    jx = jnp.asarray(jitter[0], jnp.float32)  # traced (Camera pytree leaf)
    jy = jnp.asarray(jitter[1], jnp.float32)
    spx_a = xs - jx  # per-display-column render-res sample coords
    spy_a = ys - jy  # per-display-row
    # Clamp the GLOBAL row coordinate to the image extent before
    # localizing. Unsharded, the interpolation clamp does this implicitly;
    # sharded, the halo window has edge-replicated rows below row 0 /
    # above the last row -- pointwise data interpolates to the same values
    # there, but STENCIL-DERIVED data (neighborhood min/max, dilated
    # motion) computed on a replica row differs from the true edge row's,
    # so border reads must land exactly on real rows.
    spy_la = jnp.clip(spy_a, 0.0, hr_full - 1.0) - lr_row0
    wmx = _axis_weights(spx_a, wr)
    wmy = _axis_weights(spy_la, hr)

    # confidence = Gaussian distance to the nearest jittered sample
    # center; separable -> outer product of per-axis Gaussians
    inv2s = 1.0 / (2.0 * cfg.sigma * cfg.sigma)
    dx = spx_a - jnp.round(spx_a)
    dy = spy_a - jnp.round(spy_a)
    conf = (
        jnp.exp(-dy * dy * inv2s)[:, None] * jnp.exp(-dx * dx * inv2s)[None, :]
    ).reshape(-1)

    zeros_lock = (
        jnp.zeros((out_rows, out_w)) if cfg.locks else None
    )
    if history is None:
        cur0 = _sep_bilinear(curr_lr, wmy, wmx)
        return cur0, zeros_lock

    # reprojection: per-lr-texel motion (display-space offset between the
    # texel's jittered sample coordinate and its reprojected history
    # coordinate), optionally depth-dilated, then resampled per display
    # pixel. Dilating/interpolating *motion* instead of positions keeps a
    # static camera at exactly zero offset (see taa._depth_dilated_motion).
    p_lr, pp_lr, zf_lr = prev_cam.project(
        pos_lr.reshape(3, -1).T, out_w, out_h
    )
    tx = ((jnp.arange(wr, dtype=jnp.float32) + 0.5 + jx) / wr) * out_w - 0.5
    # clamp the global row index: edge-replicated halo rows (sharded image
    # borders) hold row-0/last-row POSITIONS, so their motion must be
    # computed against that row's own coordinate or the replicas carry a
    # phantom offset that depth dilation can spread inward
    row_g = jnp.clip(
        jnp.arange(hr, dtype=jnp.float32) + lr_row0, 0.0, hr_full - 1.0
    )
    ty = ((row_g + 0.5 + jy) / hr_full) * out_h - 0.5
    m_lr = jnp.stack(
        [
            (p_lr - jnp.tile(tx, hr)).reshape(hr, wr),
            (pp_lr - jnp.repeat(ty, wr)).reshape(hr, wr),
        ],
        0,
    )
    ok_lr = valid_lr & (zf_lr.reshape(hr, wr) > 0)
    if cfg.depth_dilate:
        m_lr = _depth_dilated_motion(m_lr, depth_lr, ok_lr)
    m_lr = jnp.where(ok_lr[None], m_lr, 0.0)

    # ONE stacked separable resample for every regular-position plane:
    # color (3) + valid (1) + motion (2) [+ position (3)] [+ clamp lo/hi
    # (6)] -- these were ~10 serialized 4-gather bilinears (the 50 ms)
    want_clip = prev_depth_lr is not None and cfg.depth_clip_tol > 0.0
    planes = [curr_lr, valid_lr[None].astype(jnp.float32), m_lr]
    if want_clip:
        planes.append(pos_lr.reshape(3, hr, wr))
    if cfg.clamp or cfg.locks:
        lo_lr, hi_lr = _neighborhood_minmax_p(curr_lr)
        planes.extend([lo_lr, hi_lr])
    smp = _sep_bilinear(jnp.concatenate(planes, 0), wmy, wmx)
    smp = smp.reshape(smp.shape[0], -1)
    cur = smp[0:3]
    valid_s = smp[3] > 0.99
    m_s = smp[4:6]  # [2, N] display-space offsets
    k = 6
    pos_s = None
    if want_clip:
        pos_s = smp[6:9]
        k = 9
    lo = hi = None
    if cfg.clamp or cfg.locks:
        lo = smp[k : k + 3]
        hi = smp[k + 3 : k + 6]

    # px/py are render-res texel coords of display pixel centers; invert
    # the mapping back to display coords and apply the sampled motion
    hpx = (px + 0.5) / sx - 0.5 + m_s[0]
    hpy = (py + 0.5) / sy - 0.5 + m_s[1]
    hist_rows = history.shape[1]
    hpy_l = hpy - hist_row0
    inside = (
        (hpx >= -0.5) & (hpx <= out_w - 0.5)
        & (hpy >= -0.5) & (hpy <= out_h - 0.5)
        & (hpy_l >= -0.5) & (hpy_l <= hist_rows - 0.5)
    )
    # Catmull-Rom history + previous lock plane from ONE row gather
    hist, lock_s = _fetch_hist_lock(
        history, lock if cfg.locks else None,
        jnp.clip(hpx, 0.0, out_w - 1.0),
        jnp.clip(hpy_l, 0.0, hist_rows - 1.0),
    )

    # -- depth clip (FSR2 disocclusion): the reprojected sample position
    # must agree with the PREVIOUS frame's depth there, else the history
    # belongs to a different surface and is dropped
    disocc = jnp.zeros(px.shape, bool)
    if want_clip:
        eye = jnp.asarray(prev_cam.eye, jnp.float32)
        rel = pos_s - eye[:, None]
        depth_est = jnp.sqrt(jnp.maximum(jnp.sum(rel * rel, 0), 1e-12))
        # reprojected display coords -> render-res texel coords
        rpx = (hpx + 0.5) * sx - 0.5
        rpy = (hpy + 0.5) * sy - 0.5
        prev_d = _bilinear_gather_1(prev_depth_lr, rpx, rpy - lr_row0)
        disocc = (
            jnp.abs(prev_d - depth_est) > cfg.depth_clip_tol * depth_est
        )

    # -- luminance locks: the previous lock plane sampled at the
    # reprojected position (locks follow their feature)
    lock_prev = jnp.zeros(px.shape)
    if cfg.locks and lock_s is not None:
        lock_prev = jnp.where(inside & ~disocc, lock_s, 0.0)
    if cfg.clamp:
        hist_cl = jnp.clip(hist, lo, hi)
        # a locked pixel is a protected thin feature: relax the clamp
        hist = hist_cl + (hist - hist_cl) * lock_prev[None, :]

    # -- auto-reactive mask: luminance divergence raises the current
    # frame's weight so fast shading changes do not ghost
    react = jnp.zeros(px.shape)
    if cfg.reactive_scale > 0.0:
        lum_c = 0.2126 * cur[0] + 0.7152 * cur[1] + 0.0722 * cur[2]
        lum_h = 0.2126 * hist[0] + 0.7152 * hist[1] + 0.0722 * hist[2]
        react = jnp.abs(lum_c - lum_h) / jnp.maximum(
            jnp.maximum(lum_c, lum_h), 1e-3
        )

    ok = inside & valid_s & ~disocc
    alpha = jnp.clip(
        cfg.blend * (0.25 + 0.75 * conf) + react * cfg.reactive_scale,
        0.02, 1.0,
    )
    blended = alpha[None, :] * cur + (1.0 - alpha[None, :]) * hist
    out = jnp.where(ok[None, :], blended, cur)

    new_lock = None
    if cfg.locks:
        # create locks on features the neighborhood clamp would erase:
        # confident current samples whose luminance falls outside the
        # render-res neighborhood range
        lum_c = 0.2126 * cur[0] + 0.7152 * cur[1] + 0.0722 * cur[2]
        lum_lo = 0.2126 * lo[0] + 0.7152 * lo[1] + 0.0722 * lo[2]
        lum_hi = 0.2126 * hi[0] + 0.7152 * hi[1] + 0.0722 * hi[2]
        feature = (lum_c > lum_hi * 1.05) | (lum_c < lum_lo * 0.95)
        create = (feature & (conf > 0.7)).astype(jnp.float32)
        keep = (ok & (react < 0.5)).astype(jnp.float32)
        new_lock = jnp.clip(
            jnp.maximum(lock_prev * (1.0 - cfg.lock_decay) * keep, create),
            0.0, 1.0,
        ).reshape(out_rows, out_w)
    return out.reshape(3, out_rows, out_w), new_lock


def rcas_p(img, sharpness: float = 0.8):
    """Robust contrast-adaptive sharpening of a planar [3, H, W] image
    (AMD FidelityFX RCAS, the sharpening stage FSR2 runs after its
    upscale; algorithm from the public FidelityFX source).

    Per pixel, with cross neighbors b/d/f/h (up/left/right/down) and
    center c, the negative lobe on the neighbors is limited so no channel
    under/overshoots: lobe = clamp(max over channels of
    max(-hit_min, hit_max), -limit, 0) * sharpness, output =
    (lobe * (b+d+f+h) + c) / (4*lobe + 1). Inputs are expected tonemapped
    or exposure-scaled (RCAS assumes roughly [0, 1] signals).
    """
    c = img
    b = jnp.concatenate([img[:, :1], img[:, :-1]], axis=1)
    h = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
    d = jnp.concatenate([img[:, :, :1], img[:, :, :-1]], axis=2)
    f = jnp.concatenate([img[:, :, 1:], img[:, :, -1:]], axis=2)
    mn = jnp.minimum(jnp.minimum(b, d), jnp.minimum(f, h))
    mx = jnp.maximum(jnp.maximum(b, d), jnp.maximum(f, h))
    hit_min = jnp.minimum(mn, c) / jnp.maximum(4.0 * mx, 1e-6)
    hit_max = (1.0 - jnp.maximum(mx, c)) / jnp.minimum(4.0 * mn - 4.0, -1e-6)
    lobe_c = jnp.maximum(-hit_min, hit_max)
    limit = 0.25 - 1.0 / 16.0  # FSR_RCAS_LIMIT
    lobe = jnp.clip(jnp.max(lobe_c, axis=0), -limit, 0.0) * float(sharpness)
    out = (lobe[None] * (b + d + f + h) + c) / (4.0 * lobe[None] + 1.0)
    return out
