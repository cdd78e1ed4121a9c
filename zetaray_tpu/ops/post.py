"""Post-processing: auto-exposure + tonemapping + sRGB encode.

Counterparts of the reference's AutoExposure (256-bin log-luminance histogram
with percentile clipping, AutoExposure_Histogram.hlsl:46-62) and Display
tonemappers (Display.h:105-107, Tonemap.hlsli:10-119 -- AgX family; the
Tony McMapface LUT variant needs the DDS LUT loader and comes later).

Everything is plain jnp: these passes are bandwidth-trivial and XLA fuses
the whole chain into the frame program (the render-graph equivalent of the
Compositing -> AutoExposure -> Display tail of the frame DAG).

Layout: the native implementations are PLANAR (channel-first [3, ...]) --
channel-last [..., 3] puts 3 elements in the 128-lane dimension and wastes
125/128 of every VPU op, which measured ~70 ms of pure layout waste in the
512x512 frame. The channel-last wrappers exist for tests/tools.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import jax.numpy as jnp

from ..core.packing import luminance


# ---------------------------------------------------------------------------
# Auto-exposure: log-luminance histogram + percentile clipping
# ---------------------------------------------------------------------------


def luminance_p(img):
    """Rec.709 luminance over a leading channel axis [3, ...] -> [...]."""
    return 0.2126 * img[0] + 0.7152 * img[1] + 0.0722 * img[2]


def histogram_exposure_p(
    hdr: jnp.ndarray,
    bins: int = 256,
    min_log_lum: float = -10.0,
    max_log_lum: float = 8.0,
    low_clip: float = 0.6,
    high_clip: float = 0.95,
    key_value: float = 0.18,
    axis_name: str | None = None,
):
    """Exposure scale from a clipped log-luminance histogram (planar).

    hdr: [3, ...] linear radiance. Mirrors the reference defaults
    (percentile low/high clipping, AutoExposure.h:21-100). Returns a scalar
    multiplier such that the clipped geometric-mean luminance maps to
    ``key_value`` (middle gray).

    The histogram is one [N] x [N, bins] one-hot matmul on the MXU -- the
    scatter-add formulation measured ~70 ms at 512x512 on TPU.

    ``axis_name``: under pixel-tile sharding, each shard histograms its own
    pixels and the partial histograms are psum-reduced -- bit-identical to
    the whole-image histogram (the TPU analog of the reference's
    wave-cooperative histogram, AutoExposure_Histogram.hlsl:46-62).
    """
    import jax

    lum = luminance_p(hdr.reshape(3, -1))
    ok = lum > 1e-8
    loglum = jnp.clip(jnp.log2(jnp.maximum(lum, 1e-8)), min_log_lum, max_log_lum)
    t = (loglum - min_log_lum) / (max_log_lum - min_log_lum)
    idx = jnp.clip((t * bins).astype(jnp.int32), 0, bins - 1)
    onehot = (
        idx[:, None] == jnp.arange(bins, dtype=jnp.int32)[None, :]
    ).astype(jnp.float32)
    hist = jnp.einsum(
        "n,nb->b", jnp.where(ok, 1.0, 0.0), onehot,
        preferred_element_type=jnp.float32,
    )
    if axis_name is not None:
        hist = jax.lax.psum(hist, axis_name)
    cdf = jnp.cumsum(hist)
    total = cdf[-1]
    lo = low_clip * total
    hi = high_clip * total
    # weight bins inside the [lo, hi] percentile band
    prev_cdf = cdf - hist
    w = jnp.clip(jnp.minimum(cdf, hi) - jnp.maximum(prev_cdf, lo), 0.0, None)
    centers = min_log_lum + (jnp.arange(bins) + 0.5) / bins * (
        max_log_lum - min_log_lum
    )
    mean_log = jnp.sum(centers * w) / jnp.maximum(jnp.sum(w), 1e-6)
    avg_lum = jnp.exp2(mean_log)
    return key_value / jnp.maximum(avg_lum, 1e-8)


def histogram_exposure(hdr: jnp.ndarray, **kw):
    """Channel-last wrapper: hdr [..., 3]."""
    return histogram_exposure_p(hdr.reshape(-1, 3).T, **kw)


def weighted_avg_exposure_p(
    hdr: jnp.ndarray,
    min_lum: float = 5e-3,
    max_lum: float = 4.0,
    lum_map_exp: float = 0.5,
    adaptation_rate: float = 1.0,
    dt: float | None = None,
    prev_avg=None,
    axis_name: str | None = None,
):
    """WeightedAvg auto-exposure (AutoExposure_WeightedAvg.hlsl, the
    reference's second AUTO_EXPOSURE_SHADER variant, AutoExposure.h:14-19).

    Per the reference: luminance is mapped to t = saturate((lum - MinLum)
    / LumRange) ** LumMapExp; the average of t is inverse-mapped back
    (``pow(mean, 1/LumMapExp) * LumRange + MinLum``) and converted to an
    exposure multiplier with the photometric EV100 formula
    (ComputeAutoExposure: S=100, K=12.5, q=0.65). Invalid samples
    (lum <= 0, the reference's bin 0) are excluded from the mean. No
    histogram is materialized -- the reference only builds one so the
    groupshared reduction has something to sum; one mean over pixels is
    the TPU-native equivalent.

    ``prev_avg``/``dt``: optional temporal adaptation state -- the smoothed
    avg luminance blends toward the new value with
    ``1 - exp(-dt_ms * AdaptationRate)`` exactly like the shader's tail.
    Returns (exposure, avg_lum) so callers can carry avg_lum forward.
    """
    import jax

    lum_range = max_lum - min_lum
    lum = luminance_p(hdr.reshape(3, -1))
    ok = lum > 0.0
    t = jnp.clip((lum - min_lum) / lum_range, 0.0, 1.0)
    t = jnp.power(jnp.maximum(t, 1e-12), lum_map_exp)
    s = jnp.sum(jnp.where(ok, t, 0.0))
    cnt = jnp.sum(ok.astype(jnp.float32))
    if axis_name is not None:
        s = jax.lax.psum(s, axis_name)
        cnt = jax.lax.psum(cnt, axis_name)
    mean = s / jnp.maximum(cnt, 1.0)
    result = jnp.power(jnp.maximum(mean, 1e-12), 1.0 / lum_map_exp)
    result = result * lum_range + min_lum
    if prev_avg is not None and dt is not None:
        alpha = 1.0 - jnp.exp(-dt * 1000.0 * adaptation_rate)
        result = prev_avg + (result - prev_avg) * alpha
    # ComputeAutoExposure (shared with the histogram shader's epilogue)
    s_iso, k_cal, q = 100.0, 12.5, 0.65
    ev100 = jnp.log2(jnp.maximum(result * s_iso / k_cal, 1e-12))
    lum_max = (78.0 / (q * s_iso)) * jnp.exp2(ev100)
    return 1.0 / jnp.maximum(lum_max, 1e-12), result


# ---------------------------------------------------------------------------
# Tonemappers
# ---------------------------------------------------------------------------

# AgX fitted matrices + 6th-order sigmoid approximation (Benjamin Wrensch's
# minimal AgX fit of Troy Sobotka's AgX, the same curve family the reference
# exposes as Tonemapper::AgX_* in Tonemap.hlsli).
# NOTE: kept as *NumPy* constants. Module-level jnp arrays become device
# constants inside jit, which on TPU measured 27 ms + a 413 s compile for
# this pass alone (vs ~0.1 ms as HLO literals). Same pathology as
# accel.intersect's INF note.
_AGX_MAT = np.array(
    [
        [0.842479062253094, 0.0423282422610123, 0.0423756549057051],
        [0.0784335999999992, 0.878468636469772, 0.0784336],
        [0.0792237451477643, 0.0791661274605434, 0.879142973793104],
    ],
    dtype=np.float32,
)
_AGX_MAT_INV = np.array(
    [
        [1.19687900512017, -0.0528968517574562, -0.0529716355144438],
        [-0.0980208811401368, 1.15190312990417, -0.0980434501171241],
        [-0.0990297440797205, -0.0989611768448433, 1.15107367264116],
    ],
    dtype=np.float32,
)
_AGX_MIN_EV = -12.47393
_AGX_MAX_EV = 4.026069


def _agx_sigmoid(x):
    x2 = x * x
    x4 = x2 * x2
    return (
        15.5 * x4 * x2
        - 40.14 * x4 * x
        + 31.96 * x4
        - 6.868 * x2 * x
        + 0.4298 * x2
        + 0.1191 * x
        - 0.00232
    )


def tonemap_agx_p(c: jnp.ndarray, look: str = "none") -> jnp.ndarray:
    """AgX display transform, planar: linear rec709 [3, ...] -> [0,1]."""
    v = jnp.einsum("ij,j...->i...", _AGX_MAT, jnp.maximum(c, 1e-10))
    ev = jnp.clip(jnp.log2(v), _AGX_MIN_EV, _AGX_MAX_EV)
    x = (ev - _AGX_MIN_EV) / (_AGX_MAX_EV - _AGX_MIN_EV)
    v = _agx_sigmoid(x)
    if look != "none":
        if look == "golden":
            slope, power, sat = 0.8, 0.8, 1.3
        elif look == "punchy":
            slope, power, sat = 1.0, 1.35, 1.4
        else:
            raise ValueError(f"unknown AgX look: {look}")
        lum = luminance_p(v)[None]
        v = jnp.power(jnp.maximum(v * slope, 1e-10), power)
        v = lum + sat * (v - lum)
    v = jnp.einsum("ij,j...->i...", _AGX_MAT_INV, v)
    return jnp.clip(v, 0.0, 1.0)


def tonemap_agx(c: jnp.ndarray, look: str = "none") -> jnp.ndarray:
    """AgX display transform. ``c`` linear rec709 [..., 3] -> display [0,1].

    looks: "none" (default AgX), "golden", "punchy" -- mirroring the
    reference's AgX Default/Golden/Punchy options (Display.h:105-107).
    """
    return jnp.moveaxis(tonemap_agx_p(jnp.moveaxis(c, -1, 0), look), 0, -1)


def tonemap_neutral_p(c: jnp.ndarray) -> jnp.ndarray:
    """Simple invertible Reinhard-extended placeholder for 'Neutral'
    (the reference's Neutral uses the Tony McMapface LUT; lands with the
    DDS loader)."""
    l = luminance_p(c)[None]
    return c / (1.0 + l)


def tonemap_neutral(c: jnp.ndarray) -> jnp.ndarray:
    return jnp.moveaxis(tonemap_neutral_p(jnp.moveaxis(c, -1, 0)), 0, -1)


def tonemap_none(c: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(c, 0.0, 1.0)


# ---------------------------------------------------------------------------
# Tony McMapface (Display.h:105-107 "Neutral" slot: 48^3 LUT by Tomasz
# Stachowiak, Tonemap.hlsli:10-22). The LUT ships as a DX10 3D DDS in
# R9G9B9E5_SHAREDEXP; decoded once and cached.
# ---------------------------------------------------------------------------

_TONY_LUT_PATH = (
    Path(__file__).resolve().parents[2].parent
    / "reference" / "Assets" / "LUT" / "tony_mc_mapface.dds"
)
_tony_cache: list = []


def load_lut_3d(path) -> np.ndarray:
    """DX10 3D DDS in R9G9B9E5_SHAREDEXP -> [D, H, W, 3] float32."""
    import struct

    raw = Path(path).read_bytes()
    assert raw[:4] == b"DDS ", "not a DDS file"
    _, _, h, w, _, d, _ = struct.unpack_from("<7I", raw, 4)
    fourcc = struct.unpack_from("<4s", raw, 84)[0]
    assert fourcc == b"DX10", "3D LUT loader expects a DX10 header"
    dxgi, dim = struct.unpack_from("<2I", raw, 128)[:2]
    assert dxgi == 67 and dim == 4, f"expected R9G9B9E5 TEXTURE3D, got {dxgi}/{dim}"
    u = np.frombuffer(raw, np.uint32, count=d * h * w, offset=148)
    r = (u & 0x1FF).astype(np.float32)
    g = ((u >> 9) & 0x1FF).astype(np.float32)
    b = ((u >> 18) & 0x1FF).astype(np.float32)
    e = ((u >> 27) & 0x1F).astype(np.int32)
    scale = np.exp2(e.astype(np.float32) - 15.0 - 9.0)
    out = np.stack([r * scale, g * scale, b * scale], -1)
    return out.reshape(d, h, w, 3)


def tony_lut(path=None) -> np.ndarray:
    """Cached Tony McMapface LUT [48, 48, 48, 3].

    Cached as NumPy (NOT jnp): a device array created during a jit trace is
    a tracer, and caching it module-level leaks it out of the trace. The
    per-call jnp.asarray below turns it into a baked constant each trace.
    """
    if not _tony_cache:
        _tony_cache.append(load_lut_3d(path or _TONY_LUT_PATH))
    return _tony_cache[0]


def tonemap_tony_p(c: jnp.ndarray, lut=None) -> jnp.ndarray:
    """Tony McMapface: planar [3, ...] linear HDR -> display [0, 1].

    encoded = c / (c + 1), aligned to texel centers, trilinear through the
    48^3 LUT (Tonemap.hlsli:10-22). Texture3D convention: w/u indexes red,
    v green, depth slice blue.
    """
    if lut is None:
        lut = tony_lut()
    lut = jnp.asarray(lut)
    dims = float(lut.shape[0])
    shp = c.shape[1:]
    x = jnp.maximum(c.reshape(3, -1), 0.0)
    enc = x / (x + 1.0)
    t = enc * (dims - 1.0)  # texel coords in [0, dims-1]
    t0 = jnp.floor(t)
    f = t - t0
    i0 = jnp.clip(t0.astype(jnp.int32), 0, int(dims) - 1)
    i1 = jnp.minimum(i0 + 1, int(dims) - 1)
    flat = lut.reshape(-1, 3)
    n = int(dims)

    def at(bz, gy, rx):
        return flat[(bz * n + gy) * n + rx]  # [N, 3]

    fr, fg, fb = f[0][:, None], f[1][:, None], f[2][:, None]
    out = jnp.zeros((x.shape[1], 3))
    for dz, wz in ((i0[2], 1 - fb), (i1[2], fb)):
        for dy, wy in ((i0[1], 1 - fg), (i1[1], fg)):
            row = at(dz, dy, i0[0]) * (1 - fr) + at(dz, dy, i1[0]) * fr
            out = out + row * wy * wz
    return jnp.clip(out.T.reshape((3,) + shp), 0.0, 1.0)


# ---------------------------------------------------------------------------
# Picked-object Sobel outline (Display.cpp:358-398: depth-tested wireframe
# + Sobel edge pass over the picked mask)
# ---------------------------------------------------------------------------


def picked_outline_p(ldr, inst_img, picked, color=(1.0, 0.62, 0.1),
                     threshold=0.5):
    """Overlay a Sobel outline of the picked instances.

    ldr: [3, H, W] display image (any range); inst_img: [H, W] per-pixel
    instance ids (G.INST plane); picked: int or sequence of instance ids.
    """
    ids = jnp.atleast_1d(jnp.asarray(picked, jnp.float32))
    mask = jnp.zeros(inst_img.shape, jnp.float32)
    for k in range(ids.shape[0]):
        mask = jnp.maximum(mask, (jnp.abs(inst_img - ids[k]) < 0.5) * 1.0)

    def sh(dy, dx):
        return jnp.roll(jnp.roll(mask, dy, 0), dx, 1)

    gx = (
        sh(-1, 1) + 2 * sh(0, 1) + sh(1, 1)
        - sh(-1, -1) - 2 * sh(0, -1) - sh(1, -1)
    )
    gy = (
        sh(1, -1) + 2 * sh(1, 0) + sh(1, 1)
        - sh(-1, -1) - 2 * sh(-1, 0) - sh(-1, 1)
    )
    edge = jnp.sqrt(gx * gx + gy * gy) > threshold
    col = jnp.asarray(color, jnp.float32)[:, None, None]
    return jnp.where(edge[None], col, ldr)


TONEMAPPERS = {
    "none": tonemap_none,
    "neutral": tonemap_neutral,
    "agx": tonemap_agx,
    "agx_golden": lambda c: tonemap_agx(c, "golden"),
    "agx_punchy": lambda c: tonemap_agx(c, "punchy"),
}

TONEMAPPERS_P = {
    "none": tonemap_none,  # elementwise: layout-agnostic
    "neutral": tonemap_neutral_p,
    "agx": tonemap_agx_p,
    "agx_golden": lambda c: tonemap_agx_p(c, "golden"),
    "agx_punchy": lambda c: tonemap_agx_p(c, "punchy"),
    "tony": tonemap_tony_p,
}


def srgb_encode(c: jnp.ndarray) -> jnp.ndarray:
    """Linear [0,1] -> sRGB [0,1] (the Display pass's sRGB backbuffer)."""
    c = jnp.clip(c, 0.0, 1.0)
    lo = 12.92 * c
    hi = 1.055 * jnp.power(jnp.maximum(c, 1e-8), 1.0 / 2.4) - 0.055
    return jnp.where(c <= 0.0031308, lo, hi)


def to_u8(c: jnp.ndarray) -> jnp.ndarray:
    return jnp.round(jnp.clip(c, 0.0, 1.0) * 255.0).astype(jnp.uint8)
