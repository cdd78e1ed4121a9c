"""Texture loading: DDS (BCn via the native decoder) and PNG.

Counterpart of the reference's DDS texture path (Core/dds.h + GpuMemory
texture upload; offline compression by Tools/BCnCompressglTF). Textures are
decoded to linear-float RGBA mip 0 on the host and sampled at primary
visibility in XLA (scene/texturing in the G-buffer modes); BC6/BC7 decode is
a known round-2 gap (raises NotImplementedError, callers fall back to the
material factor).
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np

_DXGI_TO_BC = {
    70: "BC1", 71: "BC1", 72: "BC1",
    73: "BC2", 74: "BC2", 75: "BC2",
    76: "BC3", 77: "BC3", 78: "BC3",
    79: "BC4", 80: "BC4", 81: "BC4",
    82: "BC5", 83: "BC5", 84: "BC5",
}
_DXGI_SRGB = {72, 75, 78, 99}
_FOURCC_TO_BC = {b"DXT1": "BC1", b"DXT3": "BC2", b"DXT5": "BC3"}


def load_dds(path: str | Path) -> np.ndarray:
    """DDS -> float32 linear RGBA [H, W, 4] (mip 0)."""
    data = Path(path).read_bytes()
    if data[:4] != b"DDS ":
        raise ValueError("not a DDS file")
    (size, flags, height, width) = struct.unpack_from("<4I", data, 4)
    fourcc = data[84:88]
    off = 128
    srgb = False
    if fourcc == b"DX10":
        (dxgi, dim, misc, asize, misc2) = struct.unpack_from("<5I", data, 128)
        off = 148
        srgb = dxgi in _DXGI_SRGB
        if dxgi not in _DXGI_TO_BC:
            raise NotImplementedError(f"DDS DXGI format {dxgi} unsupported (BC6/BC7 pending)")
        fmt = _DXGI_TO_BC[dxgi]
    elif fourcc in _FOURCC_TO_BC:
        fmt = _FOURCC_TO_BC[fourcc]
    else:
        raise NotImplementedError(f"DDS fourcc {fourcc!r} unsupported")
    from ..native import decode_bcn

    rgba8 = decode_bcn(fmt, data[off:], width, height)
    img = rgba8.astype(np.float32) / 255.0
    if srgb:
        img[..., :3] = np.where(
            img[..., :3] <= 0.04045,
            img[..., :3] / 12.92,
            ((img[..., :3] + 0.055) / 1.055) ** 2.4,
        )
    return img


def load_texture(path: str | Path) -> np.ndarray | None:
    """Best-effort texture load -> float32 linear RGBA [H, W, 4] or None."""
    p = Path(path)
    if not p.exists():
        return None
    try:
        if p.suffix.lower() == ".dds":
            return load_dds(p)
        if p.suffix.lower() == ".png":
            from ..utils.png import read_png

            img = read_png(str(p)).astype(np.float32) / 255.0
            if img.shape[2] == 3:
                img = np.concatenate([img, np.ones_like(img[..., :1])], -1)
            # PNGs are assumed sRGB color
            img[..., :3] = np.where(
                img[..., :3] <= 0.04045,
                img[..., :3] / 12.92,
                ((img[..., :3] + 0.055) / 1.055) ** 2.4,
            )
            return img
    except NotImplementedError:
        return None
    except Exception:
        return None
    return None


def load_scene_textures(cpu_scene) -> dict:
    """Decode all referenced textures -> {index: jnp [H, W, 4] linear}."""
    import jax.numpy as jnp

    out = {}
    for i, p in enumerate(cpu_scene.texture_paths or []):
        img = load_texture(p) if p else None
        if img is not None:
            out[i] = jnp.asarray(img)
    return out


def apply_textures_to_gbuffer(gbuf, textures: dict):
    """Modulate G-buffer base color by each pixel's base-color texture.

    The primary-visibility texturing step (the reference samples textures
    in GBufferRT via bindless descriptors; here it is one masked bilinear
    fetch per distinct texture -- fine for scene-scale texture counts).
    """
    import jax.numpy as jnp

    from ..accel.megakernel import G

    if not textures:
        return gbuf
    uv = gbuf[G.UV : G.UV + 2].T
    texid = gbuf[G.TEXID]
    base = gbuf[G.BASE : G.BASE + 3]
    for idx, tex in sorted(textures.items()):
        rgba = sample_bilinear(tex, uv)
        mask = texid == float(idx)
        base = jnp.where(mask[None, :], base * rgba[:, :3].T, base)
    return gbuf.at[G.BASE : G.BASE + 3].set(base)


def sample_bilinear(tex, uv):
    """Bilinear texture fetch (XLA). tex [H, W, 4] jnp; uv [N, 2] in [0,1].

    Wrap addressing, mip 0 (ray-cone mip selection is a round-2 item).
    """
    import jax.numpy as jnp

    h, w, _ = tex.shape
    u = uv[:, 0] * w - 0.5
    v = uv[:, 1] * h - 0.5
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    fu = (u - x0)[:, None]
    fv = (v - y0)[:, None]
    x0 = jnp.mod(x0.astype(jnp.int32), w)
    y0 = jnp.mod(y0.astype(jnp.int32), h)
    x1 = jnp.mod(x0 + 1, w)
    y1 = jnp.mod(y0 + 1, h)
    t00 = tex[y0, x0]
    t10 = tex[y0, x1]
    t01 = tex[y1, x0]
    t11 = tex[y1, x1]
    return (
        t00 * (1 - fu) * (1 - fv)
        + t10 * fu * (1 - fv)
        + t01 * (1 - fu) * fv
        + t11 * fu * fv
    )
