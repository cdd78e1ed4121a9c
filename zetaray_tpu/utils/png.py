"""Tiny dependency-free PNG writer/reader (8-bit RGB/RGBA).

The framework's screenshot path (reference: ``CaptureScreen``,
SceneRenderer.h:48) without pulling in PIL.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def encode_png(img: np.ndarray) -> bytes:
    """img: [H, W, 3|4] uint8 -> PNG file bytes."""
    img = np.ascontiguousarray(img)
    assert img.dtype == np.uint8 and img.ndim == 3 and img.shape[2] in (3, 4)
    h, w, c = img.shape
    color_type = 2 if c == 3 else 6
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        body = tag + data
        return struct.pack(">I", len(data)) + body + struct.pack(">I", zlib.crc32(body))

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def write_png(path: str, img: np.ndarray) -> None:
    """img: [H, W, 3|4] uint8."""
    with open(path, "wb") as f:
        f.write(encode_png(img))


def read_png(path: str) -> np.ndarray:
    """Minimal reader for files written by :func:`write_png` (filter 0 only)."""
    data = open(path, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    off = 8
    w = h = c = None
    idat = b""
    while off < len(data):
        (length,) = struct.unpack_from(">I", data, off)
        tag = data[off + 4 : off + 8]
        body = data[off + 8 : off + 8 + length]
        if tag == b"IHDR":
            w, h, depth, color_type = struct.unpack_from(">IIBB", body)
            assert depth == 8 and color_type in (2, 6)
            c = 3 if color_type == 2 else 4
        elif tag == b"IDAT":
            idat += body
        off += 12 + length
    raw = zlib.decompress(idat)
    stride = w * c + 1
    out = np.empty((h, w, c), np.uint8)
    prev = np.zeros(w * c, np.uint16)
    for y in range(h):
        row = raw[y * stride : (y + 1) * stride]
        filt = row[0]
        cur = np.frombuffer(row[1:], np.uint8).astype(np.uint16)
        if filt == 0:
            pass
        elif filt == 2:  # Up
            cur = (cur + prev) & 0xFF
        else:
            raise NotImplementedError(f"PNG filter {filt}")
        out[y] = cur.astype(np.uint8).reshape(w, c)
        prev = cur
    return out
