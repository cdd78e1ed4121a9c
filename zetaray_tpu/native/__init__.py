"""Native (C++) runtime components, bound via ctypes.

Currently: the BCn texture decoder (bcdec.cpp). The shared library is built
lazily with g++ on first use and cached next to the source -- the TPU-side
analog of the reference shipping prebuilt native tooling (BCnCompressglTF /
DirectXTex). No pybind11 dependency; plain C ABI + ctypes.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).resolve().parent
_SRC = _DIR / "bcdec.cpp"
_LIB = _DIR / "libbcdec.so"
_lib = None


def _build() -> Path:
    if _LIB.exists() and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return _LIB
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-o", str(_LIB), str(_SRC)],
        check=True,
        capture_output=True,
    )
    return _LIB


def _get():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(str(_build()))
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        for fn in (
            "bc1_decode", "bc2_decode", "bc3_decode", "bc4_decode",
            "bc5_decode", "bc7_decode",
        ):
            f = getattr(lib, fn)
            f.argtypes = [u8p, ctypes.c_int, ctypes.c_int, u8p]
            f.restype = None
        lib.bc6h_decode.argtypes = [u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p]
        lib.bc6h_decode.restype = None
        _lib = lib
    return _lib


_BLOCK_BYTES = {"BC1": 8, "BC2": 16, "BC3": 16, "BC4": 8, "BC5": 16,
                "BC7": 16, "BC6H": 16, "BC6H_SF": 16}


def decode_bcn(fmt: str, data: bytes, width: int, height: int) -> np.ndarray:
    """Decode one BCn mip level.

    BC1-5, BC7 -> RGBA8 [H, W, 4]; BC6H / BC6H_SF (HDR) -> float32 RGBA.
    """
    fmt = fmt.upper()
    if fmt not in _BLOCK_BYTES:
        raise NotImplementedError(f"BC format {fmt} not supported")
    bw, bh = (width + 3) // 4, (height + 3) // 4
    need = bw * bh * _BLOCK_BYTES[fmt]
    if len(data) < need:
        raise ValueError(f"{fmt}: need {need} bytes, got {len(data)}")
    src = np.frombuffer(data, np.uint8, count=need)
    lib = _get()
    if fmt.startswith("BC6H"):
        out = np.empty(height * width * 4, np.float32)
        lib.bc6h_decode(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            width, height, 1 if fmt == "BC6H_SF" else 0,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return out.reshape(height, width, 4)
    out = np.empty(height * width * 4, np.uint8)
    fn = getattr(lib, f"{fmt.lower()}_decode")
    fn(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        width,
        height,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out.reshape(height, width, 4)
