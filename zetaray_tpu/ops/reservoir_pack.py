"""Packed reservoir encodings for reuse-path gathers.

The reference stores its ReSTIR reservoirs in packed textures -- DI uses two
RGBA32U planes (DirectLighting/DirectLighting.h:106-116), ReSTIR PT a
7-texture set (IndirectLighting.h:303-340) -- and every temporal/spatial
kernel reads the packed form directly. This module is the TPU counterpart:
the merge-relevant reservoir fields quantized into uint32 rows (oct16 snorm
normals, IEEE halfs, rgb8 factors -- core.packing, same encodings as the
reference's Octahedral/half formats), so

  * temporal/spatial gathers move 8 rows instead of 16 (DI/GI) and 12
    instead of 32 (PT) -- the gather is the pass's dominant cost;
  * banded windows (core.gatherband) fit 2x more rows in VMEM;
  * the stored form matches the reference's quantization, per BASELINE's
    "same packed formats" bar.

Only the fields a *merge at another pixel* needs are packed: the running
w_sum / phat of the destination pixel never travel, and every merge
re-evaluates the candidate's target at the destination surface.

Layouts (rows of one uint32 each; f32 values bitcast):

DI / GI (8 rows):            PT (28 rows):
  0-2  y_pos.xyz f32           0-2  x_rc.xyz f32
  3    oct16(y_ng)             3    oct16(n_rc)
  4    half2(le.xy)            4    half2(le.xy)
  5    half(le.z)|two<<16      5    half2(le.z, dist)
  6    W f32                   6    oct16(w_s)
  7    M u16 | half(phat)<<16  7    half2(ls.xy)
                               8    half2(ls.z, rough)
                               9    rgb8(base)|metal8<<24
                               10   W f32
                               11   M u16
                               12   srcpix u24 | has3<<24  (replay identity)
                               13   srcseed u32
                               14   pdfa f32
                               15-17 x3.xyz f32
                               18   oct16(n3)
                               19   half2(le3.xy)
                               20   half2(le3.z, r3)
                               21   rgb8(b3)|m3_u8<<24
                               22   oct16(ws3)
                               23   half2(ls3.xy)
                               24   half(ls3.z)
                               25   pdfs3 f32
                               26   half2(trans, coat_w)  (rc glass/coat)
                               27   half2(eta, coat_r)

(DI row 7 carries the sample's own target value for the pairwise-MIS
spatial pass, which reads the neighbor's p_i(y_i) -- PairwiseMIS.hlsli.
PT rows 12-25 carry the replay-shift state: the generating RNG identity
must survive the packed round trip exactly, so srcpix/srcseed/pdfa/x3 are
stored raw; the reference's RBuffers store the same replay state,
IndirectLighting.h:303-340.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import packing as P
from ..core.rows import stack_rows

DI_PACKED_ROWS = 8
PT_PACKED_ROWS = 30
_F16_MAX = 65504.0


def _u32(x):
    return jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)


def _f32(x):
    return jax.lax.bitcast_convert_type(x.astype(jnp.uint32), jnp.float32)


def _h(x):
    """f32 -> f16 bits (clamped to the finite f16 range)."""
    return P.jax_f16_bits(jnp.clip(x, -_F16_MAX, _F16_MAX))


def _h2(a, b):
    """Two f32 rows -> one uint32 of finite-clamped halfs."""
    return P.pack_f16x2(
        jnp.clip(a, -_F16_MAX, _F16_MAX), jnp.clip(b, -_F16_MAX, _F16_MAX)
    )


def _oct_rows(x, y, z):
    return P.oct_encode_u16x2(jnp.stack([x, y, z], -1))


def _unoct_rows(p):
    v = P.oct_decode_u16x2(p)
    return v[..., 0], v[..., 1], v[..., 2]


def pack_di(res):
    """[16, N] DI/GI reservoir rows -> [8, N] uint32 packed rows.

    Works for restir_di (rows 12 = two_sided) and restir_gi (row 12 unused
    there -- packing a junk flag is harmless since GI never reads it).
    """
    two = (res[12] > 0.5).astype(jnp.uint32)
    return jnp.stack([
        _u32(res[0]), _u32(res[1]), _u32(res[2]),
        _oct_rows(res[3], res[4], res[5]),
        _h2(res[6], res[7]),
        _h(res[8]) | (two << 16),
        _u32(res[11]),
        jnp.clip(res[10], 0.0, 65535.0).astype(jnp.uint32)
        | (_h(res[13]) << 16),
    ], 0)


def unpack_di(p, rows: int = 16):
    """[8, N] packed -> [rows, N] f32 reservoir rows (w_sum/phat zeroed)."""
    n = p.shape[1]
    nx, ny, nz = _unoct_rows(p[3])
    le_x, le_y = P.unpack_f16x2(p[4])
    le_z = P.f16_bits_to_f32((p[5] & jnp.uint32(0xFFFF)).astype(jnp.uint16))
    two = ((p[5] >> 16) & jnp.uint32(1)).astype(jnp.float32)
    return stack_rows(rows, {
        0: _f32(p[0]), 1: _f32(p[1]), 2: _f32(p[2]),
        3: nx, 4: ny, 5: nz,
        6: le_x, 7: le_y, 8: le_z,
        10: (p[7] & jnp.uint32(0xFFFF)).astype(jnp.float32),
        11: _f32(p[6]),
        12: two,
        13: P.f16_bits_to_f32(
            ((p[7] >> 16) & jnp.uint32(0xFFFF)).astype(jnp.uint16)
        ),
    }, n=n)


def pack_pt(res):
    """[PR.ROWS, N] ReSTIR PT reservoir -> [30, N] uint32 packed rows."""
    from .restir_pt import PR

    def rgb8m(base3, metal):
        return P.pack_rgb8(jnp.stack(base3, -1)) | (
            jnp.round(jnp.clip(metal, 0.0, 1.0) * 255.0).astype(jnp.uint32)
            << 24
        )

    srcpix = jnp.clip(res[PR.SRCPIX], 0.0, float((1 << 24) - 1)).astype(jnp.uint32)
    has3 = (res[PR.HAS3] > 0.5).astype(jnp.uint32)
    return jnp.stack([
        _u32(res[PR.X]), _u32(res[PR.X + 1]), _u32(res[PR.X + 2]),
        _oct_rows(res[PR.N], res[PR.N + 1], res[PR.N + 2]),
        _h2(res[PR.LE], res[PR.LE + 1]),
        _h2(res[PR.LE + 2], res[PR.DIST]),
        _oct_rows(res[PR.WS], res[PR.WS + 1], res[PR.WS + 2]),
        _h2(res[PR.LS], res[PR.LS + 1]),
        _h2(res[PR.LS + 2], res[PR.ROUGH]),
        rgb8m((res[PR.BASE], res[PR.BASE + 1], res[PR.BASE + 2]),
              res[PR.METAL]),
        _u32(res[PR.W]),
        jnp.clip(res[PR.M], 0.0, 65535.0).astype(jnp.uint32),
        srcpix | (has3 << 24),
        jax.lax.bitcast_convert_type(res[PR.SRCSEED], jnp.uint32),
        _u32(res[PR.PDFA]),
        _u32(res[PR.X3]), _u32(res[PR.X3 + 1]), _u32(res[PR.X3 + 2]),
        _oct_rows(res[PR.N3], res[PR.N3 + 1], res[PR.N3 + 2]),
        _h2(res[PR.LE3], res[PR.LE3 + 1]),
        _h2(res[PR.LE3 + 2], res[PR.R3]),
        rgb8m((res[PR.B3], res[PR.B3 + 1], res[PR.B3 + 2]), res[PR.M3]),
        _oct_rows(res[PR.WS3], res[PR.WS3 + 1], res[PR.WS3 + 2]),
        _h2(res[PR.LS3], res[PR.LS3 + 1]),
        _h(res[PR.LS3 + 2]),
        _u32(res[PR.PDFS3]),
        _h2(res[PR.TRANS], res[PR.COATW]),
        _h2(res[PR.ETA], res[PR.COATR]),
        _h2(res[PR.TRANS3], res[PR.COATW3]),
        _h2(res[PR.ETA3], res[PR.COATR3]),
    ], 0)


def unpack_pt(p):
    """[30, N] packed -> [PR.ROWS, N] f32 rows (w_sum/phat zeroed)."""
    from .restir_pt import PR

    n = p.shape[1]
    nx, ny, nz = _unoct_rows(p[3])
    le_x, le_y = P.unpack_f16x2(p[4])
    le_z, dist = P.unpack_f16x2(p[5])
    wx, wy, wz = _unoct_rows(p[6])
    ls_x, ls_y = P.unpack_f16x2(p[7])
    ls_z, rough = P.unpack_f16x2(p[8])
    base = P.unpack_rgb8(p[9])
    metal = ((p[9] >> 24) & jnp.uint32(0xFF)).astype(jnp.float32) / 255.0
    n3x, n3y, n3z = _unoct_rows(p[18])
    l3x, l3y = P.unpack_f16x2(p[19])
    l3z, r3 = P.unpack_f16x2(p[20])
    b3 = P.unpack_rgb8(p[21])
    m3 = ((p[21] >> 24) & jnp.uint32(0xFF)).astype(jnp.float32) / 255.0
    w3x, w3y, w3z = _unoct_rows(p[22])
    s3x, s3y = P.unpack_f16x2(p[23])
    s3z = P.f16_bits_to_f32((p[24] & jnp.uint32(0xFFFF)).astype(jnp.uint16))
    t_, cw_ = P.unpack_f16x2(p[26])
    e_, cr_ = P.unpack_f16x2(p[27])
    t3_, cw3_ = P.unpack_f16x2(p[28])
    e3_, cr3_ = P.unpack_f16x2(p[29])
    return stack_rows(PR.ROWS, {
        PR.X: _f32(p[0]), PR.X + 1: _f32(p[1]), PR.X + 2: _f32(p[2]),
        PR.N: nx, PR.N + 1: ny, PR.N + 2: nz,
        PR.LE: le_x, PR.LE + 1: le_y, PR.LE + 2: le_z,
        PR.WS: wx, PR.WS + 1: wy, PR.WS + 2: wz,
        PR.LS: ls_x, PR.LS + 1: ls_y, PR.LS + 2: ls_z,
        PR.BASE: base[..., 0], PR.BASE + 1: base[..., 1],
        PR.BASE + 2: base[..., 2],
        PR.METAL: metal, PR.ROUGH: rough, PR.DIST: dist,
        PR.W: _f32(p[10]), PR.M: p[11].astype(jnp.float32),
        # replay-shift state
        PR.SRCPIX: (p[12] & jnp.uint32(0xFFFFFF)).astype(jnp.float32),
        PR.HAS3: ((p[12] >> 24) & jnp.uint32(1)).astype(jnp.float32),
        PR.SRCSEED: jax.lax.bitcast_convert_type(p[13], jnp.float32),
        PR.PDFA: _f32(p[14]),
        PR.X3: _f32(p[15]), PR.X3 + 1: _f32(p[16]), PR.X3 + 2: _f32(p[17]),
        PR.N3: n3x, PR.N3 + 1: n3y, PR.N3 + 2: n3z,
        PR.LE3: l3x, PR.LE3 + 1: l3y, PR.LE3 + 2: l3z,
        PR.B3: b3[..., 0], PR.B3 + 1: b3[..., 1], PR.B3 + 2: b3[..., 2],
        PR.M3: m3, PR.R3: r3,
        PR.WS3: w3x, PR.WS3 + 1: w3y, PR.WS3 + 2: w3z,
        PR.LS3: s3x, PR.LS3 + 1: s3y, PR.LS3 + 2: s3z,
        PR.PDFS3: _f32(p[25]),
        PR.TRANS: t_, PR.COATW: cw_, PR.ETA: e_, PR.COATR: cr_,
        PR.TRANS3: t3_, PR.COATW3: cw3_, PR.ETA3: e3_, PR.COATR3: cr3_,
    }, n=n)
