"""Packed temporal G-buffer: the reference's packed plane formats as the
frame-to-frame state, not just a library.

The reference's G-buffer planes are packed GPU formats -- octahedral
R16G16_SNORM normals, R32_FLOAT depth (GBufferRT.h:15-34, Math/Octahedral)
-- and every temporal pass (ReSTIR temporal reuse, SkyDI, TAA) reads the
*previous frame's* packed planes. This module gives the TPU frame the same
property: ``FrameState.gbuf`` carries TG_ROWS packed rows instead of the
40-row shading G-buffer, so

  - temporal reuse reads bit-exact reference formats (oct16 snorm normals:
    the same quantization decisions the reference's temporal kernels see);
  - the temporal state is 13x smaller (3 vs 40 f32 rows/pixel), which is
    HBM traffic and multi-chip halo-exchange bytes.

Rows (all f32-typed so one array stays one dtype; integers are bitcast):
  TG.NORMAL  oct16x2-encoded shading normal, u32 bits carried in f32
  TG.DEPTH   primary-hit ray parameter t (R32F); 0 = miss, so depth > 0
             doubles as the validity test (misses write DEPTH = 0)
  TG.INST    instance id as float (-1 = miss) -- picking outline + motion
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..accel.megakernel import G
from ..core import packing as PK


class TG:
    NORMAL = 0
    DEPTH = 1
    INST = 2
    ROWS = 3


def pack_temporal(gb: jnp.ndarray) -> jnp.ndarray:
    """[G.ROWS, N] shading G-buffer -> [TG.ROWS, N] packed temporal planes."""
    ns = jnp.stack([gb[G.NS], gb[G.NS + 1], gb[G.NS + 2]], axis=-1)
    oct_bits = PK.oct_encode_u16x2(ns)  # [N] uint32
    valid = gb[G.VALID] > 0.5
    return jnp.stack(
        [
            jax.lax.bitcast_convert_type(oct_bits, jnp.float32),
            jnp.where(valid, gb[G.DEPTH], 0.0),
            gb[G.INST],
        ]
    )


def unpack_normal(tg_rows: jnp.ndarray):
    """Packed rows -> (ns_x, ns_y, ns_z) decoded from oct16 snorm."""
    bits = jax.lax.bitcast_convert_type(tg_rows[TG.NORMAL], jnp.uint32)
    n = PK.oct_decode_u16x2(bits)  # [N, 3]
    return n[..., 0], n[..., 1], n[..., 2]


def depth_valid(tg_rows: jnp.ndarray):
    """(depth, valid) from packed rows; misses have depth 0."""
    d = tg_rows[TG.DEPTH]
    return d, d > 0.0


def temporal_geom_ok(prev_g, ns, depth_est, depth_tol, normal_tol):
    """The shared reuse-validity test against gathered PACKED prev planes:
    |t_prev - t_est| within relative tolerance, decoded oct16 normals
    agree, previous pixel was a hit. ``ns``: current V3 shading normal."""
    nx, ny, nz = unpack_normal(prev_g)
    depth_prev, prev_valid = depth_valid(prev_g)
    depth_ok = jnp.abs(depth_prev - depth_est) < (
        depth_tol * jnp.maximum(depth_est, 1e-3)
    )
    n_dot = ns.x * nx + ns.y * ny + ns.z * nz
    return depth_ok & (n_dot > normal_tol) & prev_valid
