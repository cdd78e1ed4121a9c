"""Fused Pallas TPU kernels for ray/triangle intersection.

The jnp intersector (accel.intersect) is bandwidth-bound: every [N, 3C]
matmul output and [N, C] elementwise intermediate round-trips HBM, and the
post-hit attribute gathers lower to slow dynamic-gathers. These kernels keep
the whole pipeline in VMEM:

  grid = (ray_tiles, tri_chunks)           # tri chunk is the fast axis
  per step:  [RT,4] @ [4,3TC] on the MXU   # Woop local coords
             t/u/v/valid on the VPU
             masked min + argmin via iota
             one-hot [RT,TC] @ [TC,A] attribute gather on the MXU
  outputs (t, tri, u, v, attrs) accumulate in VMEM across tri chunks.

The in-kernel one-hot matmul replaces *all* post-hit gathers (normals, uvs,
material parameters) -- the TPU answer to "gather-heavy memory access"
(SURVEY.md hard parts #2): turn the gather into MXU work on data already
resident in VMEM.

Used automatically on TPU; the jnp path remains as the CPU/testing oracle
(accel.intersect dispatches on backend).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 3.0e38
_HI = jax.lax.Precision.HIGHEST


def _pick_tiles(n_rays: int, n_tris: int):
    tc = min(512, n_tris)
    while n_tris % tc:
        tc -= 128
    # keep [RT, 3TC] f32 + one-hot under ~6 MB of VMEM
    rt = 1024 if tc <= 256 else 512
    rt = min(rt, n_rays)
    while n_rays % rt:
        rt //= 2
    return max(rt, 8), tc


def _tri_hits_tile(o4, d4, w, t_min, t_max, tc):
    """[RT,4] x [4,3,TC] -> t (INF at miss), u, v, each [RT,TC]."""
    wm = w.reshape(4, 3 * tc)
    lo = jnp.dot(o4, wm, preferred_element_type=jnp.float32, precision=_HI)
    ld = jnp.dot(d4, wm, preferred_element_type=jnp.float32, precision=_HI)
    ou, ov, ow = lo[:, :tc], lo[:, tc : 2 * tc], lo[:, 2 * tc :]
    du, dv, dw = ld[:, :tc], ld[:, tc : 2 * tc], ld[:, 2 * tc :]
    par = jnp.abs(dw) < 1e-12
    t = -ow / jnp.where(par, 1.0, dw)
    u = ou + t * du
    v = ov + t * dv
    valid = (
        (~par) & (t > t_min) & (t < t_max) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
    )
    return jnp.where(valid, t, INF), u, v


def _closest_kernel(
    o4_ref, d4_ref, w_ref, attr_ref,
    t_ref, tri_ref, u_ref, v_ref, attr_out_ref,
    *, tc, t_min, t_max,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        t_ref[:] = jnp.full_like(t_ref, INF)
        tri_ref[:] = jnp.full_like(tri_ref, -1)
        u_ref[:] = jnp.zeros_like(u_ref)
        v_ref[:] = jnp.zeros_like(v_ref)
        attr_out_ref[:] = jnp.zeros_like(attr_out_ref)

    t, u, v = _tri_hits_tile(o4_ref[:], d4_ref[:], w_ref[:], t_min, t_max, tc)
    rt = t.shape[0]
    tmin = jnp.min(t, axis=1)
    hit = tmin < INF
    is_min = t == tmin[:, None]
    iota = jax.lax.broadcasted_iota(jnp.int32, (rt, tc), 1)
    idx = jnp.max(jnp.where(is_min, iota, -1), axis=1)
    sel = (iota == idx[:, None]) & hit[:, None]
    self32 = sel.astype(jnp.float32)
    u_best = jnp.sum(jnp.where(sel, u, 0.0), axis=1)
    v_best = jnp.sum(jnp.where(sel, v, 0.0), axis=1)
    attr_best = jnp.dot(
        self32, attr_ref[:], preferred_element_type=jnp.float32, precision=_HI
    )
    better = tmin < t_ref[:]
    t_ref[:] = jnp.where(better, tmin, t_ref[:])
    tri_ref[:] = jnp.where(better, j * tc + idx, tri_ref[:])
    u_ref[:] = jnp.where(better, u_best, u_ref[:])
    v_ref[:] = jnp.where(better, v_best, v_ref[:])
    attr_out_ref[:] = jnp.where(better[:, None], attr_best, attr_out_ref[:])


@functools.partial(
    jax.jit, static_argnames=("t_min", "t_max", "interpret")
)
def closest_hit_pallas(woop3, attrs, o, d, t_min=1e-4, t_max=INF, interpret=False):
    """Fused closest-hit + attribute fetch.

    woop3: [4, 3, T] Woop transforms; attrs: [T, A] per-triangle attribute
    table; o, d: [N, 3] rays. Returns (t [N], tri [N] i32, u, v, attrs [N, A]).
    """
    n = o.shape[0]
    tp = woop3.shape[2]
    a = attrs.shape[1]
    rt, tc = _pick_tiles(n, tp)
    o4 = jnp.concatenate([o, jnp.ones((n, 1), o.dtype)], axis=1)
    d4 = jnp.concatenate([d, jnp.zeros((n, 1), d.dtype)], axis=1)
    grid = (n // rt, tp // tc)
    kernel = functools.partial(_closest_kernel, tc=tc, t_min=t_min, t_max=t_max)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rt, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 3, tc), lambda i, j: (0, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, a), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rt,), lambda i, j: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt,), lambda i, j: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt,), lambda i, j: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt,), lambda i, j: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, a), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n,), jnp.float32),
            jax.ShapeDtypeStruct((n,), jnp.int32),
            jax.ShapeDtypeStruct((n,), jnp.float32),
            jax.ShapeDtypeStruct((n,), jnp.float32),
            jax.ShapeDtypeStruct((n, a), jnp.float32),
        ),
        interpret=interpret,
    )(o4, d4, woop3, attrs)
    return out


def _occlusion_kernel(o4_ref, d4_ref, w_ref, occ_ref, *, tc, t_min, t_max):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        occ_ref[:] = jnp.zeros_like(occ_ref)

    t, _, _ = _tri_hits_tile(o4_ref[:], d4_ref[:], w_ref[:], t_min, t_max, tc)
    any_hit = jnp.min(t, axis=1) < INF
    occ_ref[:] = occ_ref[:] | any_hit.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("t_min", "t_max", "interpret"))
def occlusion_pallas(woop3, o, d, t_min=1e-4, t_max=INF, interpret=False):
    """Any-hit occlusion query. Returns bool [N]."""
    n = o.shape[0]
    tp = woop3.shape[2]
    rt, tc = _pick_tiles(n, tp)
    o4 = jnp.concatenate([o, jnp.ones((n, 1), o.dtype)], axis=1)
    d4 = jnp.concatenate([d, jnp.zeros((n, 1), d.dtype)], axis=1)
    grid = (n // rt, tp // tc)
    kernel = functools.partial(_occlusion_kernel, tc=tc, t_min=t_min, t_max=t_max)
    occ = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rt, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 3, tc), lambda i, j: (0, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rt,), lambda i, j: (i,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n,), jnp.int32),
        interpret=interpret,
    )(o4, d4, woop3)
    return occ.astype(bool)
