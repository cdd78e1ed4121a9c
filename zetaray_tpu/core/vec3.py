"""SoA 3-vector math on component tuples.

Inside Pallas TPU kernels, [N, 3] vector layouts waste 125/128 lanes; the
fast layout keeps each component a full [*, lanes] array. ``V3`` is a
NamedTuple of three same-shaped arrays and the ops below mirror the needed
subset of the reference's HLSL float3 math (Math.hlsli) -- written in plain
jnp so the same code runs inside kernels, in interpret mode, and in regular
XLA (the test oracle).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class V3(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    def __add__(self, o):
        if isinstance(o, V3):
            return V3(self.x + o.x, self.y + o.y, self.z + o.z)
        return V3(self.x + o, self.y + o, self.z + o)

    def __sub__(self, o):
        if isinstance(o, V3):
            return V3(self.x - o.x, self.y - o.y, self.z - o.z)
        return V3(self.x - o, self.y - o, self.z - o)

    def __mul__(self, o):
        if isinstance(o, V3):
            return V3(self.x * o.x, self.y * o.y, self.z * o.z)
        return V3(self.x * o, self.y * o, self.z * o)

    __rmul__ = __mul__

    def __neg__(self):
        return V3(-self.x, -self.y, -self.z)


def splat(s) -> V3:
    return V3(s, s, s)


def dot(a: V3, b: V3):
    return a.x * b.x + a.y * b.y + a.z * b.z


def cross(a: V3, b: V3) -> V3:
    return V3(
        a.y * b.z - a.z * b.y,
        a.z * b.x - a.x * b.z,
        a.x * b.y - a.y * b.x,
    )


def length(a: V3):
    return jnp.sqrt(dot(a, a))


def normalize(a: V3, eps: float = 1e-20) -> V3:
    import jax

    inv = jax.lax.rsqrt(jnp.maximum(dot(a, a), eps))
    return a * inv


def where(c, a: V3, b: V3) -> V3:
    return V3(jnp.where(c, a.x, b.x), jnp.where(c, a.y, b.y), jnp.where(c, a.z, b.z))


def lerp(a: V3, b: V3, t) -> V3:
    return a + (b - a) * t


def max_component(a: V3):
    return jnp.maximum(a.x, jnp.maximum(a.y, a.z))


def luminance(a: V3):
    return 0.2126 * a.x + 0.7152 * a.y + 0.0722 * a.z


def from_rows(m: jnp.ndarray, r0: int) -> V3:
    """Rows r0..r0+2 of a [K, N] SoA matrix as a V3."""
    return V3(m[r0], m[r0 + 1], m[r0 + 2])


def aos3(a: V3, axis: int = -1) -> jnp.ndarray:
    """V3 of (N,) lanes -> [N, 3] (or [3, N]) AoS array, layout-safely.

    The components pass an optimization_barrier before the stack: fusing
    producer math into a small-minor-dim stack makes XLA compute it in
    [N, 1] / [1, N] shapes at 1/128 (resp. 1/8) VPU lane efficiency --
    see core/rows.py. Use this for every V3 -> AoS boundary (trace-kernel
    operands, image assembly), never a bare jnp.stack.
    """
    import jax

    x, y, z = jax.lax.optimization_barrier((a.x, a.y, a.z))
    return jnp.stack([x, y, z], axis)
