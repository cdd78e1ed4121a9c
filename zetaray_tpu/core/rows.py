"""Row-matrix (SoA) construction helpers.

Reservoir/G-buffer state lives in (ROWS, N) f32 matrices. Building one
by chaining ``res.at[i].set(v)`` lowers each update to its own
dynamic-update-slice fusion, and XLA *duplicates the producer graphs*
of the row values into every one of those fusions -- when the rows are
fed by expensive producers (262k-index gathers, BSDF evals), a 30-row
chained build measured ~41 ms at 512^2 on v5e where a single
``jnp.stack`` of the same values is <3 ms (each producer computed once
for the one concatenate consumer). Always build hot row matrices with
:func:`stack_rows`.

(Reference analog: the HLSL passes write packed reservoir texture rows
once per lane; this is the SoA equivalent of that single-store.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def stack_rows(num_rows: int, vals: dict, n=None, like=None):
    """Build a (num_rows, n) f32 row matrix in ONE stacked write.

    vals maps row index -> 1-D array (length n). Rows not in vals are
    zero, or taken from ``like`` (an existing (num_rows, n) matrix)
    when given -- the splice still costs one concatenate, not one
    dynamic-update-slice per row.

    The values are passed through an optimization_barrier first: without
    it XLA fuses each value's producer chain into the concatenate, where
    it computes in [1, n] layout -- one of eight sublanes live, so the
    whole producer graph (BSDF evals, unpack bit-ops, ...) runs at ~8x
    its natural VPU cost (measured: a one-bsdf-eval row chain at 512^2
    was 18 ms fused into the stack, <1 ms barriered). The barrier keeps
    producers in their efficient (n,) layout; the stack is then a pure
    relayout copy.
    """
    keys = list(vals.keys())
    barriered = jax.lax.optimization_barrier(tuple(vals[k] for k in keys))
    vals = dict(zip(keys, barriered))
    if like is not None:
        rows = [vals.get(i, like[i]) for i in range(num_rows)]
        return jnp.stack(rows, 0)
    if n is None:
        n = next(iter(vals.values())).shape[0]
    zero = jnp.zeros((n,), jnp.float32)
    rows = [vals.get(i, zero) for i in range(num_rows)]
    return jnp.stack(rows, 0)


def set3(vals: dict, row: int, v) -> None:
    """vals[row..row+2] = the V3's components."""
    vals[row] = v.x
    vals[row + 1] = v.y
    vals[row + 2] = v.z
