"""Frame validation: the debug-layer / Check-macro analog.

The reference's safety net is the D3D12 debug layer plus Check/Assert
macros that message-box and abort (Utility/Error.h:1-92, SURVEY.md
section 5 "race detection / failure detection"). The TPU equivalent
validates device arrays: one fused on-device reduction per plane counts
non-finite and out-of-domain values, and the host raises/logs with the
plane name. Costs one elementwise pass per validated plane -- enable per
frame loop (app.py --validate) or around suspect passes while debugging,
keep off in production.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import log


class ValidationError(RuntimeError):
    pass


def _counts(x):
    """One device reduction -> (n_nan, n_inf, n_neg). Stays on device
    until the host pulls the 3-vector (a single tiny transfer)."""
    x = jnp.asarray(x)
    if not jnp.issubdtype(x.dtype, jnp.floating):
        z = jnp.zeros((), jnp.int32)
        return jnp.stack([z, z, z])
    return jnp.stack([
        jnp.isnan(x).sum().astype(jnp.int32),
        jnp.isinf(x).sum().astype(jnp.int32),
        (x < 0.0).sum().astype(jnp.int32),
    ])


def check_finite(name: str, x, allow_negative: bool = True,
                 raise_on_error: bool = True):
    """Validate one array. Returns True when clean; logs (and raises by
    default) naming the plane otherwise -- the Check(expr, msg) analog."""
    c = np.asarray(_counts(x))
    bad = int(c[0]) + int(c[1]) + (0 if allow_negative else int(c[2]))
    if bad == 0:
        return True
    msg = (
        f"validate: '{name}' has {int(c[0])} NaN, {int(c[1])} Inf"
        + ("" if allow_negative else f", {int(c[2])} negative")
        + f" of {np.asarray(x).size} values"
    )
    log.error(msg)
    if raise_on_error:
        raise ValidationError(msg)
    return False


def check_frame(out, state=None, raise_on_error: bool = True) -> bool:
    """Validate a render_frame(_restir) result dict (and optionally the
    temporal FrameState): HDR must be finite and non-negative, LDR is u8
    (skipped), reservoir W/M rows and the TAA history must be finite.
    """
    ok = check_finite("hdr", out["hdr"], allow_negative=False,
                      raise_on_error=raise_on_error)
    if state is not None:
        for fname in ("reservoirs", "gi_reservoirs", "history"):
            leaf = getattr(state, fname, None)
            if leaf is not None:
                ok = check_finite(
                    f"state.{fname}", leaf, raise_on_error=raise_on_error
                ) and ok
        if getattr(state, "sky_reservoirs", None) is not None:
            ok = check_finite(
                "state.sky_reservoirs", state.sky_reservoirs,
                raise_on_error=raise_on_error,
            ) and ok
    return ok
