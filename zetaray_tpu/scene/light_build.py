"""Host-side emissive power estimation.

Counterpart of the reference's ``EstimateTriEmissivePower`` GPU kernel +
readback (PreLighting.cpp:354-359): per-emissive-triangle power used as the
alias-table weight for many-light sampling. For untextured emissives (the
common case and all we support until texture sampling lands) the power is
exact: ``power_i = luminance(Le_i) * area_i * pi`` for one-sided emitters.
Textured emissives will integrate over the emissive texture here (host, at
load time) instead of a GPU pass + readback round trip.
"""

from __future__ import annotations

import numpy as np

_LUM = np.array([0.2126, 0.7152, 0.0722], np.float64)


def emissive_powers(cpu_scene) -> np.ndarray:
    """[E] float64 power weights for cpu_scene.emissive_tris."""
    em = cpu_scene.emissive_tris
    areas = cpu_scene.areas()[em]
    le = cpu_scene.materials.emissive[cpu_scene.mat_id[em]].astype(np.float64)
    lum = le @ _LUM
    return np.maximum(lum * areas * np.pi, 0.0)
