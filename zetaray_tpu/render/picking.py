"""Pixel picking (the reference's GPU pick buffer, GBufferRT.h:36-46 +
SceneCore pick forwarding SceneCore.h:262-278).

The reference writes a pick UAV during GBufferRT and reads it back; here a
pick is one closest-hit query for the requested pixel's camera ray --
cheap enough to run on demand.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..accel.intersect import intersect_closest


@dataclass(frozen=True)
class PickResult:
    hit: bool
    tri: int  # flattened triangle index (-1 = miss)
    instance: int  # glTF node index (-1 = miss)
    instance_name: str
    material: int
    t: float
    position: tuple


def pick(scene, cpu_scene, camera, px: int, py: int, width: int, height: int) -> PickResult:
    """Pick the surface under pixel (px, py)."""
    o, d = camera.generate_rays(width, height)
    idx = py * width + px
    o1 = o[idx : idx + 1]
    d1 = d[idx : idx + 1]
    hit = intersect_closest(scene, o1, d1)
    tri = int(hit.tri[0])
    if tri < 0:
        return PickResult(False, -1, -1, "", -1, float("inf"), ())
    inst = int(cpu_scene.inst_id[tri])
    name = (
        cpu_scene.inst_names[inst]
        if 0 <= inst < len(cpu_scene.inst_names)
        else ""
    )
    t = float(hit.t[0])
    p = o1[0] + t * d1[0]
    return PickResult(
        hit=True,
        tri=tri,
        instance=inst,
        instance_name=name,
        material=int(cpu_scene.mat_id[tri]),
        t=t,
        position=tuple(float(v) for v in jnp.asarray(p)),
    )
