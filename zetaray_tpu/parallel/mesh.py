"""Multi-chip frame rendering: pixel tiles over a device mesh.

The reference is single-GPU; its only concurrency is dual-queue async compute
+ CPU/GPU pipelining (SURVEY.md section 2.6). The TPU-native scale axis is the
pixel grid: image rows are sharded over a 1D mesh ("tiles"), the scene is
replicated, and XLA SPMD partitions every per-ray op automatically -- rays
never communicate in the wavefront path tracer, so the only collectives are
for the frame-wide exposure histogram (an all-reduce XLA inserts on its own).

Stencil passes that read neighbors (spatial ReSTIR reuse, a-trous, TAA) keep
the same sharding and exchange halos via ppermute when they land; the
sharding below is already the layout they need.

Usage:
    mesh = make_mesh()                       # all devices
    out = render_frame_sharded(mesh, scene, cam, key, cfg)
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..render.frame import RenderConfig, render_frame

TILE_AXIS = "tiles"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (TILE_AXIS,))


@lru_cache(maxsize=32)
def _sharded_frame_fn(mesh: Mesh, cfg: RenderConfig):
    rays_sharding = NamedSharding(mesh, P(TILE_AXIS, None))

    def shard_rays(x):
        return jax.lax.with_sharding_constraint(x, rays_sharding)

    @partial(jax.jit, donate_argnums=())
    def f(scene, camera, key):
        return render_frame(scene, camera, key, cfg, shard_rays=shard_rays)

    return f


def render_frame_sharded(mesh: Mesh, scene, camera, key, cfg: RenderConfig):
    """Render one frame with rays sharded over the mesh's tile axis.

    Requires (width * height) % n_devices == 0 (pad the image otherwise).
    """
    n = mesh.size
    assert (cfg.width * cfg.height) % n == 0, "pixel count not divisible by mesh"
    repl = NamedSharding(mesh, P())
    scene = jax.device_put(scene, repl)
    return _sharded_frame_fn(mesh, cfg)(scene, camera, key)
