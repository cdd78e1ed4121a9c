"""Multi-chip frame rendering: pixel tiles over a device mesh.

The reference is single-GPU; its only concurrency is dual-queue async compute
+ CPU/GPU pipelining (SURVEY.md section 2.6). The TPU-native scale axis is the
pixel grid: image rows are sharded over a 1D mesh ("tiles"), the scene is
replicated, and the trace stage runs under ``shard_map`` -- each device path
traces its own ray shard (the Pallas megakernel runs per device), with NO
collectives in the trace itself (wavefront rays never communicate). The only
frame-wide coupling is auto-exposure, which runs outside the shard_map on
the gathered image (XLA inserts the all-gather).

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
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..render.frame import RenderConfig, _postprocess
from ..ops.pathtracer import trace

TILE_AXIS = "tiles"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (TILE_AXIS,))


@lru_cache(maxsize=32)
def _sharded_frame_fn(mesh: Mesh, cfg: RenderConfig):
    def traced_shard(scene, o, d, key):
        # decorrelate RNG streams across shards (pixel ids restart per shard)
        key = jax.random.fold_in(key, jax.lax.axis_index(TILE_AXIS))
        return trace(scene, o, d, key, cfg.pt)

    sharded_trace = jax.shard_map(
        traced_shard,
        mesh=mesh,
        in_specs=(P(), P(TILE_AXIS, None), P(TILE_AXIS, None), P()),
        out_specs=P(TILE_AXIS, None),
        check_vma=False,
    )

    @jax.jit
    def f(scene, camera, key):
        o, d = camera.generate_rays(cfg.width, cfg.height)
        hdr = sharded_trace(scene, o, d, key).reshape(cfg.height, cfg.width, 3)
        return {"hdr": hdr, "ldr": _postprocess(hdr, cfg)}

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
