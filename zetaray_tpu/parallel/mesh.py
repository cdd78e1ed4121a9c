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

from ..render.frame import RenderConfig, _pick_rt, _postprocess
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
        # global pixel ids keep per-pixel RNG streams identical to the
        # unsharded frame (and decorrelated across shards)
        n_loc = o.shape[0]
        pix0 = jax.lax.axis_index(TILE_AXIS) * n_loc
        return trace(
            scene, o, d, key, cfg.pt, pix0=pix0, rt=_pick_rt(n_loc),
            rows_out=True,
        )

    sharded_trace = jax.shard_map(
        traced_shard,
        mesh=mesh,
        in_specs=(P(), P(TILE_AXIS, None), P(TILE_AXIS, None), P()),
        out_specs=P(None, TILE_AXIS),
        check_vma=False,
    )

    @jax.jit
    def f(scene, camera, key):
        o, d = camera.generate_rays(cfg.width, cfg.height)
        hdr = sharded_trace(scene, o, d, key).reshape(3, cfg.height, cfg.width)
        ldr = _postprocess(hdr, cfg)
        return {"hdr": hdr.transpose(1, 2, 0), "ldr": ldr.transpose(1, 2, 0)}

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


# ---------------------------------------------------------------------------
# The flagship stateful frame, sharded: ReSTIR DI/GI + denoise + TAA with
# ppermute halo exchange for every stencil (SURVEY.md section 2.6.6)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=32)
def _sharded_restir_fn(mesh: Mesh, cfg: RenderConfig, halo: int, has_state: bool):
    from ..parallel.halo import ShardCtx
    from ..render.frame import FrameState, render_frame_restir

    n = mesh.size
    # ShardCtx describes the RENDER-res rows (render_scale < 1 renders a
    # smaller internal image; only the color history is display res)
    h_render = cfg.height
    if cfg.render_scale != 1.0:
        h_render = max(8, int(round(cfg.height * cfg.render_scale)))
    assert h_render % n == 0, "render rows not divisible by mesh"
    h_loc = h_render // n
    ctx = ShardCtx(axis=TILE_AXIS, n_shards=n, h_local=h_loc, halo=halo)

    res_spec = P(None, TILE_AXIS)  # [rows, pixels]: shard the pixel axis
    use_skydi = (
        cfg.skydi and cfg.pt.sky is not None
        and cfg.mode in ("restir_gi", "restir_pt")
    )
    use_lock = cfg.render_scale != 1.0 and cfg.upscale_cfg.locks
    st_spec = FrameState(
        reservoirs=res_spec,
        gi_reservoirs=res_spec,
        gbuf=res_spec,
        camera_prev=P(),  # replicated (prefix over the Camera pytree)
        history=P(None, TILE_AXIS, None),  # planar [3, H, W]
        sky_reservoirs=res_spec if use_skydi else None,
        upscale_lock=P(TILE_AXIS, None) if use_lock else None,
    )
    img_spec = P(TILE_AXIS, None, None)
    out_specs = ({"hdr": img_spec, "ldr": img_spec}, st_spec)

    if has_state:
        def body(scene, camera, key, state):
            return render_frame_restir(scene, camera, key, cfg, state, shard=ctx)

        in_specs = (P(), P(), P(), st_spec)
        # donate the sharded FrameState (see render_frame_restir_jit)
        return jax.jit(jax.shard_map(
            body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        ), donate_argnums=(3,))

    def body(scene, camera, key):
        return render_frame_restir(scene, camera, key, cfg, None, shard=ctx)

    in_specs = (P(), P(), P())
    return jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    ))


def render_frame_restir_sharded(
    mesh: Mesh, scene, camera, key, cfg: RenderConfig, state=None, halo: int = 16
):
    """One stateful ReSTIR frame sharded over image rows.

    Returns (outputs, FrameState) exactly like render.frame.render_frame_restir;
    the FrameState arrays come back sharded and feed the next call directly.
    Requires cfg.height % mesh.size == 0. ``halo`` bounds how far temporal
    reprojection and TAA may reach across shard boundaries (reuse outside the
    halo is rejected, never wrong).
    """
    n = mesh.size
    assert cfg.height % n == 0, "image rows not divisible by mesh"
    scene = jax.device_put(scene, NamedSharding(mesh, P()))
    fn = _sharded_restir_fn(mesh, cfg, halo, state is not None)
    if state is None:
        return fn(scene, camera, key)
    return fn(scene, camera, key, state)
