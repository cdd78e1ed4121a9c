"""Frame-state checkpoint / resume.

The reference's only persistence is the PSO disk cache + screenshots
(SURVEY.md section 5); for deterministic replays and long progressive
renders we additionally snapshot the temporal FrameState (reservoirs,
G-buffer, TAA history, previous camera) and the tweakable-param values to
one .npz. The JAX persistent compilation cache plays the PSO-cache role.
"""

from __future__ import annotations

import json

import numpy as np


def save_frame_state(path: str, state, params_snapshot: dict | None = None) -> None:
    """Serialize a render.FrameState (+ optional params) to ``path``.npz."""
    cam = state.camera_prev
    payload = {
        "reservoirs": np.asarray(state.reservoirs),
        "gi_reservoirs": np.asarray(state.gi_reservoirs),
        "gbuf": np.asarray(state.gbuf),
        "history": np.asarray(state.history),
        "cam_eye": np.asarray(cam.eye),
        "cam_right": np.asarray(cam.right),
        "cam_up": np.asarray(cam.up),
        "cam_forward": np.asarray(cam.forward),
        "cam_scalars": np.asarray(
            [
                float(np.asarray(cam.tan_half_fov)),
                float(np.asarray(cam.aspect)),
                float(cam.lens_radius),
                float(np.asarray(cam.focus_dist)),
                float(np.asarray(cam.jitter[0])),
                float(np.asarray(cam.jitter[1])),
            ],
            np.float64,
        ),
    }
    if getattr(state, "sky_reservoirs", None) is not None:
        payload["sky_reservoirs"] = np.asarray(state.sky_reservoirs)
    if getattr(state, "upscale_lock", None) is not None:
        payload["upscale_lock"] = np.asarray(state.upscale_lock)
    if params_snapshot is not None:
        payload["params_json"] = np.frombuffer(
            json.dumps(params_snapshot).encode(), np.uint8
        )
    np.savez_compressed(path, **payload)


def load_frame_state(path: str):
    """Returns (FrameState, params_snapshot | None)."""
    import jax.numpy as jnp

    from ..render.frame import FrameState
    from ..scene.camera import Camera

    z = np.load(path, allow_pickle=False)
    s = z["cam_scalars"]
    cam = Camera(
        eye=z["cam_eye"].astype(np.float32),
        right=z["cam_right"].astype(np.float32),
        up=z["cam_up"].astype(np.float32),
        forward=z["cam_forward"].astype(np.float32),
        tan_half_fov=float(s[0]),
        aspect=float(s[1]),
        lens_radius=float(s[2]),
        focus_dist=float(s[3]),
        jitter=(float(s[4]), float(s[5])),
    )
    state = FrameState(
        reservoirs=jnp.asarray(z["reservoirs"]),
        gi_reservoirs=jnp.asarray(z["gi_reservoirs"]),
        gbuf=jnp.asarray(z["gbuf"]),
        camera_prev=cam,
        history=jnp.asarray(z["history"]),
        sky_reservoirs=(
            jnp.asarray(z["sky_reservoirs"]) if "sky_reservoirs" in z else None
        ),
        upscale_lock=(
            jnp.asarray(z["upscale_lock"]) if "upscale_lock" in z else None
        ),
    )
    params = None
    if "params_json" in z:
        params = json.loads(bytes(z["params_json"]).decode())
    return state, params
