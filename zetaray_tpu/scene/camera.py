"""Camera: pinhole + thin lens, Halton TAA jitter.

Counterpart of the reference's Camera (Scene/Camera.h:29-112): pinhole or
thin-lens (focal length / f-stop / focus depth -> depth of field), per-frame
Halton sub-pixel jitter for TAA, reversed-Z infinite-far projection (the
projection matrix itself is only needed for rasterless motion vectors; primary
rays are generated directly from the camera basis).

Device-side ray generation is pure jnp and jit-friendly: the camera is a small
pytree of scalars/vectors that can be donated per frame.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import numpy as np
import jax.numpy as jnp

from ..core import transforms as T
from ..core.sampling import halton_jitter, square_to_disk_concentric


@dataclass(frozen=True)
class Camera:
    """Static per-frame camera state (host-built, passed into jit)."""

    eye: np.ndarray  # [3]
    right: np.ndarray  # [3] unit
    up: np.ndarray  # [3] unit
    forward: np.ndarray  # [3] unit
    tan_half_fov: float  # vertical
    aspect: float  # width / height
    lens_radius: float = 0.0  # 0 => pinhole
    focus_dist: float = 1.0
    jitter: tuple[float, float] = (0.0, 0.0)  # sub-pixel, in pixels

    @staticmethod
    def look_at(
        eye,
        target,
        up=(0.0, 1.0, 0.0),
        vfov_deg: float = 60.0,
        aspect: float = 16.0 / 9.0,
        f_stop: float = 0.0,
        focal_length_mm: float = 50.0,
        focus_dist: float | None = None,
    ) -> "Camera":
        m = T.look_at(eye, target, up)
        # Thin lens: aperture radius = focal_length / (2 * f_stop); reference
        # exposes f-stop + focal length + focus depth (Camera.h:52-56).
        lens_radius = 0.0
        if f_stop > 0.0:
            lens_radius = (focal_length_mm / 1000.0) / (2.0 * f_stop)
        fd = focus_dist
        if fd is None:
            fd = float(np.linalg.norm(np.asarray(target, float) - np.asarray(eye, float)))
        return Camera(
            eye=m[:3, 3].astype(np.float32),
            right=m[:3, 0].astype(np.float32),
            up=m[:3, 1].astype(np.float32),
            forward=(-m[:3, 2]).astype(np.float32),
            tan_half_fov=float(np.tan(np.radians(vfov_deg) * 0.5)),
            aspect=aspect,
            lens_radius=lens_radius,
            focus_dist=fd,
        )

    def with_jitter(self, frame: int) -> "Camera":
        return replace(self, jitter=halton_jitter(frame))

    def with_aspect(self, width: int, height: int) -> "Camera":
        return replace(self, aspect=width / height)

    # -- device-side ray generation --------------------------------------

    def generate_rays(
        self,
        width: int,
        height: int,
        lens_u: jnp.ndarray | None = None,
        rows: tuple | None = None,
    ):
        """Primary rays through pixel centers (+ jitter).

        Returns (origins [N, 3], directions [N, 3] unit). ``lens_u``
        ([N, 2] uniforms) enables thin-lens DoF when lens_radius > 0.
        ``rows=(y0, n_rows)`` restricts generation to an image-row band
        (y0 may be traced -- the per-shard path under pixel-tile sharding);
        N = n_rows * width then, else height * width.
        """
        jx, jy = self.jitter
        px = (jnp.arange(width, dtype=jnp.float32) + 0.5 + jx) / width
        if rows is None:
            y_idx = jnp.arange(height, dtype=jnp.float32)
            n_rows = height
        else:
            y0, n_rows = rows
            y_idx = jnp.arange(n_rows, dtype=jnp.float32) + y0
        py = (y_idx + 0.5 + jy) / height
        # NDC: x in [-aspect*thf, aspect*thf], y in [thf, -thf] (y down in image)
        sx = (2.0 * px - 1.0) * (self.aspect * self.tan_half_fov)
        sy = (1.0 - 2.0 * py) * self.tan_half_fov
        sx = jnp.broadcast_to(sx[None, :], (n_rows, width)).reshape(-1)
        sy = jnp.broadcast_to(sy[:, None], (n_rows, width)).reshape(-1)

        right = jnp.asarray(self.right)
        up = jnp.asarray(self.up)
        fwd = jnp.asarray(self.forward)
        eye = jnp.asarray(self.eye)

        d = sx[:, None] * right + sy[:, None] * up + fwd
        if self.lens_radius > 0.0 and lens_u is not None:
            # Focus plane at focus_dist along forward; offset origin on lens.
            ft = self.focus_dist  # distance along forward
            p_focus = eye + d * ft  # point on focus plane for this pixel
            disk = square_to_disk_concentric(lens_u) * self.lens_radius
            o = eye + disk[:, 0:1] * right + disk[:, 1:2] * up
            d = p_focus - o
        else:
            o = jnp.broadcast_to(eye, d.shape)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        return o, d

    def pixel_spread_angle(self, height: int) -> float:
        """Approx. angle subtended by one pixel (for ray cones, RT.hlsli:13)."""
        return 2.0 * self.tan_half_fov / height

    def project(self, p: jnp.ndarray, width: int, height: int):
        """World points [N, 3] -> (px, py, depth) pixel coords (float).

        Inverse of generate_rays (ignoring jitter); used for temporal
        reprojection (TAA / ReSTIR temporal reuse motion vectors, matching
        the reference's prev-frame matrices in cbFrameConstants).
        """
        eye = jnp.asarray(self.eye)
        rel = p - eye
        u = rel @ jnp.asarray(self.right)
        v = rel @ jnp.asarray(self.up)
        w = rel @ jnp.asarray(self.forward)
        w_safe = jnp.maximum(w, 1e-6)
        sx = u / (w_safe * self.aspect * self.tan_half_fov)
        sy = v / (w_safe * self.tan_half_fov)
        px = (sx + 1.0) * 0.5 * width - 0.5
        py = (1.0 - sy) * 0.5 * height - 0.5
        return px, py, w


# Register Camera as a pytree so it can be a jit *argument* (never a baked
# constant -- see render.frame notes). ``lens_radius`` stays static because
# generate_rays branches on it in Python; everything else is traced so
# per-frame jitter/motion does not retrigger compilation.
def _cam_flatten(c: Camera):
    dynamic = (c.eye, c.right, c.up, c.forward, c.tan_half_fov, c.aspect,
               c.focus_dist, c.jitter)
    return dynamic, (c.lens_radius,)


def _cam_unflatten(static, dynamic):
    eye, right, up, forward, thf, aspect, fd, jitter = dynamic
    return Camera(
        eye=eye, right=right, up=up, forward=forward, tan_half_fov=thf,
        aspect=aspect, lens_radius=static[0], focus_dist=fd,
        jitter=jitter,
    )


import jax.tree_util as _jtu  # noqa: E402

_jtu.register_pytree_node(Camera, _cam_flatten, _cam_unflatten)
