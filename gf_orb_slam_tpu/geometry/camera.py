"""Pinhole camera with radial-tangential (radtan/plumb-bob) distortion.

Replaces the reference's scattered OpenCV usage: cv::undistortPoints in
Frame::UndistortKeyPoints (src/Frame.cc:77) and the manual projection formulas
in Observability/ORBmatcher. Static camera parameters live in a small
NamedTuple of scalars so they fold into jit as compile-time-ish constants.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class CameraModel(NamedTuple):
    """Intrinsics + distortion, matching the reference's settings-yaml fields
    Camera.{fx,fy,cx,cy,k1,k2,p1,p2,k3} (src/Tracking.cc:104-150)."""

    fx: float
    fy: float
    cx: float
    cy: float
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    k3: float = 0.0
    width: int = 752
    height: int = 480
    fps: float = 20.0

    @property
    def K(self) -> jnp.ndarray:
        return jnp.asarray(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=jnp.float32,
        )

    @property
    def has_distortion(self) -> bool:
        return any(abs(v) > 0 for v in (self.k1, self.k2, self.p1, self.p2, self.k3))


# EuRoC cam0 intrinsics — the reference test fixtures' camera
# (test/test_Greedy.cpp:84-96) and our synthetic-scene tests use these.
EUROC_CAM = CameraModel(
    fx=458.654, fy=457.296, cx=367.215, cy=248.375,
    k1=-0.28340811, k2=0.07395907, p1=0.00019359, p2=1.76187114e-05,
    width=752, height=480, fps=20.0,
)

# TUM fr1 intrinsics (batch_script/Run_TUM_RGBD.py settings).
TUM_FR1_CAM = CameraModel(
    fx=517.306408, fy=516.469215, cx=318.643040, cy=255.313989,
    k1=0.262383, k2=-0.953104, p1=-0.005358, p2=0.002628, k3=1.163314,
    width=640, height=480, fps=30.0,
)

# NUIM ICL living-room intrinsics (no distortion).
NUIM_CAM = CameraModel(
    fx=481.20, fy=-480.0, cx=319.5, cy=239.5, width=640, height=480, fps=30.0,
)


def distort_normalized(cam: CameraModel, xn: jnp.ndarray) -> jnp.ndarray:
    """Apply radtan distortion to normalized coords (..., 2)."""
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (cam.k1 + r2 * (cam.k2 + r2 * cam.k3))
    xd = x * radial + 2.0 * cam.p1 * x * y + cam.p2 * (r2 + 2.0 * x * x)
    yd = y * radial + cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_normalized(cam: CameraModel, xd: jnp.ndarray, iters: int = 8) -> jnp.ndarray:
    """Invert radtan by fixed-point iteration (same scheme as cv::undistortPoints,
    but with a static iteration count for XLA)."""
    x = xd
    for _ in range(iters):
        xx, yy = x[..., 0], x[..., 1]
        r2 = xx * xx + yy * yy
        radial = 1.0 + r2 * (cam.k1 + r2 * (cam.k2 + r2 * cam.k3))
        dx = 2.0 * cam.p1 * xx * yy + cam.p2 * (r2 + 2.0 * xx * xx)
        dy = cam.p1 * (r2 + 2.0 * yy * yy) + 2.0 * cam.p2 * xx * yy
        x = jnp.stack(
            [(xd[..., 0] - dx) / radial, (xd[..., 1] - dy) / radial], axis=-1
        )
    return x


def pixel_to_normalized(cam: CameraModel, uv: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack(
        [(uv[..., 0] - cam.cx) / cam.fx, (uv[..., 1] - cam.cy) / cam.fy], axis=-1
    )


def normalized_to_pixel(cam: CameraModel, xn: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack(
        [xn[..., 0] * cam.fx + cam.cx, xn[..., 1] * cam.fy + cam.cy], axis=-1
    )


def undistort_pixels(cam: CameraModel, uv: jnp.ndarray) -> jnp.ndarray:
    """Distorted pixel coords → undistorted pixel coords (Frame::UndistortKeyPoints)."""
    if not cam.has_distortion:
        return uv
    return normalized_to_pixel(cam, undistort_normalized(cam, pixel_to_normalized(cam, uv)))


def project(cam: CameraModel, xc: jnp.ndarray, eps: float = 1e-6):
    """Camera-frame 3D points (..., 3) → undistorted pixel coords + validity.

    Returns (uv (...,2), depth (...,), valid (...,) bool). Points behind the
    camera get valid=False; uv is still finite (clamped z) so downstream
    masking stays NaN-free under jit.
    """
    z = xc[..., 2]
    z_safe = jnp.where(jnp.abs(z) < eps, eps, z)
    xn = xc[..., :2] / z_safe[..., None]
    uv = normalized_to_pixel(cam, xn)
    return uv, z, z > eps


def in_image(cam: CameraModel, uv: jnp.ndarray, margin: float = 0.0) -> jnp.ndarray:
    return (
        (uv[..., 0] >= -margin)
        & (uv[..., 0] < cam.width + margin)
        & (uv[..., 1] >= -margin)
        & (uv[..., 1] < cam.height + margin)
    )


def backproject(cam: CameraModel, uv: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Undistorted pixels + depth → camera-frame 3D points."""
    xn = pixel_to_normalized(cam, uv)
    return jnp.concatenate([xn * depth[..., None], depth[..., None]], axis=-1)


def projection_jacobian(cam: CameraModel, xc: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """d(uv)/d(xc): the classic 2×3 pinhole Jacobian (..., 2, 3).

    Matches the reference's dhu_dhrl (include/Observability.h:498-506).
    """
    x, y, z = xc[..., 0], xc[..., 1], xc[..., 2]
    z_safe = jnp.where(jnp.abs(z) < eps, eps, z)
    iz = 1.0 / z_safe
    iz2 = iz * iz
    zero = jnp.zeros_like(x)
    row0 = jnp.stack([cam.fx * iz, zero, -x * cam.fx * iz2], axis=-1)
    row1 = jnp.stack([zero, cam.fy * iz, -y * cam.fy * iz2], axis=-1)
    return jnp.stack([row0, row1], axis=-2)
