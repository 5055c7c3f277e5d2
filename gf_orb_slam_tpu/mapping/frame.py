"""Per-image Frame container (reference include/Frame.h:43-155) as SoA arrays.

The reference Frame runs extraction in its constructor, undistorts keypoints,
and keeps parallel arrays (mvpMapPoints/mvbOutlier/...) — here FrameData is an
immutable batch of those arrays; association state (point ids, inlier flags)
lives alongside as plain arrays produced by the tracking programs.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gf_orb_slam_tpu.geometry.camera import CameraModel, undistort_pixels
from gf_orb_slam_tpu.ops import orb


class FrameData(NamedTuple):
    uv: jnp.ndarray        # (N, 2) undistorted pixel coords
    uv_raw: jnp.ndarray    # (N, 2) raw (distorted) pixel coords
    octave: jnp.ndarray    # (N,) int32
    angle: jnp.ndarray     # (N,) float32
    desc: jnp.ndarray      # (N, 8) uint32
    response: jnp.ndarray  # (N,) float32
    valid: jnp.ndarray     # (N,) bool

    @property
    def capacity(self) -> int:
        return self.uv.shape[0]


@partial(jax.jit, static_argnames=("cam", "cfg"))
def make_frame(img: jnp.ndarray, cam: CameraModel, cfg: orb.OrbConfig) -> FrameData:
    """Extract ORB features and undistort keypoints (ref Frame ctor,
    src/Frame.cc:55-130)."""
    kps = orb.extract_orb(img, cfg)
    uv_und = undistort_pixels(cam, kps.uv)
    return FrameData(
        uv=uv_und,
        uv_raw=kps.uv,
        octave=kps.octave,
        angle=kps.angle,
        desc=kps.desc,
        response=kps.response,
        valid=kps.valid,
    )
