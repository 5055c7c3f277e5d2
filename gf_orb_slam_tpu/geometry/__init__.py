"""Geometry & kinematics core (reference layer L1: include/Util.hpp, Converter).

Pure jnp, fully batchable via vmap; all functions take and return arrays so the
whole layer composes under jit/scan/shard_map.
"""

from gf_orb_slam_tpu.geometry import camera, linalg, pwls, quat, se3, sim3

__all__ = ["quat", "se3", "sim3", "camera", "pwls", "linalg"]
