"""Distributed global BA tests on the 8-device virtual CPU mesh: correctness
vs the single-device Schur solver, and sharding execution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gf_orb_slam_tpu.geometry import camera, se3
from gf_orb_slam_tpu.parallel import global_ba
from gf_orb_slam_tpu.solvers import local_ba
from tests.test_local_ba import make_ba_problem


class TestDistributedBA:
    def test_matches_single_device_quality(self, rng):
        cam = camera.EUROC_CAM
        prob, poses_gt, pts_gt, _ = make_ba_problem(rng, cam, n_cams=8, n_pts=200)
        mesh = global_ba.make_mesh(8)
        res = global_ba.distributed_bundle_adjust(cam, prob, mesh, n_lm_iters=12)
        dt = np.asarray(se3.pose_t(res.poses) - se3.pose_t(poses_gt))
        assert np.linalg.norm(dt, axis=1).max() < 0.01, dt
        dp = np.linalg.norm(np.asarray(res.points - pts_gt), axis=1)
        assert np.median(dp) < 0.08

    def test_single_device_mesh(self, rng):
        cam = camera.EUROC_CAM
        prob, poses_gt, _, _ = make_ba_problem(rng, cam, n_cams=8, n_pts=200)
        mesh = global_ba.make_mesh(1)
        res = global_ba.distributed_bundle_adjust(cam, prob, mesh, n_lm_iters=12)
        dt = np.asarray(se3.pose_t(res.poses) - se3.pose_t(poses_gt))
        assert np.linalg.norm(dt, axis=1).max() < 0.01

    def test_agrees_with_schur_solver(self, rng):
        """Distributed PCG result ≈ dense Schur result on the same problem."""
        cam = camera.EUROC_CAM
        prob, poses_gt, _, _ = make_ba_problem(rng, cam, n_cams=8, n_pts=160)
        mesh = global_ba.make_mesh(4)
        res_d = global_ba.distributed_bundle_adjust(cam, prob, mesh, n_lm_iters=12)
        res_s = local_ba.bundle_adjust(cam, prob, iters_stage1=6, iters_stage2=6)
        td = np.asarray(se3.pose_t(res_d.poses))
        tss = np.asarray(se3.pose_t(res_s.poses))
        np.testing.assert_allclose(td, tss, atol=5e-3)

    def test_fixed_cameras_respected(self, rng):
        cam = camera.EUROC_CAM
        prob, _, _, _ = make_ba_problem(rng, cam, n_cams=8, n_pts=120)
        mesh = global_ba.make_mesh(8)
        res = global_ba.distributed_bundle_adjust(cam, prob, mesh, n_lm_iters=6)
        np.testing.assert_array_equal(np.asarray(res.poses[:2]), np.asarray(prob.poses[:2]))
