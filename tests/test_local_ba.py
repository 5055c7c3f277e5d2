"""Schur-complement BA tests: convergence on synthetic multi-view problems,
gauge handling via fixed cameras, outlier pruning."""

import jax
import jax.numpy as jnp
import numpy as np

from gf_orb_slam_tpu.geometry import camera, quat, se3
from gf_orb_slam_tpu.solvers import local_ba


def make_ba_problem(rng, cam, n_cams=6, n_pts=150, n_slots=200, noise_px=0.5,
                    pose_pert=0.02, point_pert=0.05, outlier_frac=0.0):
    """Cameras on an arc looking at a point cloud; observation layout (C, N)."""
    pts_gt = rng.uniform([-4, -3, 6.0], [4, 3, 14.0], size=(n_pts, 3)).astype(np.float32)

    poses_gt = []
    for c in range(n_cams):
        t = np.asarray([0.4 * c - 0.2 * n_cams, 0.05 * c, 0.1 * rng.normal()], np.float32)
        w = rng.normal(size=3).astype(np.float32) * 0.02
        poses_gt.append(np.asarray(se3.make_pose(quat.v2q(jnp.asarray(w)), jnp.asarray(t))))
    poses_gt = jnp.asarray(np.stack(poses_gt))

    # Observations: each camera sees each point (slot n = point id), capacity n_slots.
    obs_uv = np.zeros((n_cams, n_slots, 2), np.float32)
    obs_pt = np.full((n_cams, n_slots), -1, np.int32)
    obs_w = np.zeros((n_cams, n_slots), np.float32)
    for c in range(n_cams):
        xc = np.asarray(se3.transform_point(poses_gt[c], jnp.asarray(pts_gt)))
        uv, _, ok = camera.project(cam, jnp.asarray(xc))
        ok = np.asarray(ok) & np.asarray(camera.in_image(cam, uv))
        uv = np.asarray(uv) + rng.normal(size=(n_pts, 2)).astype(np.float32) * noise_px
        obs_uv[c, :n_pts] = uv
        obs_pt[c, :n_pts] = np.where(ok, np.arange(n_pts), -1)
        obs_w[c, :n_pts] = ok.astype(np.float32)
    n_out = int(n_pts * outlier_frac)
    if n_out:
        # Corrupt some observations in the last camera.
        obs_uv[-1, :n_out] += rng.uniform(30, 90, (n_out, 2)).astype(np.float32)

    # Perturb initial estimates (keep first two cameras exact & fixed: gauge).
    poses0 = np.asarray(poses_gt).copy()
    for c in range(2, n_cams):
        xi = jnp.asarray(rng.normal(size=6).astype(np.float32) * pose_pert)
        poses0[c] = np.asarray(se3.apply_left_update(xi, jnp.asarray(poses0[c])))
    pts0 = pts_gt + rng.normal(size=pts_gt.shape).astype(np.float32) * point_pert

    prob = local_ba.BAProblem(
        poses=jnp.asarray(poses0),
        points=jnp.asarray(pts0),
        fixed=jnp.asarray([True, True] + [False] * (n_cams - 2)),
        point_valid=jnp.ones(n_pts, bool),
        obs_uv=jnp.asarray(obs_uv),
        obs_point=jnp.asarray(obs_pt),
        obs_w=jnp.asarray(obs_w),
    )
    return prob, poses_gt, jnp.asarray(pts_gt), n_out


class TestLocalBA:
    def test_converges_to_ground_truth(self, rng):
        cam = camera.EUROC_CAM
        prob, poses_gt, pts_gt, _ = make_ba_problem(rng, cam)
        res = local_ba.bundle_adjust(cam, prob)
        dt = np.asarray(se3.pose_t(res.poses) - se3.pose_t(poses_gt))
        assert np.linalg.norm(dt, axis=1).max() < 0.01, dt
        dp = np.linalg.norm(np.asarray(res.points - pts_gt), axis=1)
        # Triangulation noise floor: z²/f·σ/√C ≈ 0.045 m at 10 m depth.
        assert np.median(dp) < 0.08
        # Final reprojection cost sane: ~chi2 mean 2 per obs at 0.5px noise.
        n_act = int(res.obs_active.sum())
        assert float(res.cost) / max(n_act, 1) < 3.0

    def test_fixed_cameras_unchanged(self, rng):
        cam = camera.EUROC_CAM
        prob, _, _, _ = make_ba_problem(rng, cam)
        res = local_ba.bundle_adjust(cam, prob)
        np.testing.assert_array_equal(
            np.asarray(res.poses[:2]), np.asarray(prob.poses[:2])
        )

    def test_outlier_pruning(self, rng):
        cam = camera.EUROC_CAM
        prob, poses_gt, pts_gt, n_out = make_ba_problem(rng, cam, outlier_frac=0.15)
        res = local_ba.bundle_adjust(cam, prob)
        act = np.asarray(res.obs_active)
        assert act[-1, :n_out].sum() <= 2  # corrupted edges pruned
        dt = np.asarray(se3.pose_t(res.poses) - se3.pose_t(poses_gt))
        assert np.linalg.norm(dt, axis=1).max() < 0.02

    def test_improves_large_perturbation(self, rng):
        cam = camera.EUROC_CAM
        prob, poses_gt, pts_gt, _ = make_ba_problem(
            rng, cam, pose_pert=0.08, point_pert=0.3
        )
        start_err = np.linalg.norm(
            np.asarray(se3.pose_t(prob.poses) - se3.pose_t(poses_gt)), axis=1
        ).max()
        res = local_ba.bundle_adjust(cam, prob, iters_stage1=8, iters_stage2=12)
        end_err = np.linalg.norm(
            np.asarray(se3.pose_t(res.poses) - se3.pose_t(poses_gt)), axis=1
        ).max()
        assert end_err < 0.1 * start_err, (start_err, end_err)
