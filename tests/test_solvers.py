"""Solver tests on synthetic scenes — the reference's test fixture style
(test_Greedy.cpp:81-194): random visible landmarks, closed-form projections,
pixel noise, no images."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gf_orb_slam_tpu.geometry import camera, quat, se3
from gf_orb_slam_tpu.solvers import initializer, pose_opt


def synth_scene(rng, cam, n=200, noise_px=0.5, outlier_frac=0.0, depth=(4.0, 12.0)):
    """Random landmarks in front of a camera at a random pose; returns
    (pose_cw, points_w, uv_obs, valid)."""
    # Ground-truth camera: small random rotation/translation from origin.
    w = rng.normal(size=3) * 0.1
    t = rng.normal(size=3) * 0.5
    pose_cw = se3.make_pose(quat.v2q(jnp.asarray(w, jnp.float32)), jnp.asarray(t, jnp.float32))

    # Sample points in the camera frustum, then lift to world.
    uv = rng.uniform([60, 60], [cam.width - 60, cam.height - 60], size=(n, 2))
    z = rng.uniform(*depth, size=n)
    xc = np.asarray(camera.backproject(cam, jnp.asarray(uv, jnp.float32), jnp.asarray(z, jnp.float32)))
    points_w = np.asarray(se3.transform_point(se3.inverse(pose_cw), jnp.asarray(xc)))

    uv_obs = uv + rng.normal(size=(n, 2)) * noise_px
    n_out = int(n * outlier_frac)
    if n_out:
        uv_obs[:n_out] += rng.uniform(20, 80, size=(n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    return pose_cw, jnp.asarray(points_w, jnp.float32), jnp.asarray(uv_obs, jnp.float32), n_out


class TestPoseOptimization:
    def test_recovers_perturbed_pose(self, rng):
        cam = camera.EUROC_CAM
        pose_gt, pts, uv, _ = synth_scene(rng, cam, n=200, noise_px=0.3)
        # Perturb the pose.
        xi = jnp.asarray(rng.normal(size=6) * 0.05, jnp.float32)
        pose0 = se3.apply_left_update(xi, pose_gt)
        res = pose_opt.optimize_pose(
            cam, pose0, pts, uv, jnp.ones(200), jnp.ones(200, bool)
        )
        # Translation error
        dt = np.asarray(se3.pose_t(res.pose) - se3.pose_t(pose_gt))
        assert np.linalg.norm(dt) < 0.01, dt
        dq = np.asarray(quat.q2v(quat.qprod(quat.qconj(se3.pose_q(pose_gt)), se3.pose_q(res.pose))))
        assert np.linalg.norm(dq) < 0.005
        assert int(res.n_inliers) > 190

    def test_outlier_rejection(self, rng):
        cam = camera.EUROC_CAM
        pose_gt, pts, uv, n_out = synth_scene(rng, cam, n=300, noise_px=0.3, outlier_frac=0.25)
        xi = jnp.asarray(rng.normal(size=6) * 0.03, jnp.float32)
        pose0 = se3.apply_left_update(xi, pose_gt)
        res = pose_opt.optimize_pose(
            cam, pose0, pts, uv, jnp.ones(300), jnp.ones(300, bool)
        )
        inl = np.asarray(res.inliers)
        assert inl[:n_out].sum() <= 3              # outliers rejected
        assert inl[n_out:].mean() > 0.9            # inliers kept
        dt = np.asarray(se3.pose_t(res.pose) - se3.pose_t(pose_gt))
        assert np.linalg.norm(dt) < 0.02

    def test_selection_mask_subset(self, rng):
        """Optimizing on a GF-style subset still converges (the
        PoseOptimization_Selected pathway — valid mask as selection)."""
        cam = camera.EUROC_CAM
        pose_gt, pts, uv, _ = synth_scene(rng, cam, n=400, noise_px=0.3)
        sel = jnp.zeros(400, bool).at[:80].set(True)  # 80 selected features
        xi = jnp.asarray(rng.normal(size=6) * 0.05, jnp.float32)
        pose0 = se3.apply_left_update(xi, pose_gt)
        res = pose_opt.optimize_pose(cam, pose0, pts, uv, jnp.ones(400), sel)
        dt = np.asarray(se3.pose_t(res.pose) - se3.pose_t(pose_gt))
        assert np.linalg.norm(dt) < 0.02
        assert int(res.n_inliers) <= 80


class TestTwoViewInit:
    def make_pair(self, rng, cam, n=300, planar=False, baseline=0.4, noise=0.4):
        """Two views of a random (or planar) scene; returns pixel obs + T21."""
        if planar:
            pts = np.concatenate(
                [rng.uniform(-4, 4, (n, 2)), np.zeros((n, 1))], axis=1
            ) + np.asarray([0, 0, 8.0])
        else:
            pts = rng.uniform([-4, -3, 5.0], [4, 3, 14.0], size=(n, 3))
        pts = jnp.asarray(pts, jnp.float32)

        pose1 = se3.identity_pose()  # cam1 at origin
        w = jnp.asarray([0.02, -0.04, 0.01], jnp.float32)
        t = jnp.asarray([baseline, 0.02, -0.03], jnp.float32)
        pose2 = se3.make_pose(quat.v2q(w), t)  # T_2w = T_21 (since T_1w = I)

        uv1, _, v1 = camera.project(cam, se3.transform_point(pose1, pts))
        uv2, _, v2 = camera.project(cam, se3.transform_point(pose2, pts))
        ok = (
            np.asarray(v1) & np.asarray(v2)
            & np.asarray(camera.in_image(cam, uv1)) & np.asarray(camera.in_image(cam, uv2))
        )
        uv1 = np.asarray(uv1) + rng.normal(size=(n, 2)) * noise
        uv2 = np.asarray(uv2) + rng.normal(size=(n, 2)) * noise
        return (
            jnp.asarray(uv1, jnp.float32),
            jnp.asarray(uv2, jnp.float32),
            jnp.asarray(ok),
            pose2,
            pts,
        )

    def test_general_scene_uses_fundamental(self, rng):
        cam = camera.EUROC_CAM
        uv1, uv2, ok, pose21_gt, pts = self.make_pair(rng, cam, planar=False)
        res = initializer.initialize_two_view(
            cam, uv1, uv2, ok, jax.random.PRNGKey(3)
        )
        assert bool(res.success)
        assert not bool(res.used_homography)
        # Direction of translation (scale is unobservable).
        t_est = np.asarray(se3.pose_t(res.pose21))
        t_gt = np.asarray(se3.pose_t(pose21_gt))
        cos = abs(t_est @ t_gt) / (np.linalg.norm(t_est) * np.linalg.norm(t_gt))
        assert cos > 0.995, cos
        # Rotation error
        dq = quat.qprod(quat.qconj(se3.pose_q(pose21_gt)), se3.pose_q(res.pose21))
        assert np.linalg.norm(np.asarray(quat.q2v(dq))) < 0.01
        # Triangulated structure matches ground truth up to scale.
        tri = np.asarray(res.is_triangulated)
        assert tri.sum() > 100
        X = np.asarray(res.points3d)[tri]
        gt = np.asarray(pts)[tri]
        scale = np.median(X[:, 2]) / np.median(gt[:, 2])
        err = np.linalg.norm(X / scale - gt, axis=1)
        # DLT depth noise floor: z²/(f·b)·σ ≈ 0.25 m at 9 m depth, 0.4 px noise.
        assert np.median(err) < 0.3

    def test_planar_scene_uses_homography(self, rng):
        cam = camera.EUROC_CAM
        uv1, uv2, ok, pose21_gt, _ = self.make_pair(rng, cam, planar=True)
        res = initializer.initialize_two_view(
            cam, uv1, uv2, ok, jax.random.PRNGKey(5)
        )
        assert bool(res.used_homography)
        assert bool(res.success)
        t_est = np.asarray(se3.pose_t(res.pose21))
        t_gt = np.asarray(se3.pose_t(pose21_gt))
        cos = abs(t_est @ t_gt) / (np.linalg.norm(t_est) * np.linalg.norm(t_gt))
        assert cos > 0.99, cos

    def test_initialize_with_prior(self, rng):
        """Structure-only init with ground-truth motion (mirrors the
        reference's test_Initial.cpp StructureOnly fixture)."""
        cam = camera.EUROC_CAM
        uv1, uv2, ok, pose21_gt, pts = self.make_pair(rng, cam, planar=False)
        res = initializer.initialize_with_prior(cam, uv1, uv2, ok, pose21_gt)
        assert bool(res.success)
        tri = np.asarray(res.is_triangulated)
        assert tri.sum() > 150
        X = np.asarray(res.points3d)[tri]
        gt = np.asarray(pts)[tri]
        err = np.linalg.norm(X - gt, axis=1)
        assert np.median(err) < 0.2  # DLT noise floor at 0.4 px, ~9 m depth

    def test_degenerate_no_baseline_fails(self, rng):
        """Pure rotation (no parallax) must not report success."""
        cam = camera.EUROC_CAM
        uv1, uv2, ok, _, _ = self.make_pair(rng, cam, planar=False, baseline=0.0, noise=0.2)
        res = initializer.initialize_two_view(cam, uv1, uv2, ok, jax.random.PRNGKey(7))
        assert not bool(res.success)


class TestTriangulateDLT:
    def test_inhomogeneous_matches_homogeneous(self, rng):
        """The closed-form inhomogeneous DLT (production path) must agree with
        the homogeneous nullspace solution on well-conditioned geometry."""
        import jax.numpy as jnp
        from gf_orb_slam_tpu.geometry import se3, quat
        from gf_orb_slam_tpu.geometry.camera import EUROC_CAM, project
        from gf_orb_slam_tpu.solvers.initializer import (
            triangulate_dlt, triangulate_dlt_homogeneous)

        cam = EUROC_CAM
        X = rng.uniform([-3, -2, 4.0], [3, 2, 12.0], (200, 3)).astype(np.float32)
        p1 = se3.identity_pose()
        p2 = se3.make_pose(
            quat.v2q(jnp.asarray([0.0, 0.02, 0.0])), jnp.asarray([-0.3, 0.0, 0.0])
        )
        uv1, _, ok1 = project(cam, se3.transform_point(p1, jnp.asarray(X)))
        uv2, _, ok2 = project(cam, se3.transform_point(p2, jnp.asarray(X)))
        ok = np.asarray(ok1 & ok2)
        P1 = cam.K @ np.asarray(se3.pose_matrix(p1))[:3]
        P2 = cam.K @ np.asarray(se3.pose_matrix(p2))[:3]
        Xa = np.asarray(triangulate_dlt(jnp.asarray(P1), jnp.asarray(P2), uv1, uv2))
        Xb = np.asarray(triangulate_dlt_homogeneous(
            jnp.asarray(P1), jnp.asarray(P2), uv1, uv2))
        np.testing.assert_allclose(Xa[ok], X[ok], atol=2e-2)
        np.testing.assert_allclose(Xa[ok], Xb[ok], atol=2e-2)
