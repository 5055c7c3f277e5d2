"""Sim3 RANSAC, PnP relocalization, and Sim3 pose-graph optimization tests."""

import jax
import jax.numpy as jnp
import numpy as np

from gf_orb_slam_tpu.geometry import camera, quat, se3, sim3 as s3
from gf_orb_slam_tpu.solvers import pnp, pose_graph, sim3_solver
from gf_orb_slam_tpu.solvers.horn import horn_align


class TestHorn:
    def test_exact_recovery(self, rng):
        src = jnp.asarray(rng.normal(size=(10, 3)), jnp.float32)
        q_gt = quat.v2q(jnp.asarray([0.2, -0.1, 0.3]))
        s_gt, t_gt = 1.7, jnp.asarray([0.5, -1.0, 2.0])
        dst = s_gt * quat.rotate(q_gt[None], src) + t_gt
        q, t, s = horn_align(src[None], dst[None], jnp.ones((1, 10)), with_scale=True)
        np.testing.assert_allclose(float(s[0]), s_gt, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(t[0]), np.asarray(t_gt), atol=1e-4)
        dq = quat.qprod(quat.qconj(q_gt), q[0])
        assert np.linalg.norm(np.asarray(quat.q2v(dq))) < 1e-4


class TestSim3Ransac:
    def make_case(self, rng, n=100, outlier_frac=0.2, scale=1.4):
        cam = camera.EUROC_CAM
        # points in KF1 camera frame (in front of camera)
        uv = rng.uniform([80, 80], [cam.width - 80, cam.height - 80], (n, 2)).astype(np.float32)
        z = rng.uniform(3, 10, n).astype(np.float32)
        x1 = np.asarray(camera.backproject(cam, jnp.asarray(uv), jnp.asarray(z)))
        S21 = s3.make_sim3(
            quat.v2q(jnp.asarray([0.05, -0.03, 0.08])),
            jnp.asarray([0.4, -0.2, 0.3]),
            jnp.asarray(scale),
        )
        x2 = np.asarray(s3.transform_point(S21[None], jnp.asarray(x1))).copy()
        n_out = int(n * outlier_frac)
        x2[:n_out] += rng.uniform(1.0, 3.0, (n_out, 3))
        uv1, _, _ = camera.project(cam, jnp.asarray(x1))
        uv2, _, _ = camera.project(cam, jnp.asarray(x2))
        return cam, jnp.asarray(x1), jnp.asarray(x2), uv1, uv2, S21, n_out

    def test_recovers_sim3_with_outliers(self, rng):
        cam, x1, x2, uv1, uv2, S21_gt, n_out = self.make_case(rng)
        n = x1.shape[0]
        res = sim3_solver.solve_sim3_ransac(
            cam, x1, x2, uv1, uv2, jnp.ones(n), jnp.ones(n), jnp.ones(n, bool),
            jax.random.PRNGKey(0),
        )
        assert bool(res.ok)
        inl = np.asarray(res.inliers)
        assert inl[:n_out].sum() <= 2
        S12_gt = s3.inverse(S21_gt)
        np.testing.assert_allclose(
            float(s3.s_of(res.S12)), float(s3.s_of(S12_gt)), rtol=0.02
        )
        np.testing.assert_allclose(
            np.asarray(s3.t_of(res.S12)), np.asarray(s3.t_of(S12_gt)), atol=0.05
        )

    def test_fix_scale_mode(self, rng):
        cam, x1, x2, uv1, uv2, S21_gt, _ = self.make_case(rng, scale=1.0, outlier_frac=0.1)
        n = x1.shape[0]
        res = sim3_solver.solve_sim3_ransac(
            cam, x1, x2, uv1, uv2, jnp.ones(n), jnp.ones(n), jnp.ones(n, bool),
            jax.random.PRNGKey(1), fix_scale=True,
        )
        assert bool(res.ok)
        np.testing.assert_allclose(float(s3.s_of(res.S12)), 1.0, atol=1e-5)


class TestPnP:
    def test_relocalization_recovery(self, rng):
        cam = camera.EUROC_CAM
        n = 150
        uv = rng.uniform([60, 60], [cam.width - 60, cam.height - 60], (n, 2)).astype(np.float32)
        z = rng.uniform(4, 12, n).astype(np.float32)
        pose_gt = se3.make_pose(
            quat.v2q(jnp.asarray([0.1, -0.15, 0.2])), jnp.asarray([0.5, -0.3, 0.8])
        )
        xc = camera.backproject(cam, jnp.asarray(uv), jnp.asarray(z))
        pts_w = se3.transform_point(se3.inverse(pose_gt), xc)
        uv_obs = np.asarray(uv) + rng.normal(0, 0.5, (n, 2)).astype(np.float32)
        n_out = 30
        uv_obs[:n_out] += rng.uniform(40, 120, (n_out, 2)).astype(np.float32)
        res = pnp.pnp_ransac(
            cam, pts_w, jnp.asarray(uv_obs), jnp.ones(n), jnp.ones(n, bool),
            jax.random.PRNGKey(0),
        )
        assert bool(res.ok)
        dt = np.asarray(se3.pose_t(res.pose) - se3.pose_t(pose_gt))
        assert np.linalg.norm(dt) < 0.02, dt
        assert np.asarray(res.inliers)[:n_out].sum() <= 2

    def test_fails_on_garbage(self, rng):
        cam = camera.EUROC_CAM
        n = 60
        pts_w = jnp.asarray(rng.uniform(-5, 5, (n, 3)), jnp.float32)
        uv = jnp.asarray(rng.uniform(0, 400, (n, 2)), jnp.float32)
        res = pnp.pnp_ransac(
            cam, pts_w, uv, jnp.ones(n), jnp.ones(n, bool), jax.random.PRNGKey(0)
        )
        assert not bool(res.ok)


class TestPoseGraph:
    def test_loop_correction_distributes_drift(self, rng):
        """Classic scenario: a chain of keyframes with accumulated drift and
        one loop edge pinning the ends together; optimization spreads the
        error along the chain (what CorrectLoop achieves via g2o)."""
        K = 12
        # Ground truth: poses on a circle (S_cw with unit scale).
        gt = []
        for k in range(K):
            th = 2 * np.pi * k / K
            q = quat.v2q(jnp.asarray([0.0, 0.0, th], jnp.float32))
            t = jnp.asarray([np.cos(th), np.sin(th), 0.0], jnp.float32)
            gt.append(s3.from_se3(se3.make_pose(q, t)))
        gt = jnp.stack(gt)

        # Odometry with drift: relative measurements correct, but integrated
        # poses perturbed increasingly.
        noisy = [np.asarray(gt[0])]
        for k in range(1, K):
            rel = s3.compose(gt[k], s3.inverse(gt[k - 1]))
            pert = s3.exp(jnp.asarray(np.r_[rng.normal(0, 0.02, 3), rng.normal(0, 0.01, 3), 0.0], jnp.float32))
            noisy.append(np.asarray(s3.compose(pert, s3.compose(rel, jnp.asarray(noisy[-1])))))
        noisy = jnp.asarray(np.stack(noisy))

        # Edges: chain (i, i+1) with measurements from GT; loop edge (0, K-1).
        ei = jnp.asarray(list(range(K - 1)) + [0], jnp.int32)
        ej = jnp.asarray(list(range(1, K)) + [K - 1], jnp.int32)
        meas = jax.vmap(lambda i, j: s3.compose(gt[j], s3.inverse(gt[i])))(ei, ej)
        prob = pose_graph.PoseGraphProblem(
            poses=noisy,
            fixed=jnp.zeros(K, bool).at[0].set(True),
            vertex_valid=jnp.ones(K, bool),
            edge_i=ei, edge_j=ej, edge_meas=meas,
            edge_valid=jnp.ones(K, bool),
            edge_weight=jnp.ones(K).at[-1].set(5.0),
        )
        out = pose_graph.optimize_pose_graph(prob, n_iters=25)
        err_before = np.linalg.norm(np.asarray(s3.t_of(noisy) - s3.t_of(gt)), axis=1)
        err_after = np.linalg.norm(np.asarray(s3.t_of(out) - s3.t_of(gt)), axis=1)
        assert err_after.max() < 0.35 * err_before.max(), (err_before.max(), err_after.max())
        assert err_after.mean() < 0.5 * err_before.mean()

    def test_scale_drift_correction(self, rng):
        """Sim3 pose graphs fix monocular scale drift — inject a scale ramp
        and verify the loop edge pulls scales back (the 7-DoF advantage)."""
        K = 8
        gt = []
        for k in range(K):
            t = jnp.asarray([float(k), 0.0, 0.0], jnp.float32)
            gt.append(s3.from_se3(se3.make_pose(jnp.asarray([1.0, 0, 0, 0]), t)))
        gt = jnp.stack(gt)
        drift = gt.at[:, 7].set(jnp.linspace(1.0, 1.5, K))  # growing scale error

        ei = jnp.asarray(list(range(K - 1)) + [0], jnp.int32)
        ej = jnp.asarray(list(range(1, K)) + [K - 1], jnp.int32)
        meas = jax.vmap(lambda i, j: s3.compose(gt[j], s3.inverse(gt[i])))(ei, ej)
        prob = pose_graph.PoseGraphProblem(
            poses=drift,
            fixed=jnp.zeros(K, bool).at[0].set(True),
            vertex_valid=jnp.ones(K, bool),
            edge_i=ei, edge_j=ej, edge_meas=meas,
            edge_valid=jnp.ones(K, bool),
            edge_weight=jnp.ones(K),
        )
        out = pose_graph.optimize_pose_graph(prob, n_iters=25)
        scales = np.asarray(s3.s_of(out))
        np.testing.assert_allclose(scales, 1.0, atol=0.05)
