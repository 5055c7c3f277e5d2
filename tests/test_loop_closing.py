"""Loop-closing pipeline tests: Sim3 verification between drifted map
segments and essential-graph correction."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gf_orb_slam_tpu.geometry import camera, quat, se3, sim3 as s3
from gf_orb_slam_tpu.loop import loop_closing
from gf_orb_slam_tpu.mapping import map_state as ms
from gf_orb_slam_tpu.retrieval import keyframe_db as kdb
from gf_orb_slam_tpu.retrieval import vocabulary as voc_mod

CAM = camera.EUROC_CAM


def build_drifted_map(rng, drift_scale=1.25, drift_t=(0.6, -0.3, 0.2)):
    """A map whose second half (KFs 4-7 + duplicated points) drifted by a
    known Sim3 — the classic pre-loop-closure state: the same physical
    landmarks exist twice, old clean copies and new drifted copies."""
    n_pts, n_kps = 60, 96
    m = ms.empty_map(max_keyframes=8, max_points=256, max_kps=n_kps)

    pts_gt = rng.uniform([-3, -2, 6], [3, 2, 12], (n_pts, 3)).astype(np.float32)
    descs = rng.integers(0, 2**32, (n_pts, 8), dtype=np.uint32)

    S_drift = s3.make_sim3(
        quat.v2q(jnp.asarray([0.02, -0.03, 0.04])),
        jnp.asarray(drift_t, jnp.float32),
        jnp.asarray(drift_scale),
    )

    # Clean points (ids 0..n-1) and drifted duplicates (ids n..2n-1).
    pts_drift = np.asarray(s3.transform_point(S_drift[None], jnp.asarray(pts_gt)))
    all_pts = np.concatenate([pts_gt, pts_drift])
    all_descs = np.concatenate([descs, descs])  # same appearance!
    slots = jnp.arange(2 * n_pts, dtype=jnp.int32)
    m = ms.add_points(
        m, slots, jnp.asarray(all_pts), jnp.asarray(all_descs),
        jnp.zeros((2 * n_pts, 3)), jnp.full(2 * n_pts, 0.1), jnp.full(2 * n_pts, 100.0),
        first_kf=jnp.asarray(0), first_frame=jnp.asarray(0),
        use=jnp.ones(2 * n_pts, bool),
    )

    poses_gt = []
    for k in range(8):
        t = jnp.asarray([0.25 * k - 1.0, 0.02 * k, 0.0], jnp.float32)
        q = quat.v2q(jnp.asarray([0.0, 0.01 * k, 0.0], jnp.float32))
        poses_gt.append(se3.make_pose(q, t))

    for k in range(8):
        if k < 4:
            pose = poses_gt[k]
            base = 0
        else:
            # Drifted keyframes: camera-frame geometry consistent with the
            # drifted points: T_cw' = T_cw ∘ S_drift⁻¹ (as SE3 with scale).
            Sd_inv = s3.inverse(S_drift)
            pose_s = s3.compose(s3.from_se3(poses_gt[k]), Sd_inv)
            pose = s3.to_se3(pose_s)
            base = n_pts
        uv, _, ok = camera.project(
            CAM, se3.transform_point(pose, jnp.asarray(all_pts[base : base + n_pts]))
        )
        # For the drifted half, project through the *similarity* (scale matters):
        if k >= 4:
            xc = s3.transform_point(
                s3.compose(s3.from_se3(poses_gt[k]), s3.inverse(S_drift))[None],
                jnp.asarray(all_pts[base : base + n_pts]),
            )
            z = xc[:, 2]
            uv = jnp.stack(
                [CAM.fx * xc[:, 0] / z + CAM.cx, CAM.fy * xc[:, 1] / z + CAM.cy], axis=-1
            )
            ok = z > 0
        ok = np.asarray(ok) & np.asarray(camera.in_image(CAM, uv))
        obs = jnp.full(n_kps, ms.NO_POINT, jnp.int32).at[:n_pts].set(
            jnp.where(jnp.asarray(ok), jnp.arange(n_pts) + base, ms.NO_POINT)
        )
        kp_uv = jnp.zeros((n_kps, 2)).at[:n_pts].set(uv)
        kp_valid = jnp.zeros(n_kps, bool).at[:n_pts].set(jnp.asarray(ok))
        kp_desc = jnp.zeros((n_kps, 8), jnp.uint32).at[:n_pts].set(jnp.asarray(descs))
        m, _ = ms.add_keyframe(
            m, pose, jnp.asarray(k), jnp.asarray(float(k)),
            kp_uv, jnp.zeros(n_kps, jnp.int32), jnp.zeros(n_kps),
            kp_desc, kp_valid, obs,
        )
    return m, S_drift, poses_gt, n_pts


class TestLoopClosing:
    def test_verify_candidate_recovers_drift(self, rng):
        m, S_drift, poses_gt, n_pts = build_drifted_map(rng)
        voc = voc_mod.train_vocabulary(
            rng.integers(0, 2**32, (2000, 8), dtype=np.uint32), k=8, L=2
        )
        db = kdb.empty_db(8, m.kp_capacity, voc.n_words)
        for k in range(8):
            db = kdb.add_keyframe(db, voc, jnp.asarray(k), m.kf_kp_desc[k], m.kf_kp_valid[k])

        lm = loop_closing.verify_candidate(
            CAM, m, db, jnp.asarray(7), jnp.asarray(0), jax.random.PRNGKey(0)
        )
        assert bool(lm.ok), int(lm.n_inliers)
        # S12 maps KF0-camera coords → KF7-camera coords. Fit the expected
        # similarity directly from the ground-truth camera-frame point pairs.
        from gf_orb_slam_tpu.solvers.horn import horn_align

        x1_gt = se3.transform_point(m.kf_pose[7], m.pt_pos[n_pts : 2 * n_pts])
        x2_gt = se3.transform_point(m.kf_pose[0], m.pt_pos[:n_pts])
        q_e, t_e, s_e = horn_align(
            x2_gt[None], x1_gt[None], jnp.ones((1, n_pts)), with_scale=True
        )
        np.testing.assert_allclose(float(s3.s_of(lm.S12)), float(s_e[0]), rtol=0.05)
        np.testing.assert_allclose(
            np.asarray(s3.t_of(lm.S12)), np.asarray(t_e[0]), atol=0.1
        )

    def test_correct_loop_reduces_drift(self, rng):
        m, S_drift, poses_gt, n_pts = build_drifted_map(rng)
        voc = voc_mod.train_vocabulary(
            rng.integers(0, 2**32, (2000, 8), dtype=np.uint32), k=8, L=2
        )
        db = kdb.empty_db(8, m.kp_capacity, voc.n_words)
        for k in range(8):
            db = kdb.add_keyframe(db, voc, jnp.asarray(k), m.kf_kp_desc[k], m.kf_kp_valid[k])
        lm = loop_closing.verify_candidate(
            CAM, m, db, jnp.asarray(7), jnp.asarray(0), jax.random.PRNGKey(0)
        )
        assert bool(lm.ok)

        covis = ms.covisibility(m)
        m2 = loop_closing.correct_loop(
            m, jnp.asarray(7), jnp.asarray(0), lm.S12, covis
        )
        # KF7's pose should move toward its ground-truth (undrifted) pose.
        def pose_err(mm):
            t_est = np.asarray(se3.pose_t(mm.kf_pose[7]))
            t_gt = np.asarray(se3.pose_t(poses_gt[7]))
            return np.linalg.norm(t_est - t_gt)

        assert pose_err(m2) < 0.6 * pose_err(m), (pose_err(m), pose_err(m2))
