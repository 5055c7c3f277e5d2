"""Duplicate map-point fusion tests (ref LocalMapping::SearchInNeighbors +
ORBmatcher::Fuse, src/LocalMapping.cc:411-560, src/ORBmatcher.cc:1590-1709):
merge-with-existing, claim-free-keypoint, already-in-target skip, and the
fused insertion program keeping the duplicate rate bounded on re-observation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gf_orb_slam_tpu.geometry import camera, quat, se3
from gf_orb_slam_tpu.mapping import keyframe_ops
from gf_orb_slam_tpu.mapping import map_state as ms

CAM = camera.EUROC_CAM


def build_duplicated_map(rng, n_pts=40, n_kps=64):
    """Two keyframes seeing the SAME physical landmarks through two different
    point-id sets (the post-retriangulation duplicate state): KF0 observes
    clean ids 0..n-1, KF1 observes duplicate ids n..2n-1 at identical world
    positions with identical descriptors."""
    m = ms.empty_map(max_keyframes=8, max_points=256, max_kps=n_kps)
    pts = rng.uniform([-3, -2, 6], [3, 2, 12], (n_pts, 3)).astype(np.float32)
    descs = rng.integers(0, 2**32, (n_pts, 8), dtype=np.uint32)

    all_pts = np.concatenate([pts, pts])
    all_descs = np.concatenate([descs, descs])
    slots = jnp.arange(2 * n_pts, dtype=jnp.int32)
    normals = -all_pts / np.linalg.norm(all_pts, axis=1, keepdims=True)
    # Realistic scale-invariance range: observation distance at octave 0
    # (pred_octave must land at 0, matching the octave-0 keypoints below).
    dists = np.linalg.norm(all_pts, axis=1).astype(np.float32)
    m = ms.add_points(
        m, slots, jnp.asarray(all_pts), jnp.asarray(all_descs),
        jnp.asarray(-normals), jnp.asarray(dists * 0.2), jnp.asarray(dists * 1.1),
        first_kf=jnp.asarray(0), first_frame=jnp.asarray(0),
        use=jnp.ones(2 * n_pts, bool),
    )

    poses = [
        se3.make_pose(quat.v2q(jnp.zeros(3)), jnp.asarray([-0.2, 0.0, 0.0])),
        se3.make_pose(quat.v2q(jnp.asarray([0.0, 0.02, 0.0])), jnp.asarray([0.2, 0.0, 0.0])),
    ]
    for k, base in ((0, 0), (1, n_pts)):
        uv, _, ok = camera.project(
            CAM, se3.transform_point(poses[k], jnp.asarray(pts))
        )
        ok = np.asarray(ok) & np.asarray(camera.in_image(CAM, uv))
        obs = jnp.full(n_kps, ms.NO_POINT, jnp.int32).at[:n_pts].set(
            jnp.where(jnp.asarray(ok), jnp.arange(n_pts) + base, ms.NO_POINT)
        )
        kp_uv = jnp.zeros((n_kps, 2)).at[:n_pts].set(uv)
        kp_valid = jnp.zeros(n_kps, bool).at[:n_pts].set(jnp.asarray(ok))
        kp_desc = jnp.zeros((n_kps, 8), jnp.uint32).at[:n_pts].set(jnp.asarray(descs))
        m, _ = ms.add_keyframe(
            m, poses[k], jnp.asarray(k), jnp.asarray(float(k)),
            kp_uv, jnp.zeros(n_kps, jnp.int32), jnp.zeros(n_kps),
            kp_desc, kp_valid, obs,
        )
    # Give the clean copies a third observer so they win the obs-count vote.
    m, _ = ms.add_keyframe(
        m, poses[0], jnp.asarray(2), jnp.asarray(2.0),
        m.kf_kp_uv[0], m.kf_kp_octave[0], m.kf_kp_angle[0],
        m.kf_kp_desc[0], m.kf_kp_valid[0], m.kf_obs_point[0],
    )
    return m, n_pts


class TestFuseIntoKeyframe:
    def test_merges_duplicates_keeping_more_observed(self, rng):
        m, n = build_duplicated_map(rng)
        before = int(m.pt_valid.sum())
        # Project KF0's (clean, 2-observer) points into KF1 (which holds the
        # 1-observer duplicates) — duplicates should die, observations rewire.
        cand = m.kf_obs_point[0]
        m2 = keyframe_ops.fuse_into_keyframe(
            CAM, m, jnp.asarray(1), jnp.maximum(cand, 0), cand >= 0
        )
        after = int(m2.pt_valid.sum())
        assert after < before, "no duplicates were fused"
        # Merged: KF1's observations now point at the clean ids (< n).
        obs1 = np.asarray(m2.kf_obs_point[1])
        rewired = obs1[(obs1 >= 0)]
        assert (rewired < n).mean() > 0.8, "observations not rewired to survivors"
        # The duplicate ids that died are exactly the invalidated ones.
        died = np.asarray(m.pt_valid & ~m2.pt_valid)
        assert died[:n].sum() == 0, "clean (more-observed) points must survive"

    def test_claim_free_keypoint(self, rng):
        m, n = build_duplicated_map(rng)
        # Strip KF1's associations: its keypoints become free, so fusing KF0's
        # points should CLAIM keypoints rather than merge.
        m = m._replace(
            kf_obs_point=m.kf_obs_point.at[1].set(
                jnp.full(m.kp_capacity, ms.NO_POINT, jnp.int32)
            )
        )
        cand = m.kf_obs_point[0]
        m2 = keyframe_ops.fuse_into_keyframe(
            CAM, m, jnp.asarray(1), jnp.maximum(cand, 0), cand >= 0
        )
        obs1 = np.asarray(m2.kf_obs_point[1])
        claimed = obs1[obs1 >= 0]
        assert len(claimed) > 0.5 * n
        assert (claimed < n).all()
        # No points die in the claim-only case.
        assert int(m2.pt_valid.sum()) == int(m.pt_valid.sum())

    def test_skips_candidates_already_in_target(self, rng):
        m, n = build_duplicated_map(rng)
        # Fusing KF0's points into KF0 itself must be an identity transform.
        cand = m.kf_obs_point[0]
        m2 = keyframe_ops.fuse_into_keyframe(
            CAM, m, jnp.asarray(0), jnp.maximum(cand, 0), cand >= 0
        )
        np.testing.assert_array_equal(
            np.asarray(m2.kf_obs_point), np.asarray(m.kf_obs_point)
        )
        np.testing.assert_array_equal(np.asarray(m2.pt_valid), np.asarray(m.pt_valid))

    def test_masked_out_is_identity(self, rng):
        m, _ = build_duplicated_map(rng)
        cand = m.kf_obs_point[0]
        m2 = keyframe_ops.fuse_into_keyframe(
            CAM, m, jnp.asarray(1), jnp.maximum(cand, 0), jnp.zeros_like(cand, dtype=bool)
        )
        np.testing.assert_array_equal(
            np.asarray(m2.kf_obs_point), np.asarray(m.kf_obs_point)
        )
        np.testing.assert_array_equal(np.asarray(m2.pt_valid), np.asarray(m.pt_valid))

    def test_counters_merge_on_replace(self, rng):
        m, n = build_duplicated_map(rng)
        m = m._replace(
            pt_found=m.pt_found.at[n].set(7), pt_visible=m.pt_visible.at[n].set(9)
        )
        cand = m.kf_obs_point[0]
        m2 = keyframe_ops.fuse_into_keyframe(
            CAM, m, jnp.asarray(1), jnp.maximum(cand, 0), cand >= 0
        )
        if not bool(m2.pt_valid[n]):  # duplicate id n was merged into id 0
            assert int(m2.pt_found[0]) == int(m.pt_found[0]) + 7
            assert int(m2.pt_visible[0]) == int(m.pt_visible[0]) + 9


def duplicate_rate(m, dist_th=0.05, desc_th=50):
    """Fraction of valid points having another valid point within dist_th
    whose descriptor Hamming distance is < desc_th."""
    valid = np.asarray(m.pt_valid)
    pos = np.asarray(m.pt_pos)[valid]
    desc = np.asarray(m.pt_desc)[valid]
    if len(pos) < 2:
        return 0.0
    d2 = np.sum((pos[:, None] - pos[None, :]) ** 2, axis=-1)
    x = desc[:, None] ^ desc[None, :]
    ham = np.zeros(x.shape[:2], np.int32)
    for w in range(8):
        ham += np.vectorize(lambda v: bin(v).count("1"))(x[:, :, w])
    np.fill_diagonal(d2, np.inf)
    dup = (d2 < dist_th**2) & (ham < desc_th)
    return dup.any(axis=1).mean()


class TestBatchedFuse:
    def test_single_target_matches_reference_impl(self, rng):
        """fuse_points_into_keyframes with F=1 must produce the same map as
        the single-target fuse_into_keyframe (the reference formulation) —
        the batching is program structure, not semantics."""
        m, n = build_duplicated_map(rng)
        cand = m.kf_obs_point[0]
        m_ref = keyframe_ops.fuse_into_keyframe(
            CAM, m, jnp.asarray(1), jnp.maximum(cand, 0), cand >= 0
        )
        m_bat = keyframe_ops.fuse_points_into_keyframes(
            CAM, m, jnp.asarray([1]), jnp.ones(1, bool),
            jnp.maximum(cand, 0)[None], (cand >= 0)[None],
        )
        np.testing.assert_array_equal(
            np.asarray(m_ref.pt_valid), np.asarray(m_bat.pt_valid)
        )
        np.testing.assert_array_equal(
            np.asarray(m_ref.kf_obs_point), np.asarray(m_bat.kf_obs_point)
        )
        np.testing.assert_array_equal(
            np.asarray(m_ref.pt_found), np.asarray(m_bat.pt_found)
        )

    def test_counters_added_once_for_pair_seen_by_multiple_targets(self, rng):
        """All F targets share the new keyframe's candidate list, so the same
        (old,new) merge pair can be detected by several targets at once. The
        survivor must receive the dead point's visible/found counters exactly
        ONCE (advisor finding, round 4: a pair-keyed scatter-add donated them
        k times, permanently inflating the found/visible culling ratio)."""
        m, n = build_duplicated_map(rng)
        # KF3 := copy of KF1 (second observer of every duplicate id);
        # KF4 := copy of KF0 (third observer of every clean id, so the clean
        # copies still win the obs-count vote 3 > 2).
        m, _ = ms.add_keyframe(
            m, m.kf_pose[1], jnp.asarray(3), jnp.asarray(3.0),
            m.kf_kp_uv[1], m.kf_kp_octave[1], m.kf_kp_angle[1],
            m.kf_kp_desc[1], m.kf_kp_valid[1], m.kf_obs_point[1],
        )
        m, _ = ms.add_keyframe(
            m, m.kf_pose[0], jnp.asarray(4), jnp.asarray(4.0),
            m.kf_kp_uv[0], m.kf_kp_octave[0], m.kf_kp_angle[0],
            m.kf_kp_desc[0], m.kf_kp_valid[0], m.kf_obs_point[0],
        )
        m = m._replace(
            pt_visible=m.pt_visible.at[n : 2 * n].set(9),
            pt_found=m.pt_found.at[n : 2 * n].set(7),
        )
        cand = m.kf_obs_point[0]
        # Both targets (KF1 and KF3) hold the duplicate ids and receive the
        # clean candidate list — every merge pair is detected twice.
        m2 = keyframe_ops.fuse_points_into_keyframes(
            CAM, m, jnp.asarray([1, 3]), jnp.ones(2, bool),
            jnp.broadcast_to(jnp.maximum(cand, 0)[None], (2, cand.shape[0])),
            jnp.broadcast_to((cand >= 0)[None], (2, cand.shape[0])),
        )
        died = np.asarray(m.pt_valid & ~m2.pt_valid)
        assert died[n : 2 * n].sum() > 0, "no duplicates were fused"
        vis2, fnd2 = np.asarray(m2.pt_visible), np.asarray(m2.pt_found)
        vis1, fnd1 = np.asarray(m.pt_visible), np.asarray(m.pt_found)
        for dup_id in np.flatnonzero(died):
            surv = dup_id - n  # clean copy of the same landmark
            assert vis2[surv] == vis1[surv] + 9, (
                f"survivor {surv} got visible +{vis2[surv] - vis1[surv]}, "
                "expected exactly one +9 donation"
            )
            assert fnd2[surv] == fnd1[surv] + 7

    def test_disabled_target_is_identity(self, rng):
        m, n = build_duplicated_map(rng)
        cand = m.kf_obs_point[0]
        m2 = keyframe_ops.fuse_points_into_keyframes(
            CAM, m, jnp.asarray([1]), jnp.zeros(1, bool),
            jnp.maximum(cand, 0)[None], (cand >= 0)[None],
        )
        np.testing.assert_array_equal(
            np.asarray(m.kf_obs_point), np.asarray(m2.kf_obs_point)
        )
        np.testing.assert_array_equal(
            np.asarray(m.pt_valid), np.asarray(m2.pt_valid)
        )
