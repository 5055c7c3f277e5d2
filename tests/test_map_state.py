"""SoA map-state tests: insertion, incidence/covisibility, culling, fuse."""

import jax
import jax.numpy as jnp
import numpy as np

from gf_orb_slam_tpu.geometry import camera, quat, se3
from gf_orb_slam_tpu.mapping import keyframe_ops, map_state as ms


def small_map(n_kf=3, n_pts=20, n_kps=32, kf_cap=8, pt_cap=64):
    """A map where each keyframe observes points [0, n_pts) at slot = point id."""
    m = ms.empty_map(max_keyframes=kf_cap, max_points=pt_cap, max_kps=n_kps)
    rng = np.random.default_rng(0)
    pts = rng.uniform([-2, -2, 5], [2, 2, 10], (n_pts, 3)).astype(np.float32)
    slots = jnp.arange(pt_cap)
    m = ms.add_points(
        m, slots[:n_pts].astype(jnp.int32), jnp.asarray(pts),
        jnp.zeros((n_pts, 8), jnp.uint32), jnp.zeros((n_pts, 3)),
        jnp.full(n_pts, 0.5), jnp.full(n_pts, 50.0),
        first_kf=jnp.asarray(0), first_frame=jnp.asarray(0),
        use=jnp.ones(n_pts, bool),
    )
    for k in range(n_kf):
        obs = jnp.full(n_kps, ms.NO_POINT, jnp.int32).at[:n_pts].set(jnp.arange(n_pts))
        pose = se3.make_pose(
            quat.v2q(jnp.asarray([0.0, 0.01 * k, 0.0])), jnp.asarray([0.3 * k, 0, 0.0])
        )
        m, _ = ms.add_keyframe(
            m, pose, jnp.asarray(k * 10), jnp.asarray(float(k)),
            jnp.zeros((n_kps, 2)), jnp.zeros(n_kps, jnp.int32), jnp.zeros(n_kps),
            jnp.zeros((n_kps, 8), jnp.uint32), jnp.ones(n_kps, bool), obs,
        )
    return m


class TestMapState:
    def test_incidence_and_covisibility(self):
        m = small_map()
        A = np.asarray(ms.incidence(m))
        assert A[:3, :20].all()
        assert not A[3:].any() and not A[:, 20:].any()
        W = np.asarray(ms.covisibility(m))
        assert (W[:3, :3] - 20 * (1 - np.eye(3)) == 0).all()
        assert (np.asarray(ms.point_observation_count(m))[:20] == 3).all()
        # Row shortcut must agree with the full matrix for every keyframe.
        for k in range(4):
            row = np.asarray(ms.covisibility_row(m, jnp.asarray(k)))
            np.testing.assert_array_equal(row, W[k])

    def test_spanning_tree(self):
        m = small_map()
        parent = np.asarray(ms.spanning_tree_parent(m))
        assert parent[0] == -1          # root
        assert parent[1] == 0
        assert parent[2] in (0, 1)

    def test_erase_point_clears_observations(self):
        m = small_map()
        kill = jnp.zeros(64, bool).at[5].set(True)
        m2 = ms.erase_points(m, kill)
        assert not bool(m2.pt_valid[5])
        assert not (np.asarray(m2.kf_obs_point) == 5).any()
        assert int(ms.point_observation_count(m2)[5]) == 0

    def test_erase_keyframe(self):
        m = small_map()
        m2 = ms.erase_keyframe(m, jnp.asarray(1))
        assert not bool(m2.kf_valid[1])
        assert (np.asarray(ms.point_observation_count(m2))[:20] == 2).all()

    def test_replace_point_rewires(self):
        m = small_map()
        m2 = ms.replace_point(m, jnp.asarray(3), jnp.asarray(7))
        obs = np.asarray(m2.kf_obs_point)
        assert not (obs == 3).any()
        # slot 3 and slot 7 in each KF now both reference point 7
        assert (obs[:3, 3] == 7).all()
        assert not bool(m2.pt_valid[3])

    def test_free_slots_prefers_invalid(self):
        m = small_map()
        free = np.asarray(ms.free_point_slots(m, 4))
        assert (free >= 20).all()  # slots 0..19 occupied

    def test_refresh_point_stats(self):
        m = small_map()
        m2 = ms.refresh_point_stats(m)
        normals = np.asarray(m2.pt_normal[:20])
        # Points are in front (+z); normals should be ~+z unit vectors.
        assert (normals[:, 2] > 0.9).all()
        assert (np.asarray(m2.pt_max_dist[:20]) > 0).all()

    def test_cull_points_low_found_ratio(self):
        m = small_map()
        m = m._replace(
            pt_visible=m.pt_visible.at[2].set(20), pt_found=m.pt_found.at[2].set(1)
        )
        # current_kf=2: the point is still in the "recent" window (age < 3),
        # where the found-ratio rule applies (ref mlpRecentAddedMapPoints).
        m2 = keyframe_ops.cull_points(m, current_kf=jnp.asarray(2))
        assert not bool(m2.pt_valid[2])
        assert bool(m2.pt_valid[3])

    def test_keyframe_redundancy(self):
        m = small_map(n_kf=5)
        red = np.asarray(keyframe_ops.keyframe_redundancy(m))
        # every point has 5 obs (≥3 others at equal octave) → fully redundant
        assert (red[:5] > 0.89).all()

    def test_compact_keyframes_preserves_structure(self):
        """Renumbering live keyframes to the front must preserve per-keyframe
        observations, covisibility (up to the permutation), temporal order,
        and the point first-observer references."""
        m = small_map(n_kf=5)
        m = ms.erase_keyframe(m, jnp.asarray(1))
        m = ms.erase_keyframe(m, jnp.asarray(3))
        W_before = np.asarray(ms.covisibility(m))
        m2, perm, n_valid = ms.compact_keyframes(m)
        perm = np.asarray(perm)
        assert int(n_valid) == 3
        assert np.asarray(m2.kf_valid)[:3].all() and not np.asarray(m2.kf_valid)[3:].any()
        # Temporal (frame-id) order preserved among live keyframes.
        fids = np.asarray(m2.kf_frame_id)[:3]
        assert (np.diff(fids) > 0).all()
        # Observation rows moved with their keyframes.
        np.testing.assert_array_equal(
            np.asarray(m2.kf_obs_point), np.asarray(m.kf_obs_point)[perm]
        )
        # Covisibility invariant under renumbering.
        W_after = np.asarray(ms.covisibility(m2))
        np.testing.assert_array_equal(W_after, W_before[perm][:, perm])
        # first-observer ids remapped into the new numbering.
        first = np.asarray(m2.pt_first_kf)[np.asarray(m2.pt_valid)]
        assert (first < 3).all()

    def test_keyframe_redundancy_octave_rule(self):
        """Only same-or-finer-scale observers count (ref LocalMapping::
        KeyFrameCulling cc:562-618: scaleLeveli <= scaleLevel + 1)."""
        m = small_map(n_kf=5)
        # KF0 observes everything at octave 0; the other four at octave 3.
        oct_ = m.kf_kp_octave.at[1:5].set(3)
        m = m._replace(kf_kp_octave=oct_)
        red = np.asarray(keyframe_ops.keyframe_redundancy(m))
        # KF0: other observers are all at octave 3 > 0+1 → not redundant.
        assert red[0] < 0.01
        # KF1..4: ≥3 others at octave ≤ 3+1 (three octave-3 peers) → redundant.
        assert (red[1:5] > 0.89).all()


class TestTriangulateBetween:
    def test_creates_points(self):
        """Two keyframes seeing the same synthetic corners; unmatched keypoint
        slots should triangulate into new map points."""
        cam = camera.EUROC_CAM
        rng = np.random.default_rng(1)
        n_kps = 64
        m = ms.empty_map(max_keyframes=4, max_points=256, max_kps=n_kps)

        pts = rng.uniform([-3, -2, 6], [3, 2, 12], (40, 3)).astype(np.float32)
        pose1 = se3.identity_pose()
        pose2 = se3.make_pose(
            quat.v2q(jnp.asarray([0.0, 0.02, 0.0])), jnp.asarray([0.5, 0.0, 0.0])
        )
        descs = jnp.asarray(rng.integers(0, 2**32, (40, 8), dtype=np.uint32))

        def kf_arrays(pose):
            uv, _, ok = camera.project(cam, se3.transform_point(pose, jnp.asarray(pts)))
            ok = np.asarray(ok) & np.asarray(camera.in_image(cam, uv))
            kp_uv = jnp.zeros((n_kps, 2)).at[:40].set(uv)
            kp_valid = jnp.zeros(n_kps, bool).at[:40].set(jnp.asarray(ok))
            kp_desc = jnp.zeros((n_kps, 8), jnp.uint32).at[:40].set(descs)
            return kp_uv, kp_valid, kp_desc

        for i, pose in enumerate([pose1, pose2]):
            kp_uv, kp_valid, kp_desc = kf_arrays(pose)
            m, _ = ms.add_keyframe(
                m, pose, jnp.asarray(i), jnp.asarray(float(i)),
                kp_uv, jnp.zeros(n_kps, jnp.int32), jnp.zeros(n_kps),
                kp_desc, kp_valid, jnp.full(n_kps, ms.NO_POINT, jnp.int32),
            )

        m2 = keyframe_ops.triangulate_between(
            cam, m, jnp.asarray(0), jnp.asarray(1), frame_id=jnp.asarray(1)
        )
        n_created = int(m2.pt_valid.sum())
        assert n_created > 25, n_created
        # Triangulated positions close to ground truth.
        obs0 = np.asarray(m2.kf_obs_point[0])[:40]
        created = obs0 >= 0
        tri = np.asarray(m2.pt_pos)[obs0[created]]
        err = np.linalg.norm(tri - pts[created], axis=1)
        assert np.median(err) < 0.05, np.median(err)
        # Both keyframes observe the created points.
        assert (np.asarray(ms.point_observation_count(m2)) >= 2)[obs0[created]].all()
