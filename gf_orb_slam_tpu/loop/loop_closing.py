"""Loop closing pipeline (reference src/LoopClosing.cc:63-618).

Three phases per keyframe, mirroring DetectLoop → ComputeSim3 → CorrectLoop,
each as jitted device programs orchestrated by pipeline/system.py (the
reference's dedicated thread + stop/release handshake with LocalMapping
becomes a plain sequenced call — the functional MapState makes the
mutex-and-abort protocol unnecessary):

1. detect: BoW candidates (retrieval/keyframe_db) with temporal consistency
   (the reference's 3-consecutive-keyframe group consistency check is kept as
   host-side scalar logic over candidate sets).
2. verify: BoW-gated descriptor matching between the query keyframe and the
   candidate → Sim3 RANSAC over the matched map-point pairs (solvers/
   sim3_solver) → accept at ≥20 inliers (ref LoopClosing.cc:398).
3. correct: propagate the corrective Sim3 to the query's covisible group,
   update their map points, then run the essential-graph Sim3 pose-graph
   optimization (solvers/pose_graph) and map-point re-anchoring.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gf_orb_slam_tpu.geometry import se3, sim3 as s3
from gf_orb_slam_tpu.geometry.camera import CameraModel
from gf_orb_slam_tpu.mapping import map_state as ms
from gf_orb_slam_tpu.ops import matching
from gf_orb_slam_tpu.retrieval import keyframe_db as kdb
from gf_orb_slam_tpu.solvers import pose_graph, sim3_solver


class LoopMatch(NamedTuple):
    ok: jnp.ndarray
    S12: jnp.ndarray          # Sim3: candidate-KF camera → query-KF camera
    n_inliers: jnp.ndarray    # OptimizeSim3 post-refine inlier count
    # Per-gate funnel statistics (the round-5 precision/recall study's raw
    # material — each verify gate's count regardless of the accept decision):
    n_bow: jnp.ndarray        # BoW-gated 3D-3D matches fed to Sim3 RANSAC
    n_ransac: jnp.ndarray     # best-hypothesis RANSAC inlier count
    n_guided: jnp.ndarray     # matches after the Sim3-guided rematch union


@partial(
    jax.jit,
    static_argnames=(
        "cam", "scale", "n_levels", "ransac_floor", "accept_ransac",
        "accept_refine", "n_hypotheses", "rematch_radius",
    ),
)
def verify_candidate(
    cam: CameraModel,
    m: ms.MapState,
    db: kdb.BowDatabase,
    query_kf: jnp.ndarray,
    cand_kf: jnp.ndarray,
    key: jnp.ndarray,
    scale: float = 1.2,
    n_levels: int = 8,
    ransac_floor: int = 20,   # RANSAC gate floor; the probe mode lowers it so
                              # borderline candidates still flow through
                              # rematch+refine and get funnel stats recorded
    accept_ransac: int = 20,  # shipped accept: RANSAC inliers ≥ this …
    accept_refine: int = 20,  # … AND OptimizeSim3 inliers ≥ this (ref
                              # LoopClosing.cc:398 nInliers>=20)
    n_hypotheses: int = 128,
    rematch_radius: float = 7.5,  # ref SearchBySim3 th=7.5 × octave scale
) -> LoopMatch:
    """ComputeSim3 for one candidate: BoW-gated matching of the two keyframes'
    map points, then Sim3 RANSAC on the matched 3D-3D pairs."""
    N = m.kp_capacity

    # BoW-gated descriptor matching between keypoints WITH map points.
    has1 = m.kf_kp_valid[query_kf] & (m.kf_obs_point[query_kf] >= 0)
    has2 = m.kf_kp_valid[cand_kf] & (m.kf_obs_point[cand_kf] >= 0)
    mask = kdb.bow_match_mask(
        db.mid_nodes[query_kf], db.mid_nodes[cand_kf], has1, has2
    )
    res = matching.match(
        m.kf_kp_desc[query_kf], m.kf_kp_desc[cand_kf], mask,
        max_dist=matching.TH_LOW, ratio=0.75,
        angle_q=m.kf_kp_angle[query_kf], angle_t=m.kf_kp_angle[cand_kf],
        mutual=True,
    )
    matched = res.matched & has1

    # 3D points of both sides in their local camera frames.
    p1_ids = jnp.maximum(m.kf_obs_point[query_kf], 0)
    p2_ids = jnp.maximum(m.kf_obs_point[cand_kf][res.idx], 0)
    good = matched & m.pt_valid[p1_ids] & m.pt_valid[p2_ids]
    x1 = se3.transform_point(m.kf_pose[query_kf], m.pt_pos[p1_ids])
    x2 = se3.transform_point(m.kf_pose[cand_kf], m.pt_pos[p2_ids])
    uv1 = m.kf_kp_uv[query_kf]
    uv2 = m.kf_kp_uv[cand_kf][res.idx]
    sigma2 = jnp.asarray([scale ** (2 * i) for i in range(n_levels)])
    s1 = sigma2[m.kf_kp_octave[query_kf]]
    s2 = sigma2[m.kf_kp_octave[cand_kf][res.idx]]

    sres = sim3_solver.solve_sim3_ransac(
        cam, x1, x2, uv1, uv2, s1, s2, good, key,
        n_hypotheses=n_hypotheses, min_inliers=ransac_floor,
    )

    # --- Sim3-guided re-match (ref ORBmatcher::SearchBySim3, cc:1841-2079):
    # project each side's map points into the other keyframe through the
    # RANSAC Sim3 and window-match descriptors, recovering correspondences the
    # BoW node gate missed. Both-direction projection agreement replaces the
    # reference's two sequential passes + agreement check.
    S12, S21 = sres.S12, s3.inverse(sres.S12)
    x2_all = se3.transform_point(m.kf_pose[cand_kf], m.pt_pos[
        jnp.maximum(m.kf_obs_point[cand_kf], 0)
    ])                                                    # (N,3) cand-cam
    uv2_all = m.kf_kp_uv[cand_kf]
    # cand points into query image / query points into cand image.
    p_q = sim3_solver._project(cam, s3.transform_point(S12[None], x2_all))  # (N,2)
    p_c = sim3_solver._project(cam, s3.transform_point(S21[None], x1))     # (N,2)
    sig1 = jnp.sqrt(s1)
    sig2 = jnp.sqrt(sigma2[m.kf_kp_octave[cand_kf]])
    r_th = rematch_radius
    d_a = jnp.sum((uv1[:, None, :] - p_q[None, :, :]) ** 2, axis=-1)  # (Nq,Nc)
    d_b = jnp.sum((p_c[:, None, :] - uv2_all[None, :, :]) ** 2, axis=-1)
    guided = (
        (d_a < (r_th * sig2[None, :]) ** 2)
        & (d_b < (r_th * sig1[:, None]) ** 2)
        & has1[:, None] & has2[None, :]
    )
    res_g = matching.match(
        m.kf_kp_desc[query_kf], m.kf_kp_desc[cand_kf], guided,
        max_dist=matching.TH_HIGH, mutual=True,
    )
    # Union: keep the RANSAC inlier set, add guided matches on free slots.
    add = res_g.matched & has1 & ~sres.inliers
    idx_u = jnp.where(add, res_g.idx, res.idx)
    valid_u = sres.inliers | add
    p2_u = jnp.maximum(m.kf_obs_point[cand_kf][idx_u], 0)
    valid_u = valid_u & m.pt_valid[p2_u] & m.pt_valid[p1_ids]
    x2_u = se3.transform_point(m.kf_pose[cand_kf], m.pt_pos[p2_u])
    uv2_u = m.kf_kp_uv[cand_kf][idx_u]
    s2_u = sigma2[m.kf_kp_octave[cand_kf][idx_u]]

    # --- OptimizeSim3 refine, accept at ≥20 post-refine inliers (ref
    # LoopClosing::ComputeSim3, cc:240-411 + Optimizer::OptimizeSim3).
    S_ref, inl_ref = sim3_solver.optimize_sim3(
        cam, S12, x1, x2_u, uv1, uv2_u, s1, s2_u, valid_u, n_iters=10
    )
    n_ref = jnp.sum(inl_ref.astype(jnp.int32))
    ok = (sres.n_inliers >= accept_ransac) & (n_ref >= accept_refine)
    S_final = jnp.where(ok, S_ref, S12)
    return LoopMatch(
        ok=ok, S12=S_final, n_inliers=n_ref,
        n_bow=jnp.sum(good.astype(jnp.int32)),
        n_ransac=sres.n_inliers,
        n_guided=jnp.sum(valid_u.astype(jnp.int32)),
    )


@partial(jax.jit, static_argnames=("cam", "n_iters", "n_fuse_targets", "n_fuse_sources", "scale", "n_levels"))
def correct_loop(
    m: ms.MapState,
    query_kf: jnp.ndarray,
    loop_kf: jnp.ndarray,
    S_query_loop: jnp.ndarray,   # Sim3 mapping loop-KF camera coords → query-KF camera coords
    covis: jnp.ndarray,
    n_iters: int = 20,
    cam: CameraModel | None = None,
    n_fuse_targets: int = 4,
    n_fuse_sources: int = 2,
    scale: float = 1.2,
    n_levels: int = 8,
) -> ms.MapState:
    """CorrectLoop (ref LoopClosing.cc:412-571): compute the corrected Sim3
    for the query keyframe, run the essential-graph optimization with the new
    loop edge, re-anchor map points via their reference keyframes, then
    SearchAndFuse (cc:572-618): project the loop side's map points into the
    query's covisible group and merge duplicates (needs `cam`; skipped when
    None for backward compatibility in unit fixtures)."""
    K = m.kf_capacity

    # Current S_cw estimates (unit scale).
    S_cw = s3.from_se3(m.kf_pose)                     # (K, 8)

    # Corrected pose of the query: S_query_w^corr = S_query_loop ∘ S_loop_w.
    S_qw_corr = s3.compose(S_query_loop, S_cw[loop_kf])

    # Pre-correction relative measurements; query vertex moved to corrected.
    poses0 = S_cw.at[query_kf].set(S_qw_corr)

    parent = ms.spanning_tree_parent(m, covis)
    loop_i = jnp.asarray([0], jnp.int32).at[0].set(loop_kf)
    loop_j = jnp.asarray([0], jnp.int32).at[0].set(query_kf)
    loop_valid = jnp.ones(1, bool)

    edge_i, edge_j, meas, edge_valid, weight = pose_graph.build_essential_edges(
        covis, parent, m.kf_valid, loop_i, loop_j, loop_valid, S_cw
    )
    # The loop edge measurement is the VERIFIED relative Sim3, not the drifted
    # estimate: S_query_loop maps loop-cam → query-cam.
    n_static = edge_i.shape[0]
    meas = meas.at[n_static - 1].set(S_query_loop)

    prob = pose_graph.PoseGraphProblem(
        poses=poses0,
        fixed=jnp.zeros(K, bool).at[loop_kf].set(True),
        vertex_valid=m.kf_valid,
        edge_i=edge_i,
        edge_j=edge_j,
        edge_meas=meas,
        edge_valid=edge_valid,
        edge_weight=weight,
    )
    S_opt = pose_graph.optimize_pose_graph(prob, n_iters=n_iters)

    # Re-anchor map points: move each point with its reference keyframe
    # (first observer): X' = S_opt_wc (S_old_cw (X)) — the reference's
    # CorrectedSim3 point update (LoopClosing.cc:445-467) applied globally.
    A = ms.incidence(m)
    first_kf = jnp.argmax(A, axis=0)                  # (P,)
    has_obs = A.any(axis=0)
    S_old = S_cw[first_kf]                            # (P, 8)
    S_new_wc = s3.inverse(S_opt)[first_kf]
    x_cam = s3.transform_point(S_old, m.pt_pos)
    x_new = s3.transform_point(S_new_wc, x_cam)
    new_pos = jnp.where(has_obs[:, None] & m.pt_valid[:, None], x_new, m.pt_pos)

    # Write back keyframe SE3 poses (scale folded into translation).
    new_kf_pose = s3.to_se3(S_opt)
    new_kf_pose = jnp.where(m.kf_valid[:, None], new_kf_pose, m.kf_pose)
    m = m._replace(kf_pose=new_kf_pose, pt_pos=new_pos)
    if cam is None:
        return m

    # --- SearchAndFuse (ref LoopClosing.cc:572-618): with all poses now in
    # the corrected frame, project the loop side's points (loop KF + its top
    # covisible neighbors) into the query's covisible group keyframes and
    # merge duplicate landmarks via the standard fuse kernel.
    from gf_orb_slam_tpu.mapping import keyframe_ops

    N = m.kp_capacity
    src_w, src_ids = jax.lax.top_k(covis[loop_kf], n_fuse_sources)
    src_ids = jnp.concatenate([loop_kf[None], src_ids])          # (S+1,)
    src_ok = jnp.concatenate([jnp.ones(1, bool), src_w >= 15])
    cand = m.kf_obs_point[src_ids].reshape(-1)
    cand_use = (cand >= 0) & jnp.repeat(src_ok, N)

    tgt_w, tgt_ids = jax.lax.top_k(covis[query_kf], n_fuse_targets)
    tgt_ids = jnp.concatenate([query_kf[None], tgt_ids])
    tgt_ok = jnp.concatenate([jnp.ones(1, bool), tgt_w >= 15])
    for i in range(n_fuse_targets + 1):
        m = keyframe_ops.fuse_into_keyframe(
            cam, m, tgt_ids[i], jnp.maximum(cand, 0), cand_use & tgt_ok[i],
            scale=scale, n_levels=n_levels,
        )
    m = ms.refresh_point_stats(m, scale=scale, n_levels=n_levels, update_desc=False)
    return m


class LoopDetector:
    """Host-side temporal-consistency bookkeeping (ref DetectLoop's
    mvConsistentGroups logic, LoopClosing.cc:160-238)."""

    def __init__(self, consistency_threshold: int = 3):
        self.consistency_threshold = consistency_threshold
        self.prev_groups: list[tuple[set, int]] = []  # (covisible-group, streak)

    def update_streaks(self, cand_ids, cand_ok, covis_row_of) -> list[tuple[int, int]]:
        """Advance the consistency state; returns (candidate, streak-length)
        for EVERY eligible candidate this round (streak 1 = first sighting).
        Exposing sub-threshold streaks lets the gate-study probe shadow-verify
        candidates the shipped threshold would not, without changing what the
        shipped `update` admits."""
        pairs = []
        new_groups: list[tuple[set, int]] = []
        for c, ok in zip(cand_ids, cand_ok):
            if not ok:
                continue
            group = set(covis_row_of(int(c))) | {int(c)}
            streak = 0
            for prev_set, prev_streak in self.prev_groups:
                if group & prev_set:
                    streak = max(streak, prev_streak + 1)
            new_groups.append((group, streak))
            pairs.append((int(c), streak + 1))
        self.prev_groups = new_groups
        return pairs

    def update(self, cand_ids, cand_ok, covis_row_of) -> list[int]:
        """Returns candidate keyframes whose group has been consistent for
        ≥ threshold consecutive detections."""
        return [
            c for c, s in self.update_streaks(cand_ids, cand_ok, covis_row_of)
            if s >= self.consistency_threshold
        ]

    def reset(self):
        self.prev_groups = []
