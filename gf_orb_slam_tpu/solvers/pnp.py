"""PnP RANSAC for relocalization: batched EPnP-style minimal solves.

Replaces src/PnPsolver.cc (994 LoC, EPnP + custom RANSAC): hypotheses are
4-point subsets solved with the EPnP N=1 path (world control points →
camera-frame control points via the 12×12 M-matrix nullspace, scale fixed by
inter-control-point distances, pose by Horn alignment) — all hypotheses in one
vmapped program, scored densely, winner refined by the staged pose LM.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gf_orb_slam_tpu.geometry import linalg, se3
from gf_orb_slam_tpu.geometry.camera import CameraModel, project
from gf_orb_slam_tpu.solvers import pose_opt
from gf_orb_slam_tpu.solvers.horn import horn_align

MIN_SET = 6


class PnPResult(NamedTuple):
    pose: jnp.ndarray      # (7,) T_cw
    inliers: jnp.ndarray   # (N,) bool
    n_inliers: jnp.ndarray
    ok: jnp.ndarray


def _control_points(pts: jnp.ndarray):
    """4 control points: centroid + principal axes (EPnP choose_control_points)."""
    c0 = jnp.mean(pts, axis=0)
    centered = pts - c0
    cov = centered.T @ centered / pts.shape[0]
    evals, evecs = jnp.linalg.eigh(cov)
    scale = jnp.sqrt(jnp.maximum(evals, 1e-8))
    cps = c0[None, :] + (evecs * scale[None, :]).T  # rows = c0 + sqrt(λi)·vi
    return jnp.concatenate([c0[None, :], cps], axis=0)  # (4, 3)


def _barycentric(pts, cps):
    """alphas: pts = Σ α_i cp_i, Σ α = 1."""
    M = jnp.concatenate([cps.T, jnp.ones((1, 4))], axis=0)       # (4, 4)
    rhs = jnp.concatenate([pts.T, jnp.ones((1, pts.shape[0]))], axis=0)
    return jnp.linalg.solve(M, rhs).T                            # (n, 4)


def _epnp_minimal(cam: CameraModel, pts_w: jnp.ndarray, uv: jnp.ndarray):
    """EPnP N=1 on a minimal set → 7-vec T_cw. pts_w (M,3), uv (M,2)."""
    M_set = pts_w.shape[0]
    cps = _control_points(pts_w)
    alpha = _barycentric(pts_w, cps)                             # (M, 4)

    # Build the 2M×12 M-matrix.
    fu, fv, cx, cy = cam.fx, cam.fy, cam.cx, cam.cy
    u, v = uv[:, 0], uv[:, 1]
    rows = []
    for i in range(4):
        a = alpha[:, i]
        rows.append(jnp.stack([a * fu, jnp.zeros_like(a), a * (cx - u)], axis=-1))
    row_u = jnp.concatenate(rows, axis=-1)                       # (M, 12)
    rows = []
    for i in range(4):
        a = alpha[:, i]
        rows.append(jnp.stack([jnp.zeros_like(a), a * fv, a * (cy - v)], axis=-1))
    row_v = jnp.concatenate(rows, axis=-1)
    Mm = jnp.concatenate([row_u, row_v], axis=0)                 # (2M, 12)

    vec = linalg.smallest_eigvec_sym(Mm.T @ Mm)                  # (12,)
    cc = vec.reshape(4, 3)                                       # camera-frame ctrl pts (up to scale/sign)

    # Scale: preserve inter-control-point distances.
    def pdists(x):
        d = x[:, None, :] - x[None, :, :]
        return jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1), 1e-12))

    dw = pdists(cps)
    dc = pdists(cc)
    iu = jnp.triu_indices(4, 1)
    beta = jnp.sum(dw[iu] * dc[iu]) / jnp.maximum(jnp.sum(dc[iu] * dc[iu]), 1e-12)
    cc = cc * beta
    # Sign: points must be in front of the camera.
    xc = alpha @ cc                                              # (M, 3)
    flip = jnp.sum(xc[:, 2]) < 0
    cc = jnp.where(flip, -cc, cc)

    # Pose from world↔camera control-point correspondence.
    q, t, _ = horn_align(cps[None], cc[None], jnp.ones((1, 4)), with_scale=False)
    return se3.make_pose(q[0], t[0])


@partial(jax.jit, static_argnames=("cam", "n_hypotheses", "min_inliers"))
def pnp_ransac(
    cam: CameraModel,
    points_w: jnp.ndarray,   # (N, 3) candidate 3D points
    uv: jnp.ndarray,         # (N, 2) their 2D matches in the lost frame
    sigma2: jnp.ndarray,     # (N,) per-observation noise (octave)
    valid: jnp.ndarray,      # (N,) match mask
    key: jnp.ndarray,
    n_hypotheses: int = 128,
    min_inliers: int = 15,
    chi2_th: float = 5.991,
) -> PnPResult:
    """Batched-hypothesis PnP RANSAC + LM refinement (ref PnPsolver::iterate
    + the Relocalisation PoseOptimization loop, Tracking.cc:3942-4010)."""
    N = points_w.shape[0]
    keys = jax.random.split(key, n_hypotheses)

    def sample(k):
        g = jax.random.gumbel(k, (N,)) + jnp.where(valid, 0.0, -1e9)
        return jax.lax.top_k(g, MIN_SET)[1]

    idx = jax.vmap(sample)(keys)                                  # (S, 6)
    poses = jax.vmap(lambda i: _epnp_minimal(cam, points_w[i], uv[i]))(idx)

    # Score all hypotheses densely.
    xc = se3.transform_point(poses[:, None, :], points_w[None])   # (S, N, 3)
    uv_hat, _, front = project(cam, xc)
    chi2 = jnp.sum((uv_hat - uv[None]) ** 2, axis=-1) / sigma2[None]
    inl = (chi2 < chi2_th) & front & valid[None]
    counts = jnp.sum(inl.astype(jnp.int32), axis=1)
    best = jnp.argmax(counts)

    # Refine the winner with the staged robust pose LM on its inliers.
    res = pose_opt.optimize_pose(
        cam, poses[best], points_w, uv, 1.0 / sigma2, inl[best]
    )
    return PnPResult(
        pose=res.pose,
        inliers=res.inliers,
        n_inliers=res.n_inliers,
        ok=res.n_inliers >= min_inliers,
    )
