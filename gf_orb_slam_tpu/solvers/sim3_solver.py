"""Sim(3) RANSAC between two keyframes' matched map points.

Replaces src/Sim3Solver.cc (420 LoC): the reference's sequential 3-point Horn
RANSAC with two-way reprojection inlier checks becomes one batched program —
all hypotheses' Horn solves and all N×S inlier evaluations at once.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gf_orb_slam_tpu.geometry import sim3 as sim3_mod
from gf_orb_slam_tpu.geometry.camera import CameraModel
from gf_orb_slam_tpu.solvers.horn import horn_align


class Sim3Result(NamedTuple):
    S12: jnp.ndarray       # (8,) Sim3 mapping KF2-camera coords → KF1-camera coords
    inliers: jnp.ndarray   # (N,) bool
    n_inliers: jnp.ndarray
    ok: jnp.ndarray


def _project(cam: CameraModel, xc):
    z = jnp.where(jnp.abs(xc[..., 2]) < 1e-6, 1e-6, xc[..., 2])
    return jnp.stack(
        [cam.fx * xc[..., 0] / z + cam.cx, cam.fy * xc[..., 1] / z + cam.cy], axis=-1
    )


@partial(jax.jit, static_argnames=("cam", "n_iters", "fix_scale"))
def optimize_sim3(
    cam: CameraModel,
    S12_0: jnp.ndarray,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    sigma2_1: jnp.ndarray,
    sigma2_2: jnp.ndarray,
    valid: jnp.ndarray,
    n_iters: int = 10,
    fix_scale: bool = False,
    chi2_th: float = 9.21,
):
    """Sim3 LM refinement on two-way reprojection residuals (replaces
    Optimizer::OptimizeSim3, src/Optimizer.cc:2019-2217: g2o VertexSim3Expmap
    + forward/backward EdgeSim3ProjectXYZ). Autodiff Jacobians over the 7-dof
    tangent, Huber weights, fixed iterations. Returns (S12, inliers)."""
    from gf_orb_slam_tpu.geometry import sim3 as s3

    def residuals(xi, S_base):
        S = s3.compose(s3.exp(xi), S_base)
        r1 = uv1 - _project(cam, s3.transform_point(S[None], x2))
        r2 = uv2 - _project(cam, s3.transform_point(s3.inverse(S)[None], x1))
        return r1, r2

    def whitened_cost(xi, S_base, w_mask):
        r1, r2 = residuals(xi, S_base)
        c1 = jnp.sum(r1 * r1, axis=-1) / sigma2_1
        c2 = jnp.sum(r2 * r2, axis=-1) / sigma2_2
        return jnp.sum(jnp.where(w_mask, c1 + c2, 0.0)), (c1, c2)

    def step(carry, _):
        S, lam = carry
        zero = jnp.zeros(7)
        if fix_scale:
            sel = jnp.ones(7).at[6].set(0.0)
        else:
            sel = jnp.ones(7)
        _, (c1, c2) = whitened_cost(zero, S, valid)
        w_mask = valid & (c1 < chi2_th) & (c2 < chi2_th)

        def flat_res(xi):
            r1, r2 = residuals(xi * sel, S)
            r1 = r1 / jnp.sqrt(sigma2_1)[:, None] * w_mask[:, None]
            r2 = r2 / jnp.sqrt(sigma2_2)[:, None] * w_mask[:, None]
            return jnp.concatenate([r1.reshape(-1), r2.reshape(-1)])

        r = flat_res(jnp.zeros(7))
        J = jax.jacfwd(flat_res)(jnp.zeros(7))
        H = J.T @ J + lam * jnp.eye(7)
        g = J.T @ r
        delta = -jnp.linalg.solve(H, g) * sel
        S_new = s3.compose(s3.exp(delta), S)
        c_old, _ = whitened_cost(jnp.zeros(7), S, w_mask)
        c_new, _ = whitened_cost(jnp.zeros(7), S_new, w_mask)
        good = c_new < c_old
        S = jnp.where(good, S_new, S)
        lam = jnp.where(good, jnp.maximum(lam * 0.3, 1e-8), jnp.minimum(lam * 5.0, 1e5))
        return (S, lam), None

    (S, _), _ = jax.lax.scan(step, (S12_0, jnp.asarray(1e-3)), None, length=n_iters)
    _, (c1, c2) = whitened_cost(jnp.zeros(7), S, valid)
    inliers = valid & (c1 < chi2_th) & (c2 < chi2_th)
    return S, inliers


@partial(jax.jit, static_argnames=("cam", "n_hypotheses", "min_inliers", "fix_scale"))
def solve_sim3_ransac(
    cam: CameraModel,
    x1: jnp.ndarray,        # (N, 3) matched map points in KF1 camera frame
    x2: jnp.ndarray,        # (N, 3) same points in KF2 camera frame
    uv1: jnp.ndarray,       # (N, 2) their keypoint pixels in KF1
    uv2: jnp.ndarray,       # (N, 2) their keypoint pixels in KF2
    sigma2_1: jnp.ndarray,  # (N,) octave noise in KF1
    sigma2_2: jnp.ndarray,  # (N,) octave noise in KF2
    valid: jnp.ndarray,     # (N,) match mask
    key: jnp.ndarray,
    n_hypotheses: int = 128,
    min_inliers: int = 20,
    fix_scale: bool = False,
    chi2_th: float = 9.21,   # ref mTh (2-dof 99%, Sim3Solver.cc:76)
) -> Sim3Result:
    N = x1.shape[0]
    keys = jax.random.split(key, n_hypotheses)

    def sample3(k):
        g = jax.random.gumbel(k, (N,)) + jnp.where(valid, 0.0, -1e9)
        return jax.lax.top_k(g, 3)[1]

    idx = jax.vmap(sample3)(keys)                       # (S, 3)
    src = x2[idx]                                       # (S, 3, 3)
    dst = x1[idx]
    w3 = jnp.ones((n_hypotheses, 3))
    q, t, s = horn_align(src, dst, w3, with_scale=not fix_scale)
    S12 = sim3_mod.make_sim3(q, t, s)                   # (S, 8)

    # Two-way reprojection check for every hypothesis × point.
    S21 = sim3_mod.inverse(S12)
    x2_in_1 = sim3_mod.transform_point(S12[:, None, :], x2[None, :, :])  # (S, N, 3)
    x1_in_2 = sim3_mod.transform_point(S21[:, None, :], x1[None, :, :])
    e1 = jnp.sum((_project(cam, x2_in_1) - uv1[None]) ** 2, axis=-1) / sigma2_1[None]
    e2 = jnp.sum((_project(cam, x1_in_2) - uv2[None]) ** 2, axis=-1) / sigma2_2[None]
    inl = (e1 < chi2_th) & (e2 < chi2_th) & valid[None, :]
    counts = jnp.sum(inl.astype(jnp.int32), axis=1)

    best = jnp.argmax(counts)
    inliers = inl[best]

    # Refit on all inliers of the best hypothesis (precision, cf. our
    # initializer refit; the reference instead relies on OptimizeSim3 later).
    w_in = inliers.astype(x1.dtype)
    q_r, t_r, s_r = horn_align(x2, x1, w_in, with_scale=not fix_scale)
    S12_refit = sim3_mod.make_sim3(q_r, t_r, s_r)
    x2r = sim3_mod.transform_point(S12_refit[None, :], x2)
    x1r = sim3_mod.transform_point(sim3_mod.inverse(S12_refit)[None, :], x1)
    e1r = jnp.sum((_project(cam, x2r) - uv1) ** 2, axis=-1) / sigma2_1
    e2r = jnp.sum((_project(cam, x1r) - uv2) ** 2, axis=-1) / sigma2_2
    inl_r = (e1r < chi2_th) & (e2r < chi2_th) & valid
    use_refit = jnp.sum(inl_r.astype(jnp.int32)) >= counts[best]
    S_final = jnp.where(use_refit, S12_refit, S12[best])
    inl_final = jnp.where(use_refit, inl_r, inliers)
    n_in = jnp.sum(inl_final.astype(jnp.int32))
    return Sim3Result(
        S12=S_final,
        inliers=inl_final,
        n_inliers=n_in,
        ok=n_in >= min_inliers,
    )
