"""PWLS (piecewise-linear system) 13-state constant-velocity kinematics.

Replicates the reference's camera-state model used by the Good-Feature engine
(include/Util.hpp:787-1005: compute_F_subblock / assemble_F_matrix /
propagate_PWLS / dqomegadt_by_domega), vectorized for jit.

State vector Xv (13,):
    [0:3]   r    — camera position in world frame
    [3:7]   q    — camera→world orientation quaternion (wxyz), i.e. R(q)=R_wc
    [7:10]  v    — linear velocity in world frame
    [10:13] w    — angular velocity (body frame)

Propagation over dt:  r += v·dt;  q ← q ⊗ v2q(w·dt);  v, w constant.
F = dXv'/dXv is identity except F[0:3,7:10]=dt·I, F[3:7,3:7]=Rm(v2q(w·dt)),
F[3:7,10:13]=L(q)·d(v2q(w·dt))/dw.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from gf_orb_slam_tpu.geometry import quat, se3

_EPS = 1e-6


class KineState(NamedTuple):
    """PWLS segment: state vector + segment duration (ref Util.hpp KineStruct)."""

    Xv: jnp.ndarray  # (13,) or batched (..., 13)
    dt: jnp.ndarray  # scalar or (...,)


def state_from_pose_pair(
    t0: jnp.ndarray, Tcw0: jnp.ndarray, t1: jnp.ndarray, Tcw1: jnp.ndarray
) -> jnp.ndarray:
    """Build Xv from two timed camera poses (ref convert_Homo_Pair_To_PWLS_Vec,
    Util.hpp:912-959). Tcw are 7-vec world→camera poses.

    Position/orientation come from Twc1; velocity from the relative motion
    (Tcw0 ∘ Twc1)⁻¹ divided by the time gap; angular velocity from the log map
    of the relative rotation (stable version of the reference's
    get_angular_velocity_with_H small-angle extraction).
    """
    dt = (t1 - t0).astype(Tcw1.dtype)
    inv_dt = 1.0 / jnp.where(jnp.abs(dt) < _EPS, _EPS, dt)
    Twc1 = se3.inverse(Tcw1)
    r = se3.pose_t(Twc1)
    q = se3.pose_q(Twc1)
    T_rel = se3.inverse(se3.compose(Tcw0, Twc1))
    v = se3.pose_t(T_rel) * inv_dt
    w = quat.q2v(se3.pose_q(T_rel)) * inv_dt
    return jnp.concatenate([r, q, v, w], axis=-1)


def propagate(Xv: jnp.ndarray, dt: jnp.ndarray) -> jnp.ndarray:
    """One PWLS step (ref propagate_PWLS, Util.hpp:975-1005)."""
    dt = jnp.asarray(dt, dtype=Xv.dtype)
    r = Xv[..., 0:3] + Xv[..., 7:10] * dt[..., None]
    q_move = quat.v2q(Xv[..., 10:13] * dt[..., None])
    q = quat.qnormalize(quat.qprod(Xv[..., 3:7], q_move))
    return jnp.concatenate([r, q, Xv[..., 7:10], Xv[..., 10:13]], axis=-1)


def propagate_unnormalized(Xv: jnp.ndarray, dt: jnp.ndarray) -> jnp.ndarray:
    """Propagation without the quaternion renormalization — the map whose exact
    Jacobian is f_matrix (the reference's F ignores the normalization step)."""
    dt = jnp.asarray(dt, dtype=Xv.dtype)
    r = Xv[..., 0:3] + Xv[..., 7:10] * dt[..., None]
    q = quat.qprod(Xv[..., 3:7], quat.v2q(Xv[..., 10:13] * dt[..., None]))
    return jnp.concatenate([r, q, Xv[..., 7:10], Xv[..., 10:13]], axis=-1)


def dq_dt_by_domega(w: jnp.ndarray, dt: jnp.ndarray) -> jnp.ndarray:
    """d(v2q(w·dt))/dw, shape (..., 4, 3) (ref dqomegadt_by_domega via
    dq0_by_domegaA / dqA_by_domegaA / dqA_by_domegaB, Util.hpp:364-388).

    Branch-free with the ω→0 limits dq0/dw=−dt²·w/8→0, dqA/dwA→dt/2, dqA/dwB→0.
    """
    dt = jnp.asarray(dt, dtype=w.dtype)
    omega = jnp.linalg.norm(w, axis=-1)
    small = omega < _EPS
    om = jnp.where(small, 1.0, omega)
    half = om * dt / 2.0
    s, c = jnp.sin(half), jnp.cos(half)

    # Row 0: dq0/dwA = (-dt/2)(wA/ω)·sin(ω·dt/2); coefficient limit → -dt²/4.
    coef0 = jnp.where(small, -dt * dt / 4.0, (-dt / 2.0) * s / om)[..., None]
    row0 = coef0 * w  # (..., 3)

    # Diagonal: (dt/2)(wA²/ω²)cos + (1/ω)(1−wA²/ω²)sin ; limit → dt/2
    wa2 = (w * w) / (om * om)[..., None]
    diag = jnp.where(
        small[..., None],
        dt[..., None] / 2.0 * jnp.ones_like(w),
        (dt[..., None] / 2.0) * wa2 * c[..., None] + (1.0 / om[..., None]) * (1.0 - wa2) * s[..., None],
    )
    # Off-diagonal: (wA·wB/ω²)((dt/2)cos − (1/ω)sin) ; limit → 0
    off_coef = jnp.where(small, 0.0, ((dt / 2.0) * c - s / om) / (om * om))
    outer = w[..., :, None] * w[..., None, :]  # (..., 3, 3)
    eye = jnp.eye(3, dtype=w.dtype)
    J_xyz = off_coef[..., None, None] * outer * (1.0 - eye) + jnp.einsum(
        "...i,ij->...ij", diag, eye
    )
    return jnp.concatenate([row0[..., None, :], J_xyz], axis=-2)


def f_matrix(Xv: jnp.ndarray, dt: jnp.ndarray) -> jnp.ndarray:
    """State-transition Jacobian F (13×13) (ref compute_F_subblock +
    assemble_F_matrix, Util.hpp:787-973)."""
    dt = jnp.asarray(dt, dtype=Xv.dtype)
    batch = Xv.shape[:-1]
    q_old = Xv[..., 3:7]
    w_old = Xv[..., 10:13]
    q_move = quat.v2q(w_old * dt[..., None])

    F = jnp.broadcast_to(jnp.eye(13, dtype=Xv.dtype), batch + (13, 13))
    F = F.at[..., 0, 7].set(dt)
    F = F.at[..., 1, 8].set(dt)
    F = F.at[..., 2, 9].set(dt)
    # d(q_old ⊗ q_move)/d(q_old) = right-multiplication matrix of q_move.
    F_Q = quat.right_prod_matrix(q_move)
    # d(q_old ⊗ q_move)/dw = L(q_old) · d(q_move)/dw.
    F_Omg = quat.left_prod_matrix(q_old) @ dq_dt_by_domega(w_old, dt)
    F = F.at[..., 3:7, 3:7].set(F_Q)
    F = F.at[..., 3:7, 10:13].set(F_Omg)
    return F


def pose_cw_from_state(Xv: jnp.ndarray) -> jnp.ndarray:
    """Xv → 7-vec T_cw (ref convert_PWLS_Vec_To_Homo, Util.hpp:884-906)."""
    q_wc = quat.qnormalize(Xv[..., 3:7])
    q_cw = quat.qconj(q_wc)
    t_cw = -quat.rotate(q_cw, Xv[..., 0:3])
    return se3.make_pose(q_cw, t_cw)
