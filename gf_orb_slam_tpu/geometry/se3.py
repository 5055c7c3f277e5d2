"""SE(3)/SO(3) rigid-transform operations on (R, t) pairs and 7-vec poses.

Pose storage convention across the framework (mapping/map_state.py): a pose is
a 7-vector ``[qw qx qy qz tx ty tz]`` encoding T_cw (world→camera), the same
direction the reference keeps in ``Frame::mTcw`` / ``KeyFrame::Tcw``
(include/Frame.h:96, include/KeyFrame.h:150). All ops are batch-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp

from gf_orb_slam_tpu.geometry import quat

_EPS = 1e-7


def make_pose(q: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([q, t], axis=-1)


def pose_q(p: jnp.ndarray) -> jnp.ndarray:
    return p[..., :4]


def pose_t(p: jnp.ndarray) -> jnp.ndarray:
    return p[..., 4:7]


def identity_pose(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.asarray([1.0, 0, 0, 0, 0, 0, 0], dtype=dtype)


def pose_matrix(p: jnp.ndarray) -> jnp.ndarray:
    """7-vec → 4×4 homogeneous matrix."""
    R = quat.q2r(quat.qnormalize(pose_q(p)))
    t = pose_t(p)
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0, 0, 1.0], dtype=p.dtype), p.shape[:-1] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def from_matrix(T: jnp.ndarray) -> jnp.ndarray:
    return make_pose(quat.r2q(T[..., :3, :3]), T[..., :3, 3])


def compose(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """T(p1) @ T(p2) as 7-vecs."""
    q = quat.qnormalize(quat.qprod(pose_q(p1), pose_q(p2)))
    t = quat.rotate(pose_q(p1), pose_t(p2)) + pose_t(p1)
    return make_pose(q, t)


def inverse(p: jnp.ndarray) -> jnp.ndarray:
    qi = quat.qconj(pose_q(p))
    ti = -quat.rotate(qi, pose_t(p))
    return make_pose(qi, ti)


def transform_point(p: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Apply T(p) to 3D point(s) x."""
    return quat.rotate(pose_q(p), x) + pose_t(p)


def relative(p_a: jnp.ndarray, p_b: jnp.ndarray) -> jnp.ndarray:
    """T_a ∘ T_b⁻¹ — the transform taking frame b's camera to frame a's."""
    return compose(p_a, inverse(p_b))


# ---------------------------------------------------------------------------
# so(3)/se(3) exp & log maps and skew operators (used by the BA solvers, which
# parameterize updates in the tangent space like g2o's SE3Quat::exp_update).
# ---------------------------------------------------------------------------


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator, (..., 3) → (..., 3, 3)."""
    wx, wy, wz = jnp.moveaxis(w, -1, 0)
    zero = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zero, -wz, wy], axis=-1),
            jnp.stack([wz, zero, -wx], axis=-1),
            jnp.stack([-wy, wx, zero], axis=-1),
        ],
        axis=-2,
    )


def exp_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues' formula, series fallback near 0, autodiff-safe (double-where
    on θ² so sqrt never sees 0). (..., 3) → (..., 3, 3)."""
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    small = theta2 < _EPS * _EPS
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A * W + B * (W @ W)


def log_so3(R: jnp.ndarray) -> jnp.ndarray:
    return quat.q2v(quat.r2q(R))


def exp_se3(xi: jnp.ndarray) -> jnp.ndarray:
    """se(3) exp: xi = [rho(3), phi(3)] → 7-vec pose. Autodiff-safe at 0."""
    rho, phi = xi[..., :3], xi[..., 3:6]
    theta2 = jnp.sum(phi * phi, axis=-1)[..., None, None]
    small = theta2 < _EPS * _EPS
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    C = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2_safe * theta)
    )
    W = hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    V = eye + B * W + C * (W @ W)
    t = (V @ rho[..., None])[..., 0]
    return make_pose(quat.v2q(phi), t)


def apply_left_update(xi: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """exp(xi) ∘ T(p): the left-multiplicative update used by the LM solvers."""
    return compose(exp_se3(xi), p)
