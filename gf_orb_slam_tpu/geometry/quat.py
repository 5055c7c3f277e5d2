"""Hamilton quaternion operations, wxyz convention.

Semantics match the reference's Armadillo helpers (include/Util.hpp:291-375:
qconj / q2r / v2q / qProd / qNormalize) so the PWLS kinematics and the GF
measurement Jacobians reproduce the reference's math, but everything here is
batch-friendly jnp: every function accepts leading batch dimensions.

q = [w, x, y, z]; q2r(q) is the rotation matrix R such that for a camera whose
orientation quaternion is q_wc (camera→world), R @ v_c = v_w.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-7


def qconj(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion conjugate [w, -x, -y, -z]."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def qnormalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def qprod(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q1 ⊗ q2 (ref Util.hpp:335-356 qProd)."""
    a, b, c, d = jnp.moveaxis(q1, -1, 0)
    w, x, y, z = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            a * w - b * x - c * y - d * z,
            a * x + b * w + c * z - d * y,
            a * y - b * z + c * w + d * x,
            a * z + b * y - c * x + d * w,
        ],
        axis=-1,
    )


def q2r(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion → DCM (ref Util.hpp:299-314 q2r). Shape (..., 4) → (..., 3, 3).

    Not normalized internally: the Jacobian structure the GF engine
    differentiates through (dRq_times_a_by_dq) relies on the homogeneous form.
    """
    r, x, y, z = jnp.moveaxis(q, -1, 0)
    row0 = jnp.stack(
        [r * r + x * x - y * y - z * z, 2.0 * (x * y - r * z), 2.0 * (z * x + r * y)], axis=-1
    )
    row1 = jnp.stack(
        [2.0 * (x * y + r * z), r * r - x * x + y * y - z * z, 2.0 * (y * z - r * x)], axis=-1
    )
    row2 = jnp.stack(
        [2.0 * (z * x - r * y), 2.0 * (y * z + r * x), r * r - x * x - y * y + z * z], axis=-1
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def r2q(R: jnp.ndarray) -> jnp.ndarray:
    """DCM → quaternion, wxyz, w >= 0. Branch-free (jnp.select) for jit.

    Uses the standard 4-candidate construction picking the largest diagonal
    pivot for numerical stability (replaces reference DCM2QUAT_float).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate constructions; q_i is valid when pivot_i is largest.
    def _safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, _EPS * _EPS))

    s_w = _safe_sqrt(1.0 + tr)  # 2*w / s
    q_w = jnp.stack(
        [0.5 * s_w, (m21 - m12) / (2.0 * s_w), (m02 - m20) / (2.0 * s_w), (m10 - m01) / (2.0 * s_w)],
        axis=-1,
    )
    s_x = _safe_sqrt(1.0 + m00 - m11 - m22)
    q_x = jnp.stack(
        [(m21 - m12) / (2.0 * s_x), 0.5 * s_x, (m01 + m10) / (2.0 * s_x), (m02 + m20) / (2.0 * s_x)],
        axis=-1,
    )
    s_y = _safe_sqrt(1.0 - m00 + m11 - m22)
    q_y = jnp.stack(
        [(m02 - m20) / (2.0 * s_y), (m01 + m10) / (2.0 * s_y), 0.5 * s_y, (m12 + m21) / (2.0 * s_y)],
        axis=-1,
    )
    s_z = _safe_sqrt(1.0 - m00 - m11 + m22)
    q_z = jnp.stack(
        [(m10 - m01) / (2.0 * s_z), (m02 + m20) / (2.0 * s_z), (m12 + m21) / (2.0 * s_z), 0.5 * s_z],
        axis=-1,
    )

    cond_tr = (tr > 0.0)[..., None]
    cond_x = ((m00 >= m11) & (m00 >= m22))[..., None]
    cond_y = (m11 >= m22)[..., None]
    q = jnp.where(cond_tr, q_w, jnp.where(cond_x, q_x, jnp.where(cond_y, q_y, q_z)))
    # Canonicalize sign (w >= 0) and normalize.
    q = q * jnp.where(q[..., :1] < 0.0, -1.0, 1.0)
    return qnormalize(q)


def v2q(v: jnp.ndarray) -> jnp.ndarray:
    """Rotation vector → quaternion (ref Util.hpp:316-333 v2q), batched & smooth.

    Differentiable at ||v|| = 0: the norm is computed from a clamped square
    ("double-where") so autodiff never sees sqrt'(0), and the small-angle
    branch provides the correct series value & derivative.
    """
    a2 = jnp.sum(v * v, axis=-1, keepdims=True)
    small = a2 < _EPS * _EPS
    a = jnp.sqrt(jnp.where(small, 1.0, a2))  # safe: gradient finite everywhere
    half = 0.5 * a
    sinc_half = jnp.where(small, 0.5 - a2 / 48.0, jnp.sin(half) / a)
    w = jnp.where(small, 1.0 - a2 / 8.0, jnp.cos(half))
    xyz = v * sinc_half
    return jnp.concatenate([w, xyz], axis=-1)


def q2v(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion → rotation vector (log map), batched, differentiable at
    identity (double-where on the vector-part norm)."""
    q = qnormalize(q)
    q = q * jnp.where(q[..., :1] < 0.0, -1.0, 1.0)
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    vn2 = jnp.sum(q[..., 1:] * q[..., 1:], axis=-1, keepdims=True)
    small = vn2 < _EPS * _EPS
    vn = jnp.sqrt(jnp.where(small, 1.0, vn2))
    angle = 2.0 * jnp.arctan2(vn, w)
    # small-angle series: scale = 2/w · (1 − vn²/(3w²)) → 2/w at vn→0
    scale = jnp.where(
        small, 2.0 / jnp.maximum(w, _EPS) * (1.0 - vn2 / (3.0 * jnp.maximum(w * w, _EPS))),
        angle / vn,
    )
    return q[..., 1:] * scale


def rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion q without forming the DCM."""
    t = 2.0 * jnp.cross(q[..., 1:], v)
    return v + q[..., :1] * t + jnp.cross(q[..., 1:], t)


# ---------------------------------------------------------------------------
# Quaternion-product Jacobian matrices (used by PWLS F-matrix and H47 blocks).
# ---------------------------------------------------------------------------


def left_prod_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """L(q) such that qprod(q, p) = L(q) @ p — the d(q⊗p)/dp Jacobian.

    Matches the reference's F_Q-style block with (R,X,Y,Z)=q
    (Util.hpp compute_F_subblock dq3_by_dq1, :824-831).
    """
    r, x, y, z = jnp.moveaxis(q, -1, 0)
    return jnp.stack(
        [
            jnp.stack([r, -x, -y, -z], axis=-1),
            jnp.stack([x, r, -z, y], axis=-1),
            jnp.stack([y, z, r, -x], axis=-1),
            jnp.stack([z, -y, x, r], axis=-1),
        ],
        axis=-2,
    )


def right_prod_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Rm(q) such that qprod(p, q) = Rm(q) @ p — the d(p⊗q)/dp Jacobian.

    Matches the reference's F_Q block with (R,X,Y,Z)=qMove
    (Util.hpp compute_F_subblock F_Q, :812-818).
    """
    r, x, y, z = jnp.moveaxis(q, -1, 0)
    return jnp.stack(
        [
            jnp.stack([r, -x, -y, -z], axis=-1),
            jnp.stack([x, r, z, -y], axis=-1),
            jnp.stack([y, -z, r, x], axis=-1),
            jnp.stack([z, y, -x, r], axis=-1),
        ],
        axis=-2,
    )


def dRq_a_dq(q: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """d(R(q) @ a)/dq, shape (..., 3, 4) (ref Util.hpp:390-445 dRq_times_a_by_dq).

    R is the homogeneous (unnormalized) quaternion DCM of q2r.
    """
    q0, qx, qy, qz = jnp.moveaxis(q, -1, 0)
    zero = jnp.zeros_like(q0)

    def m3(rows):
        return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)

    dR_dq0 = m3(
        [[2 * q0, -2 * qz, 2 * qy], [2 * qz, 2 * q0, -2 * qx], [-2 * qy, 2 * qx, 2 * q0]]
    )
    dR_dqx = m3(
        [[2 * qx, 2 * qy, 2 * qz], [2 * qy, -2 * qx, -2 * q0], [2 * qz, 2 * q0, -2 * qx]]
    )
    dR_dqy = m3(
        [[-2 * qy, 2 * qx, 2 * q0], [2 * qx, 2 * qy, 2 * qz], [-2 * q0, 2 * qz, -2 * qy]]
    )
    dR_dqz = m3(
        [[-2 * qz, -2 * q0, 2 * qx], [2 * q0, -2 * qz, 2 * qy], [2 * qx, 2 * qy, 2 * qz]]
    )
    del zero
    a_col = a[..., None]
    cols = [
        (dR_dq0 @ a_col)[..., 0],
        (dR_dqx @ a_col)[..., 0],
        (dR_dqy @ a_col)[..., 0],
        (dR_dqz @ a_col)[..., 0],
    ]
    return jnp.stack(cols, axis=-1)


def dqbar_by_dq(dtype=jnp.float32) -> jnp.ndarray:
    """d(conj(q))/dq — constant diagonal (ref Observability dqbar_by_dq).

    A function rather than a module-level constant so importing the package
    never triggers JAX backend initialization.
    """
    return jnp.diag(jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=dtype))


def slerp(q0: jnp.ndarray, q1: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Spherical interpolation (used by trajectory evaluation alignment)."""
    d = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(d < 0, -q1, q1)
    d = jnp.abs(d)
    # Fall back to lerp when nearly parallel.
    theta = jnp.arccos(jnp.clip(d, -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    near = sin_theta < _EPS
    w0 = jnp.where(near, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(near, 1.0, sin_theta))
    w1 = jnp.where(near, t, jnp.sin(t * theta) / jnp.where(near, 1.0, sin_theta))
    return qnormalize(w0 * q0 + w1 * q1)
