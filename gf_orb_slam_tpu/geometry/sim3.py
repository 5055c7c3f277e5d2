"""Sim(3) similarity transforms as 8-vectors [qw qx qy qz tx ty tz s].

Replaces g2o's Sim3 type (Thirdparty/g2o/g2o/types/sim3/sim3.h) for the loop
closing pipeline: the Sim3Solver output, keyframe pose corrections, and the
essential-graph optimization all operate on this representation. Action:
S(x) = s·R(q)·x + t.
"""

from __future__ import annotations

import jax.numpy as jnp

from gf_orb_slam_tpu.geometry import quat, se3

_EPS = 1e-7


def make_sim3(q: jnp.ndarray, t: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """q (...,4), t (...,3), s (...,) → (...,8)."""
    return jnp.concatenate([q, t, s[..., None]], axis=-1)


def identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.asarray([1.0, 0, 0, 0, 0, 0, 0, 1.0], dtype=dtype)


def q_of(S):
    return S[..., :4]


def t_of(S):
    return S[..., 4:7]


def s_of(S):
    return S[..., 7]


def from_se3(p: jnp.ndarray, s: jnp.ndarray | float = 1.0) -> jnp.ndarray:
    s = jnp.broadcast_to(jnp.asarray(s, dtype=p.dtype), p.shape[:-1])
    return make_sim3(se3.pose_q(p), se3.pose_t(p), s)


def to_se3(S: jnp.ndarray) -> jnp.ndarray:
    """Drop scale into translation: T = [R | t/s] (the reference's convention
    when converting corrected Sim3 keyframe poses back to SE3,
    src/LoopClosing.cc:489-495)."""
    return se3.make_pose(q_of(S), t_of(S) / s_of(S)[..., None])


def transform_point(S: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    return s_of(S)[..., None] * quat.rotate(q_of(S), x) + t_of(S)


def compose(S1: jnp.ndarray, S2: jnp.ndarray) -> jnp.ndarray:
    """S1 ∘ S2: (s1 R1)(s2 R2 x + t2) + t1 = s1 s2 R1 R2 x + s1 R1 t2 + t1."""
    q = quat.qnormalize(quat.qprod(q_of(S1), q_of(S2)))
    t = s_of(S1)[..., None] * quat.rotate(q_of(S1), t_of(S2)) + t_of(S1)
    s = s_of(S1) * s_of(S2)
    return make_sim3(q, t, s)


def inverse(S: jnp.ndarray) -> jnp.ndarray:
    qi = quat.qconj(q_of(S))
    si = 1.0 / s_of(S)
    ti = -si[..., None] * quat.rotate(qi, t_of(S))
    return make_sim3(qi, ti, si)


# ---------------------------------------------------------------------------
# sim(3) exp/log maps — 7-dof tangent [rho(3), phi(3), sigma] — used by the
# essential-graph LM optimizer (replaces g2o EdgeSim3 machinery).
# ---------------------------------------------------------------------------


def exp(xi: jnp.ndarray) -> jnp.ndarray:
    """sim(3) exponential. xi = [rho, phi, sigma] → 8-vec."""
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    q = quat.v2q(phi)

    # Autodiff-safe norm (double-where: sqrt never differentiates at 0).
    theta2_raw = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.where(theta2_raw < _EPS * _EPS, 1.0, theta2_raw))
    theta = jnp.where(theta2_raw < _EPS * _EPS, 0.0, theta)
    W = se3.hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)

    # V matrix for sim3 (Ethan Eade / g2o sim3.h convention):
    # V = A*I + B*W + C*W^2 with coefficients depending on (sigma, theta).
    sig = sigma[..., None, None]
    th = theta[..., None, None]
    th2 = th * th
    s_nn = s[..., None, None]

    small_sig = jnp.abs(sig) < _EPS
    small_th = th < _EPS
    safe_sig = jnp.where(small_sig, 1.0, sig)
    safe_th = jnp.where(small_th, 1.0, th)

    # A = (s - 1)/sigma  (→ 1 as sigma→0)
    A = jnp.where(small_sig, 1.0 + sig / 2.0, (s_nn - 1.0) / safe_sig)

    sin_th = jnp.sin(th)
    cos_th = jnp.cos(th)
    denom = sig * sig + th2
    safe_denom = jnp.where(denom < _EPS * _EPS, 1.0, denom)

    # a = s*sin(theta), b = s*cos(theta)
    a = s_nn * sin_th
    b = s_nn * cos_th

    # General-case coefficients (both sigma and theta nonzero):
    B_gen = (a * sig + (1.0 - b) * th) / (safe_th * safe_denom)
    C_gen = (A - (b - 1.0) * sig / safe_denom - a * th / safe_denom) / th2_safe(th2, small_th)

    # sigma → 0 limits: B → (1-cos th)/th², C → (th - sin th)/th³
    B_sig0 = jnp.where(small_th, 0.5 - th2 / 24.0, (1.0 - cos_th) / th2_safe(th2, small_th))
    C_sig0 = jnp.where(
        small_th, 1.0 / 6.0 - th2 / 120.0, (th - sin_th) / (th2_safe(th2, small_th) * safe_th)
    )
    # theta → 0 limits: B → ((sigma-1)s+1)/sigma², C → (s(sigma²/2 - sigma + 1) - 1)/sigma³
    sig2 = safe_sig * safe_sig
    B_th0 = jnp.where(
        small_sig, 0.5 + sig / 6.0, ((safe_sig - 1.0) * s_nn + 1.0) / sig2
    )
    C_th0 = jnp.where(
        small_sig,
        1.0 / 6.0 + sig / 24.0,
        (s_nn * (sig * sig / 2.0 - sig + 1.0) - 1.0) / (sig2 * safe_sig),
    )

    B = jnp.where(small_th, B_th0, jnp.where(small_sig, B_sig0, B_gen))
    C = jnp.where(small_th, C_th0, jnp.where(small_sig, C_sig0, C_gen))

    V = A * eye + B * W + C * (W @ W)
    t = (V @ rho[..., None])[..., 0]
    return make_sim3(q, t, s)


def th2_safe(th2, small):
    return jnp.where(small, 1.0, th2)


def log(S: jnp.ndarray) -> jnp.ndarray:
    """sim(3) log via a few Newton-free closed forms: invert exp()'s V.

    Implemented by computing phi/sigma in closed form then solving V rho = t
    with a 3×3 solve (cheap, batched).
    """
    phi = quat.q2v(q_of(S))
    sigma = jnp.log(s_of(S))
    xi_no_rho = jnp.concatenate([jnp.zeros_like(phi), phi, sigma[..., None]], axis=-1)
    # Build V from exp() internals by calling exp with rho = e_i basis — instead
    # reconstruct V directly: exp() maps rho linearly to t, so probe with basis.
    basis = jnp.eye(3, dtype=S.dtype)

    def col(i):
        xi = xi_no_rho.at[..., :3].set(jnp.broadcast_to(basis[i], phi.shape))
        return t_of(exp(xi))

    V = jnp.stack([col(0), col(1), col(2)], axis=-1)
    rho = jnp.linalg.solve(V, t_of(S)[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)
