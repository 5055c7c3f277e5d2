"""Measurement Jacobians & information matrices wrt the PWLS camera state.

Reference: Observability::compute_H_subblock_simplied
(include/Observability.h:460-520), runMatrixBuilding (src/Observability.cc:646)
and reWeightInfoMat (Observability.h:517-570). The reference fans these out
over hardware_concurrency()−1 std::threads in equal index ranges — here the
landmark dimension is simply the batch axis of one einsum program.

State & measurement model (matching the reference exactly):
  camera state Xv = [r(3), q_wr(4), v(3), w(3)] (see geometry/pwls.py);
  landmark y ∈ R³ in world frame;  camera-frame position hrl = R_rw (y − r);
  pixel u = fu·x/z + cx, v = fv·y/z + cy.
  H13 = ∂(u,v)/∂r = −dhu_dhrl · R_rw                       (2×3)
  H47 = ∂(u,v)/∂q = dhu_dhrl · dRq_a_dq(q̄, y−r) · dq̄/dq   (2×4)
with dhu_dhrl the pinhole Jacobian at hrl and q̄ = conj(q).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from gf_orb_slam_tpu.geometry import quat
from gf_orb_slam_tpu.geometry.camera import CameraModel, projection_jacobian


class ObsJacobians(NamedTuple):
    H13: jnp.ndarray       # (N, 2, 3)
    H47: jnp.ndarray       # (N, 2, 4)
    H: jnp.ndarray         # (N, 2, 7) = [H13 | H47]
    uv: jnp.ndarray        # (N, 2) predicted pixels
    visible: jnp.ndarray   # (N,) bool


def measurement_jacobians(
    cam: CameraModel,
    Xv: jnp.ndarray,
    points_w: jnp.ndarray,
    bound_depth: float = 0.0,
    bound_frame: float = 0.0,
) -> ObsJacobians:
    """Batched H-subblock computation for all landmarks at once.

    bound_* widen the visibility gate like the reference's mBoundDepth /
    mBoundXInFrame (Observability.h:489-498) to tolerate prediction error.
    """
    q_wr = quat.qnormalize(Xv[..., 3:7])
    R_wr = quat.q2r(q_wr)
    R_rw = jnp.swapaxes(R_wr, -1, -2)
    t_rw = points_w - Xv[..., None, 0:3]          # (N, 3) world offsets
    hrl = jnp.einsum("...ij,...nj->...ni", R_rw, t_rw)  # camera-frame coords

    z = hrl[..., 2]
    z_ok = z > bound_depth
    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    u = cam.fx * hrl[..., 0] / z_safe + cam.cx
    v = cam.fy * hrl[..., 1] / z_safe + cam.cy
    uv = jnp.stack([u, v], axis=-1)
    visible = (
        z_ok
        & (u >= -bound_frame)
        & (u < cam.width + bound_frame)
        & (v >= -bound_frame)
        & (v < cam.height + bound_frame)
    )

    dhu = projection_jacobian(cam, hrl)           # (N, 2, 3)
    H13 = -jnp.einsum("nij,...jk->nik", dhu, R_rw)
    dR = quat.dRq_a_dq(quat.qconj(q_wr)[..., None, :], t_rw)  # (N, 3, 4)
    H47 = jnp.einsum("nij,njk,kl->nil", dhu, dR, quat.dqbar_by_dq(Xv.dtype))
    H = jnp.concatenate([H13, H47], axis=-1)
    return ObsJacobians(H13=H13, H47=H47, H=H, uv=uv, visible=visible)


def whiten(H: jnp.ndarray, sigma2: jnp.ndarray) -> jnp.ndarray:
    """Octave-leveled noise whitening (ref reWeightInfoMat with
    WITH_OCT_LEVELED_NOISE): Σ = σ²·I per observation → H/σ."""
    return H / jnp.sqrt(sigma2)[..., None, None]


def info_matrices(H_w: jnp.ndarray, visible: jnp.ndarray) -> jnp.ndarray:
    """(N, 2, 7) whitened Jacobians → (N, 7, 7) per-landmark information
    blocks HᵀΣ⁻¹H; invisible landmarks contribute zeros."""
    blocks = jnp.einsum("nri,nrj->nij", H_w, H_w)
    return jnp.where(visible[:, None, None], blocks, 0.0)


def hybrid_factors(
    H: jnp.ndarray, F: jnp.ndarray, visible: jnp.ndarray
) -> jnp.ndarray:
    """Two-segment PWLS stacking factors (ref Observability.cc:236-245 hybrid
    mode): rows [H·Sel ; H·Sel·F13] over the 13-dim state, (N, 4, 13), with
    Sel embedding the 7 pose columns into 13 dims. block_i = factorᵀ·factor;
    the low-rank greedy (gf/selection.py) consumes factors directly."""
    N = H.shape[0]
    H13d = jnp.zeros((N, 2, 13), H.dtype).at[:, :, 0:7].set(H)
    HF = jnp.einsum("nri,ij->nrj", H13d, F)
    stacked = jnp.concatenate([H13d, HF], axis=1)  # (N, 4, 13)
    return jnp.where(visible[:, None, None], stacked, 0.0)


def hybrid_matrices(
    H: jnp.ndarray, F: jnp.ndarray, visible: jnp.ndarray
) -> jnp.ndarray:
    """13×13 info block per landmark from the hybrid stacking (see
    hybrid_factors)."""
    stacked = hybrid_factors(H, F, visible)
    return jnp.einsum("nri,nrj->nij", stacked, stacked)
