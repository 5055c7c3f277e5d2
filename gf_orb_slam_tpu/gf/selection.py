"""Max-logDet submodular landmark selection: greedy and lazier-greedy.

Reference: Observability::maxVolSelection_LazierGreedy (src/Observability.cc:
2815-3030), maxVolSelection_Greedy (cc:1900-2008) and the deletion variant
(cc:2339). Semantics preserved: K greedy rounds; each round evaluates
logdet(M_cur + block_i) over a candidate set (everything for exact greedy, a
random subset of ≈ (N/K)·sampleScale unselected candidates for lazier greedy,
matching the subset-size formula at cc:2853) and commits the argmax.

TPU design: the per-round candidate evaluation — the reference's inner loop of
sequential 7×7 Armadillo logdets, optionally fanned out over threads — becomes
one batched Cholesky logdet over the whole candidate tensor; the K rounds are
a lax.scan. Selection state is a boolean mask, not vector surgery. The
reference's wall-clock caps become the static (K, subset-size) compute budget
— deterministic and reproducible.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gf_orb_slam_tpu.geometry import linalg

PRIOR_EPS = 1e-5  # ref: curMat = eye * 0.00001 (Observability.cc:2861)


def normalize_blocks(blocks: jnp.ndarray, valid: jnp.ndarray):
    """Scale info blocks so their mean diagonal is O(1), returning (blocks/s, s).

    Raw H^T Σ⁻¹ H entries are ~1e4..1e6 (pixel Jacobians), while the greedy
    prior is 1e-5·I — a ~1e11 condition number that float32 Cholesky cannot
    factor, so every early-round logdet came back as the non-PD sentinel and
    the first few greedy picks were arbitrary. (The reference runs the same
    numbers through double-precision Armadillo, Util.hpp:714-731, which is how
    it tolerates the absolute 1e-5 prior.) Uniform scaling shifts every logdet
    by D·log s and leaves gains and the greedy ordering exactly invariant."""
    D = blocks.shape[-1]
    tr = jnp.trace(blocks, axis1=-2, axis2=-1)
    s = jnp.sum(jnp.where(valid, tr, 0.0)) / (
        jnp.maximum(jnp.sum(valid.astype(blocks.dtype)), 1.0) * D
    )
    s = jnp.maximum(s, 1e-20)
    return blocks / s, s


def _denorm_logdet(cur: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    D = cur.shape[-1]
    return linalg.logdet_psd(cur) + D * jnp.log(s)


class SelectionResult(NamedTuple):
    selected: jnp.ndarray   # (N,) bool
    info_total: jnp.ndarray  # (D, D) accumulated information matrix
    logdet: jnp.ndarray     # () final logdet
    n_selected: jnp.ndarray  # () int32


def normalize_factors(factors: jnp.ndarray, valid: jnp.ndarray):
    """Factor-space analogue of normalize_blocks: block_i = F_iᵀF_i, so
    trace(block_i) = ‖F_i‖²_F and dividing factors by √s scales blocks by 1/s."""
    D = factors.shape[-1]
    tr = jnp.sum(factors * factors, axis=(-2, -1))
    s = jnp.sum(jnp.where(valid, tr, 0.0)) / (
        jnp.maximum(jnp.sum(valid.astype(factors.dtype)), 1.0) * D
    )
    s = jnp.maximum(s, 1e-20)
    return factors / jnp.sqrt(s), s


def _logdet_eye_plus(G: jnp.ndarray) -> jnp.ndarray:
    """logdet(I_r + G) for small PSD G (..., r, r): closed form for the rank-2
    measurement blocks and the rank-4 hybrid blocks (2×2 block-Schur
    reduction), batched Cholesky otherwise. No per-candidate D×D factorization
    anywhere — this is the whole point of the determinant-lemma greedy."""
    r = G.shape[-1]
    M = G + jnp.eye(r, dtype=G.dtype)
    tiny = jnp.asarray(1e-30, G.dtype)
    if r == 1:
        return jnp.log(jnp.maximum(M[..., 0, 0], tiny))

    def det2(A):
        return A[..., 0, 0] * A[..., 1, 1] - A[..., 0, 1] * A[..., 1, 0]

    if r == 2:
        return jnp.log(jnp.maximum(det2(M), tiny))
    if r == 4:
        # det([[A,B],[Bᵀ,C]]) = det(A)·det(C − BᵀA⁻¹B); A is PD (I + PSD).
        A = M[..., 0:2, 0:2]
        B = M[..., 0:2, 2:4]
        C = M[..., 2:4, 2:4]
        dA = jnp.maximum(det2(A), tiny)
        Ainv = (
            jnp.stack(
                [
                    jnp.stack([A[..., 1, 1], -A[..., 0, 1]], axis=-1),
                    jnp.stack([-A[..., 1, 0], A[..., 0, 0]], axis=-1),
                ],
                axis=-2,
            )
            / dA[..., None, None]
        )
        S = C - jnp.swapaxes(B, -1, -2) @ Ainv @ B
        return jnp.log(dA) + jnp.log(jnp.maximum(det2(S), tiny))
    return linalg.logdet_psd(M)


@partial(jax.jit, static_argnames=("k", "batch"))
def greedy_maxlogdet_lowrank(
    factors: jnp.ndarray,
    valid: jnp.ndarray,
    k: int,
    batch: int = 1,
    info_prior: jnp.ndarray | None = None,
) -> SelectionResult:
    """Exact greedy Max-logDet via the matrix determinant lemma over explicit
    low-rank factors: block_i = F_iᵀF_i with F_i the (r, D) whitened Jacobian
    (r=2 for 7-dim info blocks, r=4 for the 13×13 hybrid stacking).

    Per round, EVERY candidate's marginal gain
        logdet(cur + F_iᵀF_i) − logdet(cur) = logdet(I_r + F_i cur⁻¹ F_iᵀ)
    is computed from ONE D×D Cholesky of the accumulated matrix plus a batched
    triangular solve and an (N, r, r) einsum — no per-candidate D×D Cholesky,
    which is what made the blockwise lazier-greedy scan cost ~80 µs/round
    (SURVEY §7 hard-part (b): "the logDet trick decides kernel efficiency").
    Evaluating the full candidate set each round is now cheap enough that this
    is EXACT greedy (the quality ground-truth the reference's lazier variant
    approximates, test_Greedy.cpp) at better-than-lazier speed.

    batch > 1 commits the top-`batch` gains per round (k/batch rounds).
    info_prior (D, D) seeds the accumulated matrix with the initial-tracking
    matches' information (ref FRAME_MATCHING_INFO_PRIOR, Tracking.h:91,
    Observability.cc:556-644) so selection targets directions the current
    match set leaves weak; it is scaled into the normalized block space.
    """
    N, r, D = factors.shape
    factors, s = normalize_factors(factors, valid)
    cur0 = PRIOR_EPS * jnp.eye(D, dtype=factors.dtype)
    if info_prior is not None:
        cur0 = cur0 + info_prior / s
    B = max(1, min(batch, k))
    rounds = -(-k // B)
    sel0 = jnp.zeros(N, bool)
    Ft = factors.reshape(N * r, D).T  # (D, N·r) shared RHS

    def round_fn(carry, _):
        cur, selected, n_sel = carry
        L = jnp.linalg.cholesky(cur)
        Y = jax.scipy.linalg.solve_triangular(L, Ft, lower=True)  # (D, N·r)
        Yn = Y.reshape(D, N, r)
        G = jnp.einsum("dnr,dns->nrs", Yn, Yn)
        gains = _logdet_eye_plus(G)
        gains = jnp.where(valid & ~selected, gains, -jnp.inf)
        # argmax / approx top-B, not exact top_k: a full 4096-element sort
        # inside every scan round is the single most expensive op here, and
        # gains are non-negative with -inf masking, so the 95%-recall partial
        # reduction only ever swaps near-tied picks (quality bounded by the
        # same regression tests as the batch knob itself).
        if B == 1:
            picks = jnp.argmax(gains)[None].astype(jnp.int32)
            top_g = gains[picks]
        else:
            top_g, picks = jax.lax.approx_max_k(gains, B)
            picks = picks.astype(jnp.int32)
        take = jnp.isfinite(top_g) & (
            n_sel + jnp.arange(B, dtype=jnp.int32) < k
        )
        Fp = jnp.where(take[:, None, None], factors[picks], 0.0)
        cur = cur + jnp.einsum("bri,brj->ij", Fp, Fp)
        selected = selected.at[jnp.where(take, picks, N)].set(True, mode="drop")
        n_sel = n_sel + jnp.sum(take.astype(jnp.int32))
        return (cur, selected, n_sel), None

    (cur, selected, _), _ = jax.lax.scan(
        round_fn, (cur0, sel0, jnp.int32(0)), None, length=rounds
    )
    return SelectionResult(
        selected=selected,
        info_total=cur * s,
        logdet=_denorm_logdet(cur, s),
        n_selected=jnp.sum(selected.astype(jnp.int32)),
    )


def _greedy_round(blocks, valid, cur, selected, cand_mask):
    """One greedy round over an explicit candidate mask. Returns the argmax
    candidate index and its updated matrix."""
    cand = cand_mask & valid & ~selected
    lds = linalg.logdet_psd(cur[None, :, :] + blocks)
    lds = jnp.where(cand, lds, -jnp.inf)
    best = jnp.argmax(lds)
    found = jnp.isfinite(lds[best])
    cur_new = jnp.where(found, cur + blocks[best], cur)
    selected_new = selected.at[best].set(found | selected[best])
    return best, found, cur_new, selected_new


@partial(jax.jit, static_argnames=("k",))
def greedy_maxlogdet(
    blocks: jnp.ndarray, valid: jnp.ndarray, k: int
) -> SelectionResult:
    """Exact greedy: every round scans all candidates (the reference's
    baseline greedy_mtd=1, used as ground truth in test_Greedy.cpp)."""
    N, D, _ = blocks.shape
    blocks, s = normalize_blocks(blocks, valid)
    cur0 = PRIOR_EPS * jnp.eye(D, dtype=blocks.dtype)
    sel0 = jnp.zeros(N, bool)
    all_mask = jnp.ones(N, bool)

    def round_fn(carry, _):
        cur, selected = carry
        _, _, cur, selected = _greedy_round(blocks, valid, cur, selected, all_mask)
        return (cur, selected), None

    (cur, selected), _ = jax.lax.scan(round_fn, (cur0, sel0), None, length=k)
    return SelectionResult(
        selected=selected,
        info_total=cur * s,
        logdet=_denorm_logdet(cur, s),
        n_selected=jnp.sum(selected.astype(jnp.int32)),
    )


@partial(jax.jit, static_argnames=("k", "sample_scale", "batch"))
def lazier_greedy_maxlogdet(
    blocks: jnp.ndarray,
    valid: jnp.ndarray,
    k: int,
    key: jnp.ndarray,
    sample_scale: float = 2.3,
    batch: int = 1,
) -> SelectionResult:
    """Lazier-than-lazy greedy (Mirzasoleiman et al.): per round, evaluate a
    random subset of ≈ (N/K)·sample_scale unselected candidates.

    sample_scale defaults to ln(1/ε) with the reference's ε≈0.1
    (Observability.cc:2853 szLazierSubset formula).

    batch > 1 commits the top-`batch` candidates by marginal gain each round
    (k/batch rounds total). The scan's sequential latency — not the per-round
    math — dominates on TPU (~80 µs/round through the pipeline), so batching
    rounds is the lever; the quality cost of ignoring within-batch info
    overlap is bounded and regression-tested against exact greedy.
    """
    N, D, _ = blocks.shape
    blocks, s = normalize_blocks(blocks, valid)
    B = max(1, min(batch, k))
    rounds = -(-k // B)
    S = max(min(int(round(N / max(k, 1) * sample_scale * B)), N), B)
    cur0 = PRIOR_EPS * jnp.eye(D, dtype=blocks.dtype)
    sel0 = jnp.zeros(N, bool)
    keys = jax.random.split(key, rounds)

    def round_fn(carry, rkey):
        cur, selected, n_sel = carry
        # Random-S subset of unselected valid candidates via Gumbel top-S.
        # approx_max_k, not top_k: the subset is random by construction, so
        # the exact-top-k full sort over N buys nothing (the 95%-recall
        # partial reduction is just a different random subset).
        g = jax.random.gumbel(rkey, (N,))
        g = jnp.where(valid & ~selected, g, -jnp.inf)
        sub_idx = jax.lax.approx_max_k(g, S)[1].astype(jnp.int32)  # (S,)
        sub_ok = jnp.isfinite(g[sub_idx])
        lds = linalg.logdet_psd(cur[None, :, :] + blocks[sub_idx])
        lds = jnp.where(sub_ok, lds, -jnp.inf)
        top_lds, jj = jax.lax.top_k(lds, B)                   # (B,)
        picks = sub_idx[jj]
        # Gain-ranked picks; stop exactly at k even when B ∤ k.
        take = jnp.isfinite(top_lds) & (
            n_sel + jnp.arange(B, dtype=jnp.int32) < k
        )
        cur = cur + jnp.sum(
            jnp.where(take[:, None, None], blocks[picks], 0.0), axis=0
        )
        selected = selected.at[jnp.where(take, picks, N)].set(True, mode="drop")
        n_sel = n_sel + jnp.sum(take.astype(jnp.int32))
        return (cur, selected, n_sel), None

    (cur, selected, _), _ = jax.lax.scan(
        round_fn, (cur0, sel0, jnp.int32(0)), keys
    )
    return SelectionResult(
        selected=selected,
        info_total=cur * s,
        logdet=_denorm_logdet(cur, s),
        n_selected=jnp.sum(selected.astype(jnp.int32)),
    )


@partial(jax.jit, static_argnames=("k_max", "sample_scale"))
def auto_maxlogdet(
    blocks: jnp.ndarray,
    valid: jnp.ndarray,
    k_max: int,
    key: jnp.ndarray,
    min_gain: float | jnp.ndarray = 0.05,
    sample_scale: float = 2.3,
) -> SelectionResult:
    """Automatic selection-size variant (ref maxVolAutomatic_LazierGreedy,
    Observability.cc:3141-3238): greedy rounds run as in lazier greedy, but
    selection STOPS once the best candidate's marginal logdet gain falls below
    `min_gain` — the budget k is discovered, not imposed. `n_selected` reports
    the automatic budget; `k_max` only bounds the compiled round count.

    TPU form: a lax.scan over k_max rounds with a sticky `stopped` flag
    (submodularity makes gains non-increasing in expectation, so the first
    sub-threshold round is the right stopping point); rounds after the stop
    are masked no-ops rather than an early exit, keeping the program static.
    """
    N, D, _ = blocks.shape
    blocks, s = normalize_blocks(blocks, valid)
    # The true budget is unknown here (that's the point), so the lazier
    # subset-size formula over k_max can collapse to a couple of candidates
    # per round when k_max is generous; floor it so early rounds — the ones
    # that matter most when the gain floor stops selection quickly — still
    # see a meaningful sample.
    S = max(min(int(round(N / max(k_max, 1) * sample_scale)), N), min(16, N))
    cur0 = PRIOR_EPS * jnp.eye(D, dtype=blocks.dtype)
    sel0 = jnp.zeros(N, bool)
    keys = jax.random.split(key, k_max)
    # Gains are scale-invariant (logdet differences), so min_gain needs no
    # rescaling under the block normalization.
    min_gain = jnp.asarray(min_gain, blocks.dtype)

    def round_fn(carry, rkey):
        cur, selected, stopped = carry
        g = jax.random.gumbel(rkey, (N,))
        g = jnp.where(valid & ~selected, g, -jnp.inf)
        sub_idx = jax.lax.approx_max_k(g, S)[1].astype(jnp.int32)  # see above
        sub_ok = jnp.isfinite(g[sub_idx])
        lds = linalg.logdet_psd(cur[None, :, :] + blocks[sub_idx])
        lds = jnp.where(sub_ok, lds, -jnp.inf)
        j = jnp.argmax(lds)
        best = sub_idx[j]
        gain = lds[j] - linalg.logdet_psd(cur)
        take = jnp.isfinite(lds[j]) & (gain >= min_gain) & ~stopped
        stopped = stopped | ~take
        cur = jnp.where(take, cur + blocks[best], cur)
        selected = selected.at[best].set(take | selected[best])
        return (cur, selected, stopped), None

    (cur, selected, _), _ = jax.lax.scan(
        round_fn, (cur0, sel0, jnp.asarray(False)), keys
    )
    return SelectionResult(
        selected=selected,
        info_total=cur * s,
        logdet=_denorm_logdet(cur, s),
        n_selected=jnp.sum(selected.astype(jnp.int32)),
    )


@partial(jax.jit, static_argnames=("k_remove",))
def maxvol_deletion(
    blocks: jnp.ndarray, valid: jnp.ndarray, k_remove: int
) -> SelectionResult:
    """Reverse greedy (ref maxVolDeletion_LazierGreedy, cc:2339): start from
    the full set's info sum and repeatedly delete the landmark whose removal
    costs the least logdet. Returns the SURVIVING set as `selected`."""
    N, D, _ = blocks.shape
    blocks, s = normalize_blocks(blocks, valid)
    total = PRIOR_EPS * jnp.eye(D, dtype=blocks.dtype) + jnp.sum(
        jnp.where(valid[:, None, None], blocks, 0.0), axis=0
    )
    alive0 = valid

    def round_fn(carry, _):
        cur, alive = carry
        lds = linalg.logdet_psd(cur[None, :, :] - blocks)
        lds = jnp.where(alive, lds, -jnp.inf)
        worst = jnp.argmax(lds)  # removal with the LARGEST remaining logdet
        ok = jnp.isfinite(lds[worst])
        cur = jnp.where(ok, cur - blocks[worst], cur)
        alive = alive.at[worst].set(jnp.where(ok, False, alive[worst]))
        return (cur, alive), None

    (cur, alive), _ = jax.lax.scan(round_fn, (total, alive0), None, length=k_remove)
    return SelectionResult(
        selected=alive,
        info_total=cur * s,
        logdet=_denorm_logdet(cur, s),
        n_selected=jnp.sum(alive.astype(jnp.int32)),
    )


@partial(jax.jit, static_argnames=("k", "n_shards", "sample_scale"))
def grouped_lazier_greedy(
    blocks: jnp.ndarray,
    valid: jnp.ndarray,
    k: int,
    key: jnp.ndarray,
    n_shards: int = 4,
    sample_scale: float = 2.3,
) -> SelectionResult:
    """Grouped/parallel lazier greedy with a merge round (ref the multi-thread
    subset selection Observability.cc:1089-1163): shard the landmark pool,
    run lazier greedy per shard for k/n_shards picks each (vmapped — the
    reference's thread fan-out is literally a batch dimension here), then a
    final exact-greedy merge over the union down to k."""
    N, D, _ = blocks.shape
    pad = (-N) % n_shards
    Np = N + pad
    blocks_p = jnp.pad(blocks, ((0, pad), (0, 0), (0, 0)))
    valid_p = jnp.pad(valid, (0, pad))
    shard_blocks = blocks_p.reshape(n_shards, Np // n_shards, D, D)
    shard_valid = valid_p.reshape(n_shards, Np // n_shards)
    k_shard = -(-k // n_shards)
    keys = jax.random.split(key, n_shards)

    shard_res = jax.vmap(
        lambda b, v, kk: lazier_greedy_maxlogdet(b, v, k_shard, kk, sample_scale)
    )(shard_blocks, shard_valid, keys)
    union = shard_res.selected.reshape(Np)[:N]

    # Merge: exact greedy restricted to the union, down to k picks.
    res = greedy_maxlogdet(jnp.where(union[:, None, None], blocks, 0.0), union, k)
    return res
