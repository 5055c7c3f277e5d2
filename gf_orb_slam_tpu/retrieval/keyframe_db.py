"""Keyframe database: BoW-scored retrieval for loop closing & relocalization.

Replaces src/KeyFrameDatabase.cc (310 LoC): the inverted file
(word → list<KeyFrame*>) plus shared-word counting and covisibility-group
score aggregation become dense ops over a (K, n_words) BoW matrix — a single
matvec scores every keyframe at once, and group aggregation uses the
covisibility matrix already derived from MapState.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gf_orb_slam_tpu.retrieval import vocabulary as vocab_mod


class BowDatabase(NamedTuple):
    """Per-keyframe dense BoW state, capacity-aligned with MapState keyframes."""

    bow: jnp.ndarray        # (K, n_words) L1-normalized tf-idf vectors
    words: jnp.ndarray      # (K, N) leaf word id per keypoint (−1 invalid)
    mid_nodes: jnp.ndarray  # (K, N) mid-level node id per keypoint
    valid: jnp.ndarray      # (K,) registered keyframes


def empty_db(max_keyframes: int, max_kps: int, n_words: int) -> BowDatabase:
    return BowDatabase(
        bow=jnp.zeros((max_keyframes, n_words), jnp.float32),
        words=jnp.full((max_keyframes, max_kps), -1, jnp.int32),
        mid_nodes=jnp.full((max_keyframes, max_kps), -1, jnp.int32),
        valid=jnp.zeros(max_keyframes, bool),
    )


def add_keyframe(
    db: BowDatabase, voc: vocab_mod.Vocabulary, kf_id, desc, kp_valid
) -> BowDatabase:
    """Register a keyframe: quantize descriptors + store its BoW vector
    (ref KeyFrameDatabase::add + KeyFrame::ComputeBoW)."""
    words, mid = vocab_mod.quantize(voc, desc, kp_valid)
    v = vocab_mod.bow_vector(voc, words)
    return BowDatabase(
        bow=db.bow.at[kf_id].set(v),
        words=db.words.at[kf_id].set(words),
        mid_nodes=db.mid_nodes.at[kf_id].set(mid),
        valid=db.valid.at[kf_id].set(True),
    )


def erase_keyframe(db: BowDatabase, kf_id) -> BowDatabase:
    return db._replace(valid=db.valid.at[kf_id].set(False))


def permute(db: BowDatabase, perm: jnp.ndarray) -> BowDatabase:
    """Apply a keyframe renumbering (from map_state.compact_keyframes) so the
    database rows stay aligned with the map's keyframe slots."""
    return BowDatabase(
        bow=db.bow[perm],
        words=db.words[perm],
        mid_nodes=db.mid_nodes[perm],
        valid=db.valid[perm],
    )


@jax.jit
def query_scores(db: BowDatabase, v: jnp.ndarray) -> jnp.ndarray:
    """(n_words,) query vs all keyframes → (K,) L1 scores; invalid → −1."""
    s = vocab_mod.l1_score(v[None, :], db.bow)
    return jnp.where(db.valid, s, -1.0)


@partial(jax.jit, static_argnames=("max_candidates",))
def detect_loop_candidates(
    db: BowDatabase,
    covis: jnp.ndarray,        # (K, K) covisibility weights from MapState
    query_kf: jnp.ndarray,     # () int32
    max_candidates: int = 8,
    exclude_kf: jnp.ndarray | int = -1,  # e.g. a keyframe culled this round
                                         # whose BoW row is not yet tombstoned
):
    """ref KeyFrameDatabase::DetectLoopCandidates (cc:75-196):
    - minScore = worst BoW score between the query and its covisible KFs;
    - candidates: non-connected keyframes scoring ≥ minScore;
    - group scoring: each candidate's score is accumulated over its own top
      covisible neighbors; accept ≥ 0.75 × best group score.
    Returns (cand_ids (max_candidates,), cand_ok (max_candidates,)).
    """
    K = db.bow.shape[0]
    v = db.bow[query_kf]
    scores = vocab_mod.l1_score(v[None, :], db.bow)          # (K,)
    # The reference excludes only covisibility-GRAPH neighbors (edges require
    # ≥15 shared points, KeyFrame.cc:372-383); a stray shared point or two
    # must not disqualify a genuine loop candidate.
    connected = covis[query_kf] >= 15
    is_self = jnp.arange(K) == query_kf

    # minScore over covisible neighbors (ref: loop candidates must beat the
    # worst covisible similarity).
    covis_scores = jnp.where(connected & db.valid, scores, jnp.inf)
    has_covis = jnp.isfinite(covis_scores).any()
    min_score = jnp.where(has_covis, jnp.min(covis_scores), 0.1)
    min_score = jnp.maximum(min_score, 0.0)

    eligible = (
        db.valid & ~connected & ~is_self & (scores >= min_score)
        & (jnp.arange(K) != exclude_kf)
    )

    # Group score: candidate + its top-10 covisible neighbors' scores summed
    # over eligible-or-not neighbors that share enough covisibility.
    neigh = covis > 15  # (K, K) boolean adjacency
    grp = scores[None, :] * (neigh & db.valid[None, :] & eligible[None, :])
    group_score = scores + jnp.sum(
        jnp.where(grp > 0, grp, 0.0), axis=1
    )
    group_score = jnp.where(eligible, group_score, -1.0)

    best = jnp.max(group_score)
    keep = eligible & (group_score >= 0.75 * best) & (best > 0)
    ranked = jnp.where(keep, group_score, -1.0)
    top_vals, top_ids = jax.lax.top_k(ranked, max_candidates)
    return top_ids.astype(jnp.int32), top_vals > 0


@partial(jax.jit, static_argnames=("max_candidates",))
def detect_reloc_candidates(
    db: BowDatabase,
    covis: jnp.ndarray,
    v_query: jnp.ndarray,      # (n_words,) BoW of the lost frame
    max_candidates: int = 8,
):
    """ref DetectRelocalisationCandidates (cc:198-310): same group-scoring
    scheme without the covisibility exclusion (the query is not in the map)."""
    K = db.bow.shape[0]
    scores = jnp.where(db.valid, vocab_mod.l1_score(v_query[None, :], db.bow), -1.0)
    neigh = covis > 15
    grp = scores[None, :] * (neigh & db.valid[None, :] & (scores > 0)[None, :])
    group_score = scores + jnp.sum(jnp.where(grp > 0, grp, 0.0), axis=1)
    group_score = jnp.where(db.valid & (scores > 0), group_score, -1.0)
    best = jnp.max(group_score)
    keep = (group_score >= 0.75 * best) & (best > 0)
    ranked = jnp.where(keep, group_score, -1.0)
    top_vals, top_ids = jax.lax.top_k(ranked, max_candidates)
    return top_ids.astype(jnp.int32), top_vals > 0


def bow_match_mask(
    words_q: jnp.ndarray, words_t: jnp.ndarray,
    valid_q: jnp.ndarray, valid_t: jnp.ndarray,
) -> jnp.ndarray:
    """BoW-accelerated matching gate (ref ORBmatcher::SearchByBoW, cc:724):
    only descriptor pairs quantized to the same vocabulary node are candidates
    — the FeatureVector node-grouping as a dense equality mask."""
    return (
        (words_q[:, None] == words_t[None, :])
        & (words_q >= 0)[:, None]
        & (words_t >= 0)[None, :]
        & valid_q[:, None]
        & valid_t[None, :]
    )
