"""Binary bag-of-words vocabulary tree, TPU-resident.

Replaces DBoW2's TemplatedVocabulary<FORB> (Thirdparty/DBoW2/DBoW2/
TemplatedVocabulary.h, 1754 LoC of pointer-tree descent): the k-ary tree is an
implicit complete array of packed binary centers; quantization of all N
descriptors of a frame is L levels of batched XOR+popcount argmin; BoW
"vectors" are dense (n_words,) tf-idf arrays so frame-to-frame similarity and
database queries become plain matvecs on the MXU — no inverted file needed at
map scale (the dense score IS the inverted file's result, computed faster).

Vocabulary training: hierarchical k-medians with majority-vote bit medians
(the binary-descriptor analogue of k-means used by DBoW2's training), run
host-side in numpy once and cached.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

N_WORDS_DTYPE = jnp.float32


class Vocabulary(NamedTuple):
    centers: jnp.ndarray   # (n_nodes, 8) uint32 — implicit k-ary tree, root at 0
    weights: jnp.ndarray   # (n_words,) float32 idf weights
    k: int                 # branching factor
    L: int                 # depth (levels below root)

    @property
    def n_words(self) -> int:
        return self.k**self.L

    def first_leaf(self) -> int:
        # nodes above leaf level: 1 + k + ... + k^(L-1) = (k^L - 1)/(k - 1)
        return (self.k**self.L - 1) // (self.k - 1)


def _unpack_bits(descs: np.ndarray) -> np.ndarray:
    """(N, 8) uint32 → (N, 256) uint8 bits."""
    b = descs.view(np.uint8).reshape(len(descs), 32)
    return np.unpackbits(b, axis=1, bitorder="little")


def _pack_bits(bits: np.ndarray) -> np.ndarray:
    """(N, 256) → (N, 8) uint32."""
    by = np.packbits(bits.astype(np.uint8), axis=1, bitorder="little")
    return by.reshape(len(bits), 32).view(np.uint32).reshape(len(bits), 8)


def _kmedians_binary(descs: np.ndarray, k: int, rng, iters: int = 8):
    """Binary k-medians: majority-bit centers; returns (centers (k,8), assign)."""
    n = len(descs)
    if n <= k:
        centers = np.zeros((k, 8), np.uint32)
        centers[:n] = descs
        return centers, np.arange(n) % k
    idx = rng.choice(n, k, replace=False)
    centers = descs[idx].copy()
    bits = _unpack_bits(descs)
    for _ in range(iters):
        # Hamming distances to centers.
        x = descs[:, None, :] ^ centers[None, :, :]
        d = np.unpackbits(x.view(np.uint8).reshape(n, k, 32), axis=2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(k):
            sel = bits[assign == c]
            if len(sel) == 0:
                centers[c] = descs[rng.integers(n)]
            else:
                centers[c] = _pack_bits((sel.mean(axis=0) > 0.5)[None, :])[0]
    return centers, assign


def train_vocabulary(
    descs: np.ndarray, k: int = 10, L: int = 3, seed: int = 0
) -> Vocabulary:
    """Hierarchical binary k-medians (ref DBoW2 create()); descs (M, 8) uint32."""
    rng = np.random.default_rng(seed)
    n_nodes = (k ** (L + 1) - 1) // (k - 1)
    centers = np.zeros((n_nodes, 8), np.uint32)

    # Recursive split, breadth-first; node 0 is the root (center unused).
    groups = {0: np.arange(len(descs))}
    for level in range(L):
        new_groups = {}
        for node, idxs in groups.items():
            child0 = node * k + 1
            if len(idxs) == 0:
                for c in range(k):
                    new_groups[child0 + c] = idxs
                continue
            c_centers, assign = _kmedians_binary(descs[idxs], k, rng)
            for c in range(k):
                centers[child0 + c] = c_centers[c]
                new_groups[child0 + c] = idxs[assign == c]
        groups = new_groups

    # idf weights from the training corpus (ref TemplatedVocabulary::setWeights).
    n_words = k**L
    first_leaf = (k**L - 1) // (k - 1)
    counts = np.zeros(n_words)
    for node, idxs in groups.items():
        counts[node - first_leaf] = len(idxs)
    n_docs = max(len(descs), 1)
    idf = np.log(n_docs / np.maximum(counts, 1.0))
    return Vocabulary(
        centers=jnp.asarray(centers),
        weights=jnp.asarray(idf, jnp.float32),
        k=k,
        L=L,
    )


def random_vocabulary(k: int = 10, L: int = 3, seed: int = 0) -> Vocabulary:
    """Random-center vocabulary (uniform bits) — adequate for quantization
    consistency when no training corpus is available."""
    rng = np.random.default_rng(seed)
    n_nodes = (k ** (L + 1) - 1) // (k - 1)
    centers = rng.integers(0, 2**32, (n_nodes, 8), dtype=np.uint32)
    return Vocabulary(
        centers=jnp.asarray(centers),
        weights=jnp.ones(k**L, jnp.float32),
        k=k,
        L=L,
    )


@partial(jax.jit, static_argnames=("k", "L"))
def _quantize(centers, descs, k: int, L: int):
    """Tree descent for all descriptors at once → (N,) leaf word ids and
    (N,) mid-level node ids (for BoW-gated matching, ref FeatureVector)."""
    N = descs.shape[0]
    node = jnp.zeros((N,), jnp.int32)
    mid = jnp.zeros((N,), jnp.int32)
    mid_level = max(L // 2, 1)
    for level in range(L):
        child0 = node * k + 1                      # (N,)
        cand = child0[:, None] + jnp.arange(k)[None, :]   # (N, k)
        cc = centers[cand]                         # (N, k, 8)
        x = jnp.bitwise_xor(descs[:, None, :], cc)
        d = jnp.sum(jax.lax.population_count(x), axis=-1)  # (N, k)
        node = cand[jnp.arange(N), jnp.argmin(d, axis=1)]
        if level + 1 == mid_level:
            mid = node
    first_leaf = (k**L - 1) // (k - 1)
    return node - first_leaf, mid


def quantize(voc: Vocabulary, descs: jnp.ndarray, valid: jnp.ndarray):
    """(N, 8) descriptors → (word_ids (N,), mid_node (N,)); invalid slots −1."""
    words, mid = _quantize(voc.centers, descs, voc.k, voc.L)
    return (
        jnp.where(valid, words, -1),
        jnp.where(valid, mid, -1),
    )


def bow_vector(voc: Vocabulary, word_ids: jnp.ndarray) -> jnp.ndarray:
    """Dense L1-normalized tf-idf vector (n_words,) (ref BowVector)."""
    W = voc.n_words
    counts = jnp.zeros((W,), N_WORDS_DTYPE).at[
        jnp.where(word_ids >= 0, word_ids, W)
    ].add(1.0, mode="drop")
    v = counts * voc.weights
    n = jnp.sum(jnp.abs(v))
    return v / jnp.maximum(n, 1e-9)


def l1_score(v1: jnp.ndarray, v2: jnp.ndarray) -> jnp.ndarray:
    """DBoW2 L1 similarity: 1 − ½|v1 − v2|₁ for L1-normalized inputs
    (TemplatedVocabulary::score, L1_NORM). Batched over leading dims of v2."""
    return 1.0 - 0.5 * jnp.sum(jnp.abs(v1 - v2), axis=-1)
