"""Map checkpoint/resume — array-native snapshotting.

The reference has no map persistence at all ('map is in-memory only',
SURVEY §5); with struct-of-arrays state it is one savez call. Snapshots
include the map, the BoW database, and the vocabulary so a session can be
resumed or a map re-used for localization-only runs.
"""

from __future__ import annotations

import numpy as np

from gf_orb_slam_tpu.mapping import map_state as ms
from gf_orb_slam_tpu.retrieval import keyframe_db as kdb
from gf_orb_slam_tpu.retrieval import vocabulary as voc_mod


def save_map(path: str, m: ms.MapState, voc=None, db=None) -> None:
    arrays = {f"map_{k}": np.asarray(v) for k, v in m._asdict().items()}
    if voc is not None:
        arrays["voc_centers"] = np.asarray(voc.centers)
        arrays["voc_weights"] = np.asarray(voc.weights)
        arrays["voc_kL"] = np.asarray([voc.k, voc.L])
        if voc.children is not None:
            arrays["voc_children"] = np.asarray(voc.children)
            arrays["voc_word_of_node"] = np.asarray(voc.word_of_node)
    if db is not None:
        arrays.update({f"db_{k}": np.asarray(v) for k, v in db._asdict().items()})
    np.savez_compressed(path, **arrays)


def load_map(path: str):
    """Returns (MapState, Vocabulary | None, BowDatabase | None)."""
    import jax.numpy as jnp

    z = np.load(path)
    m = ms.MapState(**{
        k[len("map_"):]: jnp.asarray(z[k]) for k in z.files if k.startswith("map_")
    })
    voc = None
    if "voc_centers" in z.files:
        k, L = (int(x) for x in z["voc_kL"])
        voc = voc_mod.Vocabulary(
            centers=jnp.asarray(z["voc_centers"]),
            weights=jnp.asarray(z["voc_weights"]),
            k=k, L=L,
            children=(
                jnp.asarray(z["voc_children"])
                if "voc_children" in z.files else None
            ),
            word_of_node=(
                jnp.asarray(z["voc_word_of_node"])
                if "voc_word_of_node" in z.files else None
            ),
        )
    db = None
    if "db_bow_ids" in z.files:
        db = kdb.BowDatabase(**{
            k[len("db_"):]: jnp.asarray(z[k]) for k in z.files if k.startswith("db_")
        })
    elif "db_bow" in z.files:
        # Legacy snapshot (pre round-4 sparse rewrite): a dense (K, n_words)
        # 'bow' matrix alongside words/mid_nodes/valid. Rebuild the sparse
        # per-keyframe (word id, tf-idf) rows from it instead of silently
        # dropping loop-closing/relocalization state on resume.
        bow = np.asarray(z["db_bow"])                     # (K, n_words)
        words = np.asarray(z["db_words"])                 # (K, N)
        K, N = words.shape
        n_words = bow.shape[1]
        ids = np.full((K, N), n_words, np.int32)
        vals = np.zeros((K, N), np.float32)
        for k in range(K):
            w = words[k]
            uniq, first = np.unique(w[w >= 0], return_index=True)
            pos = np.flatnonzero(w >= 0)[first]
            ids[k, pos] = uniq
            vals[k, pos] = bow[k, uniq]
        db = kdb.BowDatabase(
            bow_ids=jnp.asarray(ids), bow_vals=jnp.asarray(vals),
            words=jnp.asarray(words), mid_nodes=jnp.asarray(z["db_mid_nodes"]),
            valid=jnp.asarray(z["db_valid"]),
        )
    return m, voc, db
