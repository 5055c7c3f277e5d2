"""BoW vocabulary + keyframe database tests."""

import jax
import jax.numpy as jnp
import numpy as np

from gf_orb_slam_tpu.retrieval import keyframe_db as kdb
from gf_orb_slam_tpu.retrieval import vocabulary as voc_mod


def random_descs(rng, n):
    return rng.integers(0, 2**32, (n, 8), dtype=np.uint32)


def perturb_descs(rng, descs, n_bits=12):
    """Flip n_bits random bits per descriptor."""
    out = descs.copy()
    for i in range(len(out)):
        for _ in range(n_bits):
            w = rng.integers(0, 8)
            out[i, w] ^= np.uint32(1) << np.uint32(rng.integers(0, 32))
    return out


class TestVocabulary:
    def test_train_and_quantize_stability(self, rng):
        corpus = random_descs(rng, 3000)
        voc = voc_mod.train_vocabulary(corpus, k=8, L=2)
        assert voc.n_words == 64
        descs = jnp.asarray(corpus[:200])
        w1, mid1 = voc_mod.quantize(voc, descs, jnp.ones(200, bool))
        w = np.asarray(w1)
        assert (w >= 0).all() and (w < 64).all()
        # Slightly perturbed descriptors mostly quantize to the same word.
        pert = jnp.asarray(perturb_descs(rng, corpus[:200], n_bits=8))
        w2, _ = voc_mod.quantize(voc, pert, jnp.ones(200, bool))
        agreement = (np.asarray(w1) == np.asarray(w2)).mean()
        assert agreement > 0.6, agreement

    def test_bow_similarity_discriminates(self, rng):
        corpus = random_descs(rng, 6000)
        voc = voc_mod.train_vocabulary(corpus, k=10, L=3)  # 1000 words: discrimination needs vocabulary size
        a = corpus[:300]
        a_noisy = perturb_descs(rng, a, n_bits=10)
        b = random_descs(rng, 300)

        def bv(d):
            w, _ = voc_mod.quantize(voc, jnp.asarray(d), jnp.ones(len(d), bool))
            return voc_mod.bow_vector(voc, w)

        va, va2, vb = bv(a), bv(a_noisy), bv(b)
        s_same = float(voc_mod.l1_score(va, va2))
        s_diff = float(voc_mod.l1_score(va, vb))
        assert s_same > s_diff + 0.1, (s_same, s_diff)
        assert abs(float(voc_mod.l1_score(va, va)) - 1.0) < 1e-5

    def test_invalid_descriptors_excluded(self, rng):
        voc = voc_mod.random_vocabulary(k=8, L=2)
        descs = jnp.asarray(random_descs(rng, 50))
        valid = jnp.zeros(50, bool).at[:10].set(True)
        w, _ = voc_mod.quantize(voc, descs, valid)
        assert (np.asarray(w)[10:] == -1).all()


class TestVocabularyIO:
    """File I/O parity: DBoW2 text format + binary (ref main.cc:92-97,
    tools/bin_vocabulary.cc)."""

    def test_text_roundtrip_preserves_quantization(self, rng, tmp_path):
        corpus = random_descs(rng, 2000)
        voc = voc_mod.train_vocabulary(corpus, k=6, L=2)
        path = str(tmp_path / "voc.txt")
        voc_mod.save_dbow2_text(path, voc)
        voc2 = voc_mod.load_dbow2_text(path)
        assert voc2.k == 6 and voc2.L == 2
        assert voc2.children is not None  # loaded trees are explicit
        descs = jnp.asarray(corpus[:150])
        valid = jnp.ones(150, bool)
        w1, _ = voc_mod.quantize(voc, descs, valid)
        w2, _ = voc_mod.quantize(voc2, descs, valid)
        # word ids may be renumbered between implicit/explicit layouts, but
        # the partition must be identical
        a, b = np.asarray(w1), np.asarray(w2)
        remap = {}
        for x, y in zip(a, b):
            assert remap.setdefault(x, y) == y, "inconsistent word mapping"
        # and BoW self-similarity of the same frame must be 1 under both
        v1 = voc_mod.bow_vector(voc, w1)
        v2 = voc_mod.bow_vector(voc2, w2)
        assert abs(float(voc_mod.l1_score(v1, v1)) - 1.0) < 1e-5
        assert abs(float(voc_mod.l1_score(v2, v2)) - 1.0) < 1e-5

    def test_binary_roundtrip_exact(self, rng, tmp_path):
        corpus = random_descs(rng, 1500)
        voc = voc_mod.train_vocabulary(corpus, k=5, L=2)
        path = str(tmp_path / "voc.npz")
        voc_mod.save_binary(path, voc)
        voc2 = voc_mod.load_binary(path)
        assert (np.asarray(voc.centers) == np.asarray(voc2.centers)).all()
        assert np.allclose(np.asarray(voc.weights), np.asarray(voc2.weights))
        descs = jnp.asarray(corpus[:100])
        w1, m1 = voc_mod.quantize(voc, descs, jnp.ones(100, bool))
        w2, m2 = voc_mod.quantize(voc2, descs, jnp.ones(100, bool))
        assert (np.asarray(w1) == np.asarray(w2)).all()
        assert (np.asarray(m1) == np.asarray(m2)).all()

    def test_incomplete_tree_descent(self, tmp_path):
        # Hand-built DBoW2 text file with an incomplete tree: root has 2
        # children (k=3); child 1 is a leaf at level 1, child 2 has 2 leaf
        # children at level 2.
        lines = ["3 2 0 0"]
        z = lambda b: " ".join([str(b)] * 32)  # noqa: E731
        lines.append(f"0 1 {z(0)} 0.5")     # node1: leaf, desc=all zeros
        lines.append(f"0 0 {z(255)} 0.0")   # node2: internal, desc=all ones
        lines.append(f"2 1 {z(254)} 0.7")   # node3: leaf under node2
        lines.append(f"2 1 {z(255)} 0.9")   # node4: leaf under node2
        path = str(tmp_path / "tiny.txt")
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")
        voc = voc_mod.load_vocabulary(path)
        assert voc.n_words == 3
        d_zero = jnp.zeros((1, 8), jnp.uint32)
        d_ones = jnp.full((1, 8), 0xFFFFFFFF, jnp.uint32)
        w0, _ = voc_mod.quantize(voc, d_zero, jnp.ones(1, bool))
        w1, _ = voc_mod.quantize(voc, d_ones, jnp.ones(1, bool))
        assert int(w0[0]) == 0   # parks at the level-1 leaf (word 0)
        assert int(w1[0]) == 2   # descends to node4 (word 2)
        # per-word idf weights preserved in word order
        assert np.allclose(np.asarray(voc.weights), [0.5, 0.7, 0.9])

    def test_converter_tool(self, rng, tmp_path):
        import sys

        sys.path.insert(0, "tools")
        try:
            import bin_vocabulary
        finally:
            sys.path.pop(0)
        corpus = random_descs(rng, 800)
        voc = voc_mod.train_vocabulary(corpus, k=4, L=2)
        txt = str(tmp_path / "v.txt")
        npz = str(tmp_path / "v.npz")
        voc_mod.save_dbow2_text(txt, voc)
        assert bin_vocabulary.main([txt, npz]) == 0
        voc2 = voc_mod.load_vocabulary(npz)
        descs = jnp.asarray(corpus[:60])
        w1, _ = voc_mod.quantize(voc_mod.load_vocabulary(txt), descs, jnp.ones(60, bool))
        w2, _ = voc_mod.quantize(voc2, descs, jnp.ones(60, bool))
        assert (np.asarray(w1) == np.asarray(w2)).all()


class TestKeyframeDatabase:
    def setup_db(self, rng, n_kf=6, n_desc=150):
        corpus = random_descs(rng, 3000)
        voc = voc_mod.train_vocabulary(corpus, k=8, L=2)
        db = kdb.empty_db(max_keyframes=8, max_kps=n_desc, n_words=voc.n_words)
        descs = []
        for k in range(n_kf):
            if k == n_kf - 1:
                d = perturb_descs(rng, descs[0], n_bits=10)  # revisit of KF0
            else:
                d = random_descs(rng, n_desc)
            descs.append(d)
            db = kdb.add_keyframe(
                db, voc, jnp.asarray(k), jnp.asarray(d), jnp.ones(n_desc, bool)
            )
        return voc, db, descs

    def test_loop_candidates_find_revisit(self, rng):
        voc, db, descs = self.setup_db(rng)
        K = 8
        covis = np.zeros((K, K), np.int32)
        # chain covisibility 0-1-2-3-4-5; query 5 connected to 4 only
        for a in range(5):
            covis[a, a + 1] = covis[a + 1, a] = 50
        cand, ok = kdb.detect_loop_candidates(
            db, jnp.asarray(covis), jnp.asarray(5), max_candidates=4,
            n_words=voc.n_words,
        )
        cands = set(np.asarray(cand)[np.asarray(ok)].tolist())
        assert 0 in cands, (cands,)
        assert 4 not in cands  # connected keyframes excluded

    def test_reloc_candidates(self, rng):
        voc, db, descs = self.setup_db(rng)
        # query = noisy copy of KF2's descriptors
        q = perturb_descs(rng, descs[2], n_bits=10)
        w, _ = voc_mod.quantize(voc, jnp.asarray(q), jnp.ones(len(q), bool))
        v = voc_mod.bow_vector(voc, w)
        covis = jnp.zeros((8, 8), jnp.int32)
        cand, ok = kdb.detect_reloc_candidates(db, covis, v, max_candidates=3)
        assert 2 in set(np.asarray(cand)[np.asarray(ok)].tolist())

    def test_bow_match_mask(self, rng):
        voc = voc_mod.random_vocabulary(k=8, L=2)
        d = jnp.asarray(random_descs(rng, 40))
        w, _ = voc_mod.quantize(voc, d, jnp.ones(40, bool))
        mask = kdb.bow_match_mask(w, w, jnp.ones(40, bool), jnp.ones(40, bool))
        assert bool(jnp.all(jnp.diagonal(mask)))  # same descriptor → same word
