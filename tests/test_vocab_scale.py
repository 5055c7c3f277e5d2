"""Pretrained map-scale vocabulary: format round-trip at depth, and
retrieval recall ≥ the tiny on-the-fly vocabulary on a held-out synthetic map
(VERDICT r1 item 5; ref ships a 1M-word tree, main.cc:92-97)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gf_orb_slam_tpu.geometry import se3
from gf_orb_slam_tpu.geometry.camera import EUROC_CAM
from gf_orb_slam_tpu.io_utils import synthetic
from gf_orb_slam_tpu.mapping import frame as frame_mod
from gf_orb_slam_tpu.ops import orb
from gf_orb_slam_tpu.retrieval import keyframe_db as kdb
from gf_orb_slam_tpu.retrieval import vocabulary as voc_mod

VOCAB_PATH = voc_mod.default_vocabulary_path()
needs_vocab = pytest.mark.skipif(
    not os.path.exists(VOCAB_PATH),
    reason="packaged vocabulary not present (tools/train_vocabulary.py)",
)


@needs_vocab
class TestPackagedVocabulary:
    def test_loads_and_is_map_scale(self):
        voc = voc_mod.load_binary(VOCAB_PATH)
        assert voc.n_words >= 100_000
        assert voc.centers.shape[1] == 8

    def test_dbow2_text_roundtrip_at_depth(self, tmp_path):
        """load_dbow2_text must handle a deep (L≥5) tree: save the packaged
        vocabulary in the reference's text format, reload, and verify
        quantization agrees exactly."""
        voc = voc_mod.load_binary(VOCAB_PATH)
        rng = np.random.default_rng(0)
        descs = jnp.asarray(rng.integers(0, 2**32, (256, 8), dtype=np.uint32))
        valid = jnp.ones(256, bool)
        path = str(tmp_path / "voc.txt")
        voc_mod.save_dbow2_text(path, voc)
        voc2 = voc_mod.load_dbow2_text(path)
        assert voc2.n_words == voc.n_words
        w1, _ = voc_mod.quantize(voc, descs, valid)
        w2, _ = voc_mod.quantize(voc2, descs, valid)
        np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))

    def test_retrieval_recall_vs_tiny_vocab(self):
        """Held-out room-scene views: BoW nearest keyframe recall with the
        packaged tree must match or beat the tiny on-the-fly vocabulary at
        the same per-frame cost structure.

        Runs its body in a fresh subprocess: compiling the distorted-camera
        render/extraction programs late in a long pytest process
        intermittently segfaults the CPU XLA compiler (see the loop-closure
        e2e note)."""
        import subprocess
        import sys

        if os.environ.get("VOCAB_RECALL_INNER") != "1":
            repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            proc = subprocess.run(
                [
                    sys.executable, "-m", "pytest",
                    "tests/test_vocab_scale.py::TestPackagedVocabulary::"
                    "test_retrieval_recall_vs_tiny_vocab", "-x", "-q",
                ],
                cwd=repo, capture_output=True, text=True, timeout=900,
                env={**os.environ, "VOCAB_RECALL_INNER": "1", "XLA_FLAGS": ""},
            )
            assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-1000:]
            return
        cam = EUROC_CAM
        scene = synthetic.make_room_scene(seed=77)  # held out from training
        n_kf = 16
        ts, poses = synthetic.circuit_trajectory(n_kf * 8, radius=4.0, revs=1.0)
        kf_poses = poses[:: 8]
        cfg = orb.OrbConfig(n_features=500)
        frames = []
        for p in kf_poses:
            img = synthetic.render_general(scene, cam, jnp.asarray(p))
            frames.append(frame_mod.make_frame(img, cam, cfg))

        corpus = np.concatenate(
            [np.asarray(f.desc)[np.asarray(f.valid)] for f in frames]
        )
        tiny = voc_mod.train_vocabulary(corpus, k=10, L=3)
        big = voc_mod.load_binary(VOCAB_PATH)

        def recall(voc):
            db = kdb.empty_db(n_kf, frames[0].capacity, voc.n_words)
            for k, f in enumerate(frames):
                db = kdb.add_keyframe(db, voc, jnp.asarray(k), f.desc, f.valid)
            hits = 0
            for k in range(n_kf):
                # Held-out query: the view 3 trajectory steps after KF k.
                q_pose = poses[k * 8 + 3]
                img = synthetic.render_general(scene, cam, jnp.asarray(q_pose))
                f = frame_mod.make_frame(img, cam, cfg)
                words, _ = voc_mod.quantize(voc, f.desc, f.valid)
                v = voc_mod.bow_vector(voc, words)
                scores = np.asarray(kdb.query_scores(db, v))
                best = int(np.argmax(scores))
                if best in (k, (k + 1) % n_kf):
                    hits += 1
            return hits / n_kf

        r_tiny, r_big = recall(tiny), recall(big)
        assert r_big >= 0.7, f"packaged vocab recall too low: {r_big}"
        assert r_big >= r_tiny - 1e-9, (r_big, r_tiny)
