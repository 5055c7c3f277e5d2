"""Train a map-scale ORB vocabulary offline from rendered synthetic views.

The reference ships a pretrained 1M-word DBoW2 tree loaded at startup
(/root/reference/src/main.cc:92-97, Thirdparty/DBoW2 TemplatedVocabulary);
this tool is its training pipeline: render a large corpus of views across
several synthetic scenes (plane fields + room walls, varied seeds/poses),
extract ORB descriptors with the production front-end, then run hierarchical
binary k-medians to a k^L-word tree and save the compact binary (.npz) form.

Usage:
    python tools/train_vocabulary.py --out gf_orb_slam_tpu/data/vocab_100k.npz \
        --k 10 --L 5 --frames-per-scene 40 --scenes 6
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_corpus(
    n_scenes: int, frames_per_scene: int, n_features: int = 800,
    varied: bool = False,
):
    import jax.numpy as jnp
    import numpy as np

    from gf_orb_slam_tpu.geometry.camera import EUROC_CAM, CameraModel
    from gf_orb_slam_tpu.io_utils import synthetic
    from gf_orb_slam_tpu.mapping import frame as frame_mod
    from gf_orb_slam_tpu.ops import orb

    cam_plain = CameraModel(
        fx=458.0, fy=458.0, cx=376.0, cy=240.0, width=752, height=480, fps=20.0
    )
    cfg = orb.OrbConfig(n_features=n_features)
    descs = []
    t0 = time.time()
    for s in range(n_scenes):
        if s % 2 == 0:
            scene = synthetic.make_scene(seed=s)
            ts, poses = synthetic.trajectory(frames_per_scene, fps=20.0)
            cam, render = cam_plain, synthetic.render
        else:
            scene = synthetic.make_room_scene(seed=s)
            ts, poses = synthetic.circuit_trajectory(frames_per_scene, radius=4.0)
            cam, render = EUROC_CAM, synthetic.render_general
        if varied:
            # Swap in textures from the widened family set (stripes/checker/
            # smooth/mixed + lighting variation) — corpus diversity, while the
            # geometry and trajectory machinery stay the production ones.
            rng = np.random.default_rng(1000 + s)
            tex = np.stack([
                synthetic.varied_texture(rng, scene.tex_size)
                for _ in range(scene.textures.shape[0])
            ])
            scene = scene._replace(textures=jnp.asarray(tex))
        for i in range(frames_per_scene):
            img = render(scene, cam, jnp.asarray(poses[i]))
            f = frame_mod.make_frame(img, cam, cfg)
            v = np.asarray(f.valid)
            descs.append(np.asarray(f.desc)[v])
        print(
            f"scene {s + 1}/{n_scenes}: corpus {sum(len(d) for d in descs)} "
            f"descs ({time.time() - t0:.0f}s)",
            flush=True,
        )
    return np.concatenate(descs, axis=0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="gf_orb_slam_tpu/data/vocab_100k.npz")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--L", type=int, default=5)
    ap.add_argument("--scenes", type=int, default=6)
    ap.add_argument("--frames-per-scene", type=int, default=40)
    ap.add_argument("--corpus-cache", default="/tmp/vocab_corpus.npz")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--varied", action="store_true",
                    help="widened texture/lighting corpus (vocab stress, r3)")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    if os.path.exists(args.corpus_cache):
        corpus = np.load(args.corpus_cache)["descs"]
        print(f"loaded cached corpus: {len(corpus)} descriptors")
    else:
        corpus = build_corpus(args.scenes, args.frames_per_scene, varied=args.varied)
        np.savez_compressed(args.corpus_cache, descs=corpus)
        print(f"corpus: {len(corpus)} descriptors (cached to {args.corpus_cache})")

    from gf_orb_slam_tpu.retrieval import vocabulary as voc_mod

    t0 = time.time()
    voc = voc_mod.train_vocabulary(corpus, k=args.k, L=args.L)
    print(f"trained k={args.k} L={args.L} ({voc.n_words} words) in {time.time() - t0:.0f}s")
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    voc_mod.save_binary(args.out, voc)
    sz = os.path.getsize(args.out if args.out.endswith(".npz") else args.out + ".npz")
    print(f"saved {args.out} ({sz / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
