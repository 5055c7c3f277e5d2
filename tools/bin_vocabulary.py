#!/usr/bin/env python
"""Vocabulary format converter (ref tools/bin_vocabulary.cc:12-47, which
converts DBoW2 text vocabularies to a fast-loading binary form).

Usage:
  python tools/bin_vocabulary.py ORBvoc.txt ORBvoc.npz   # text → binary
  python tools/bin_vocabulary.py voc.npz voc.txt         # binary → text
"""

from __future__ import annotations

import os
import sys
import time


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 2:
        print(__doc__, file=sys.stderr)
        return 2
    src, dst = argv
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    from gf_orb_slam_tpu.retrieval import vocabulary as voc_mod

    t0 = time.perf_counter()
    voc = voc_mod.load_vocabulary(src)
    t_load = time.perf_counter() - t0
    t0 = time.perf_counter()
    if dst.endswith(".txt"):
        voc_mod.save_dbow2_text(dst, voc)
    else:
        voc_mod.save_binary(dst, voc)
    t_save = time.perf_counter() - t0
    print(
        f"{src} → {dst}: k={voc.k} L={voc.L} words={voc.n_words} "
        f"(load {t_load:.2f}s, save {t_save:.2f}s)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
