#!/usr/bin/env python
"""Standalone Max-logDet selection micro-benchmark over feature-count sweeps —
the reference's tools/simu_greedy.cc equivalent (simu_greedy.cc:30-80).

  python tools/selection_bench.py [--cpu] [--pools 200 500 1000 2000] [--k 100]

Prints a table of (pool size, method, ms/selection, logdet gap vs exact).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--pools", nargs="*", type=int, default=[200, 500, 1000, 2000])
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gf_orb_slam_tpu.geometry import camera
    from gf_orb_slam_tpu.gf import observability, selection

    cam = camera.EUROC_CAM
    rng = np.random.default_rng(0)
    print(f"{'pool':>6} {'method':>16} {'ms':>9} {'logdet_gap':>11}")
    for n in args.pools:
        uv = rng.uniform([40, 40], [cam.width - 40, cam.height - 40], (n, 2))
        z = rng.uniform(3, 15, n)
        xc = np.asarray(camera.backproject(cam, jnp.asarray(uv, jnp.float32), jnp.asarray(z, jnp.float32)))
        Xv = jnp.zeros(13).at[3].set(1.0)
        jac = observability.measurement_jacobians(cam, Xv, jnp.asarray(xc, jnp.float32))
        blocks = observability.info_matrices(
            observability.whiten(jac.H, jnp.ones(n)), jac.visible
        )
        k = min(args.k, n // 2)

        exact = selection.greedy_maxlogdet(blocks, jac.visible, k=k)
        methods = {
            "greedy_exact": lambda key: selection.greedy_maxlogdet(blocks, jac.visible, k=k),
            "lazier_greedy": lambda key: selection.lazier_greedy_maxlogdet(
                blocks, jac.visible, k=k, key=key
            ),
            "grouped_lazier": lambda key: selection.grouped_lazier_greedy(
                blocks, jac.visible, k=k, key=key, n_shards=4
            ),
        }
        for name, fn in methods.items():
            out = fn(jax.random.PRNGKey(0))
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            lds = []
            for r in range(args.reps):
                out = fn(jax.random.PRNGKey(r))
                lds.append(out.logdet)
            jax.block_until_ready(lds)
            dt = (time.perf_counter() - t0) / args.reps * 1e3
            gap = float(exact.logdet) - float(np.mean([float(x) for x in lds]))
            print(f"{n:>6} {name:>16} {dt:>9.2f} {gap:>11.3f}")


if __name__ == "__main__":
    main()
