#!/usr/bin/env python
"""Batch experiment sweep — the reference's batch_script/Run_EuRoC.py
equivalent (GF budgets × rounds × sequences, Run_EuRoC.py:17-43).

With datasets on disk:
  python batch_sweep.py --data-root /data/EuRoC --budgets 0 60 100 200 --rounds 2
Without (synthetic fallback):
  python batch_sweep.py --synthetic 100 --budgets 0 100 200
Writes results/<seq>_gf<budget>_r<round>_* artifacts + a summary table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import run_slam


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", help="directory containing sequence folders")
    ap.add_argument("--sequences", nargs="*", default=None)
    ap.add_argument("--synthetic", type=int, default=0)
    ap.add_argument("--budgets", nargs="*", type=int, default=[0, 60, 100, 160])
    ap.add_argument("--rounds", type=int, default=1)
    ap.add_argument("--out-dir", default="results")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--pipeline", type=int, default=0)
    ap.add_argument("--scene", choices=["planes", "room"], default="planes")
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    if args.synthetic:
        seqs = [("synthetic", None)]
    else:
        names = args.sequences or sorted(os.listdir(args.data_root))
        seqs = [(n, os.path.join(args.data_root, n)) for n in names]

    summary = []
    for name, path in seqs:
        for budget in args.budgets:
            for rnd in range(args.rounds):
                prefix = os.path.join(args.out_dir, f"{name}_gf{budget}_r{rnd}")
                argv = ["--out", prefix, "--gf-budget", str(budget)]
                if args.cpu:
                    argv.append("--cpu")
                if args.pipeline:
                    argv += ["--pipeline", str(args.pipeline)]
                if path is None:
                    argv += ["--synthetic", str(args.synthetic), "--scene", args.scene]
                else:
                    argv += ["--seq", path]
                print(f"=== {name} budget={budget} round={rnd} ===", file=sys.stderr)
                run_slam.main(argv)
                with open(prefix + "_result.json") as f:
                    res = json.load(f)
                summary.append({"seq": name, "budget": budget, "round": rnd, **res})

    with open(os.path.join(args.out_dir, "sweep_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    # Console table: the RMSE-vs-latency tradeoff the reference plots.
    print(f"{'seq':>12} {'budget':>7} {'rmse_cm':>8} {'track_ms':>9} {'frames':>7}")
    for row in summary:
        rmse = row.get("ate_rmse_m")
        tot = row.get("timing", {}).get("total", {})
        track = tot.get("median_ms", tot.get("mean_ms", 0))
        print(
            f"{row['seq']:>12} {row['budget']:>7} "
            f"{(rmse * 100 if rmse else float('nan')):>8.2f} {track:>9.1f} {row['tracked']:>7}"
        )


if __name__ == "__main__":
    main()
