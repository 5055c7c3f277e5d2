#!/usr/bin/env python
"""Distributed global BA scaling benchmark (BASELINE.json configs 4-5).

Measures time per LM iteration of the keyframe-sharded global BA across mesh
sizes and reports scaling efficiency. On a multi-chip/multi-host platform the
mesh spans real devices (ICI/DCN); with --virtual N it uses
xla_force_host_platform_device_count to validate the collective structure.

  python tools/ba_scaling_bench.py --virtual 8 --cams 64 --points 4096
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0,
                    help="force N virtual CPU devices (0 = use real devices)")
    ap.add_argument("--cams", type=int, default=64)
    ap.add_argument("--points", type=int, default=4096)
    ap.add_argument("--obs-per-cam", type=int, default=512)
    ap.add_argument("--lm-iters", type=int, default=6)
    ap.add_argument("--pcg-iters", type=int, default=20)
    ap.add_argument("--breakdown", action="store_true",
                    help="also time the per-shard workload on a 1-device mesh "
                         "(psum = identity) to split compute vs collective cost")
    ap.add_argument("--projection", action="store_true",
                    help="auditable multi-chip η projection: measured per-shard "
                         "compute (C/d cams + P/d points at d=1) + analytic "
                         "collective payload bytes / assumed ICI bandwidth "
                         "range + measured virtual-mesh partition overhead")
    ap.add_argument("--fast-gen", action="store_true",
                    help="synthesize observations by sampling point-id windows "
                         "per camera instead of full-visibility projection — "
                         "required at pod scale (4096 cams x 256k points: the "
                         "per-camera generation loop projects C*P pairs)")
    ap.add_argument("--no-virt", action="store_true",
                    help="skip the measured virtual-mesh overhead column (on "
                         "this 2-core host it is noise at small problems and "
                         "meaningless at pod scale where d shards serialize "
                         "onto 2 cores)")
    args = ap.parse_args()

    if args.virtual:
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.virtual}"
        ).strip()
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gf_orb_slam_tpu.geometry import camera, quat, se3
    from gf_orb_slam_tpu.geometry.camera import project
    from gf_orb_slam_tpu.parallel import global_ba
    from gf_orb_slam_tpu.solvers.local_ba import BAProblem

    cam = camera.EUROC_CAM
    rng = np.random.default_rng(0)
    C, P, N = args.cams, args.points, args.obs_per_cam

    pts = rng.uniform([-8, -6, 5.0], [8, 6, 20.0], (P, 3)).astype(np.float32)
    if args.fast_gen:
        # Pod-scale generation: each camera observes N points drawn from a
        # sliding id window (structured covisibility locality, like a long
        # trajectory); only the C·N observed pairs are projected, vectorized
        # in one jit, instead of all C·P pairs. Observation geometry realism
        # only has to keep the LM numerically healthy — the η protocol
        # measures compute/collective structure, not accuracy.
        ids = np.empty((C, N), np.int64)
        span = max(P // 4, N * 4)
        for c in range(C):
            lo = int((P - span) * c / max(C - 1, 1))
            ids[c] = rng.choice(span, size=N, replace=False) + lo
        t_all = np.stack([
            np.asarray([8.0 * c / C - 4.0, 0.2 * np.sin(c), 0.0], np.float32)
            for c in range(C)
        ])
        w_all = (rng.normal(size=(C, 3)) * 0.02).astype(np.float32)

        @jax.jit
        def gen(t_all, w_all, pts_j, ids_j):
            pose = jax.vmap(
                lambda w, t: se3.make_pose(quat.v2q(w), t)
            )(w_all, t_all)                                     # (C, 7)
            sel = pts_j[ids_j]                                  # (C, N, 3)
            uv, _, ok = project(cam, se3.transform_point(pose[:, None, :], sel))
            return pose, uv, ok

        pose_j, uv_j, ok_j = gen(
            jnp.asarray(t_all), jnp.asarray(w_all), jnp.asarray(pts),
            jnp.asarray(ids),
        )
        uv_np = np.asarray(uv_j) + rng.normal(0, 0.5, (C, N, 2))
        ok_np = np.asarray(ok_j)
        prob = BAProblem(
            poses=jnp.asarray(np.asarray(pose_j)),
            points=jnp.asarray(
                pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)
            ),
            fixed=jnp.asarray([True, True] + [False] * (C - 2)),
            point_valid=jnp.ones(P, bool),
            obs_uv=jnp.asarray(uv_np.astype(np.float32)),
            obs_point=jnp.asarray(np.where(ok_np, ids, -1).astype(np.int32)),
            obs_w=jnp.asarray(ok_np.astype(np.float32)),
        )
        return bench_problem(args, cam, prob, C, P, N)
    poses, obs_uv, obs_pt, obs_w = [], [], [], []
    for c in range(C):
        t = np.asarray([8.0 * c / C - 4.0, 0.2 * np.sin(c), 0.0], np.float32)
        w = (rng.normal(size=3) * 0.02).astype(np.float32)
        pose = np.asarray(se3.make_pose(quat.v2q(jnp.asarray(w)), jnp.asarray(t)))
        uv, _, ok = project(cam, se3.transform_point(jnp.asarray(pose), jnp.asarray(pts)))
        vis = np.nonzero(np.asarray(ok))[0]
        rng.shuffle(vis)
        sel = vis[:N]
        row_uv = np.zeros((N, 2), np.float32)
        row_pt = np.full(N, -1, np.int32)
        row_w = np.zeros(N, np.float32)
        row_uv[: len(sel)] = np.asarray(uv)[sel] + rng.normal(0, 0.5, (len(sel), 2))
        row_pt[: len(sel)] = sel
        row_w[: len(sel)] = 1.0
        poses.append(pose)
        obs_uv.append(row_uv)
        obs_pt.append(row_pt)
        obs_w.append(row_w)

    prob = BAProblem(
        poses=jnp.asarray(np.stack(poses)),
        points=jnp.asarray(pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)),
        fixed=jnp.asarray([True, True] + [False] * (C - 2)),
        point_valid=jnp.ones(P, bool),
        obs_uv=jnp.asarray(np.stack(obs_uv)),
        obs_point=jnp.asarray(np.stack(obs_pt)),
        obs_w=jnp.asarray(np.stack(obs_w)),
    )
    return bench_problem(args, cam, prob, C, P, N)


def bench_problem(args, cam, prob, C, P, N):
    import jax
    import jax.numpy as jnp

    from gf_orb_slam_tpu.parallel import global_ba
    from gf_orb_slam_tpu.solvers.local_ba import BAProblem

    n_dev = len(jax.devices())
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_dev and C % d == 0]
    results = {}
    compute_only = {}

    def time_run(problem, mesh):
        run = lambda: global_ba.distributed_bundle_adjust(
            cam, problem, mesh, n_lm_iters=args.lm_iters, n_pcg_iters=args.pcg_iters
        )
        out = run()
        jax.block_until_ready(out.poses)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = run()
            jax.block_until_ready(out.poses)
        return (time.perf_counter() - t0) / reps / args.lm_iters * 1e3, out

    mesh1 = global_ba.make_mesh(1)

    if args.projection:
        # ------------------------------------------------------------------
        # η projection with auditable inputs (VERDICT r3 item 8).
        #
        # Per-device collective payload per LM iteration, from the program
        # structure (parallel/global_ba.py::_make_step): with ring
        # reduce-scatter/all-gather each device moves (d-1)/d of the array.
        #   psum_scatter V (P,3,3)        once
        #   psum_scatter g_p (P,3)        once
        #   all_gather (P,3)  (V⁻¹-apply) n_pcg + 2   (RHS, each CG iter, backsub)
        #   psum_scatter (P,3) (accum)    n_pcg + 1   (each CG iter, backsub)
        # plus latency-bound scalar psums: 2 dots/CG iter + rz0 + 2 costs.
        # ------------------------------------------------------------------
        npcg = args.pcg_iters
        t1, out1 = time_run(prob, mesh1)
        print(f"reference d=1 full problem: {t1:.2f} ms/LM-iter "
              f"(cost {float(out1.cost):.1f})", flush=True)
        # Assumed per-device interconnect bandwidths (bytes/s) — v5e ICI is
        # ~4×45 GB/s links; 2-host DCN is the pessimistic floor.
        bands = [("pessimistic 25 GB/s (DCN-ish)", 25e9),
                 ("nominal 90 GB/s (2 ICI links)", 90e9),
                 ("optimistic 180 GB/s (4 ICI links)", 180e9)]
        lat_rounds = 2 * npcg + 3  # blocking scalar-psum rounds per LM iter
        lat_s = 5e-6               # ~µs-scale ICI collective launch latency
        hdr = ("d | shard ms (meas) | payload MB/dev | "
               + " | ".join(f"η {n.split()[0]}" for n, _ in bands)
               + " | virt-mesh ovh ms (meas)")
        print(hdr, flush=True)
        rows = []
        for d in [x for x in (2, 4, 8) if C % x == 0]:
            P_pad = P + ((-P) % d)
            # Honest per-shard model: C/d cameras AND P/d point slots — the
            # sharded program's per-shard point work is 1/d (V inverts, V⁻¹
            # applies); the full-size (P,·) scatter adds stay full-size, so
            # this slightly UNDERSTATES per-shard compute; the virtual-mesh
            # overhead column (which contains exactly those full-size pieces
            # plus CPU-emulated collectives) bounds the understatement.
            keep = P_pad // d
            sub = BAProblem(
                poses=prob.poses[: C // d],
                points=prob.points[:keep],
                fixed=prob.fixed[: C // d],
                point_valid=prob.point_valid[:keep],
                obs_uv=prob.obs_uv[: C // d],
                obs_point=jnp.where(prob.obs_point[: C // d] < keep,
                                    prob.obs_point[: C // d], -1),
                obs_w=prob.obs_w[: C // d],
            )
            t_shard, _ = time_run(sub, mesh1)
            bytes_dev = (d - 1) / d * 4.0 * (
                P_pad * 9 + P_pad * 3
                + (npcg + 2) * P_pad * 3
                + (npcg + 1) * P_pad * 3
            )
            if args.no_virt:
                # d pod-scale shards serialized onto 2 host cores measure
                # nothing but contention; the r4 run also showed the column
                # is noise-dominated (−7.8 ms at d=4) at small problems.
                ovh_virt = None
            else:
                t_full_virt, _ = time_run(prob, global_ba.make_mesh(d))
                ovh_virt = t_full_virt - t1  # CPU-emulated collectives+partition
            etas = []
            for _, bw in bands:
                t_coll = bytes_dev / bw * 1e3 + lat_rounds * lat_s * 1e3
                etas.append(t1 / (d * (t_shard + t_coll)))
            rows.append((d, t_shard, bytes_dev / 1e6, etas, ovh_virt))
            ovh_str = "   (skipped)" if ovh_virt is None else f"{ovh_virt:+8.2f}"
            print(f"{d} | {t_shard:9.2f} | {bytes_dev/1e6:10.2f} | "
                  + " | ".join(f"{e:5.1%}" for e in etas)
                  + f" | {ovh_str}", flush=True)
        import json as _json

        print(_json.dumps({
            "C": C, "P": P, "obs_per_cam": N, "pcg_iters": npcg,
            "t1_ms": t1, "latency_rounds": lat_rounds, "latency_s": lat_s,
            "bands": [(n, bw) for n, bw in bands],
            "rows": [
                {"d": d, "t_shard_ms": ts, "payload_MB_dev": mb,
                 "eta": es, "virt_overhead_ms": ov}
                for d, ts, mb, es, ov in rows
            ],
        }), flush=True)
        return

    for d in sizes:
        mesh = global_ba.make_mesh(d)
        dt, out = time_run(prob, mesh)
        results[d] = dt
        if args.breakdown and d > 1:
            # Compute-only ablation: the SAME per-shard workload (C/d cameras,
            # full replicated point table) on a 1-device mesh, where every
            # psum is the identity — isolates collective+partition cost.
            sub = BAProblem(
                poses=prob.poses[: C // d],
                points=prob.points,
                fixed=prob.fixed[: C // d],
                point_valid=prob.point_valid,
                obs_uv=prob.obs_uv[: C // d],
                obs_point=prob.obs_point[: C // d],
                obs_w=prob.obs_w[: C // d],
            )
            dt_c, _ = time_run(sub, mesh1)
            compute_only[d] = dt_c
            print(
                f"devices={d:3d}  per-shard compute-only={dt_c:8.2f} ms/LM-iter  "
                f"collective+partition={dt - dt_c:8.2f} ms ({(dt - dt_c) / dt:5.1%})",
                flush=True,
            )
        if args.virtual:
            # Virtual shards share ONE host's cores: aggregate compute is
            # fixed, so ideal is FLAT time and the meaningful number is the
            # partition+collective overhead vs 1 shard — true scaling
            # efficiency requires real devices.
            ovh = dt / results[sizes[0]] - 1.0
            print(
                f"devices={d:3d}  ms/LM-iter={dt:8.2f}  cost={float(out.cost):10.1f}  "
                f"shard-overhead={ovh:+6.1%} (virtual mesh: shared compute)",
                flush=True,
            )
        else:
            eff = results[sizes[0]] * sizes[0] / (dt * d) if d > sizes[0] else 1.0
            print(
                f"devices={d:3d}  ms/LM-iter={dt:8.2f}  cost={float(out.cost):10.1f}  "
                f"scaling-eff={eff:5.2f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
