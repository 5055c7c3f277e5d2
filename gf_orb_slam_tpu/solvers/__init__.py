"""Estimation solvers (reference layer L4): pose LM, two-view initializer,
EPnP RANSAC, Sim3 Horn RANSAC, Schur-complement local BA, Sim3 pose graph.

All solvers are fixed-iteration batched LM/RANSAC programs — the reference's
g2o/OpenCV solvers re-architected as jit-compilable dense linear algebra.
"""
