"""gf_orb_slam_tpu — a TPU-native monocular visual SLAM framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of GF-ORB-SLAM
(ORB-SLAM v1 + observability-driven "Good Feature" selection). The map is
struct-of-arrays device state, every per-frame computation is a fixed-shape
jitted program, and the hot kernels (ORB extraction, Hamming matching,
Max-logDet selection, bundle adjustment) are batched TPU programs rather than
translations of the reference's C++ thread/pointer architecture.

Layer map (mirrors SURVEY.md section 1, reimagined TPU-first):
  geometry/   SE3/SO3/quat/Sim3, pinhole+radtan camera, PWLS 13-state kinematics
  ops/        ORB pyramid extraction (FAST + rBRIEF) and Hamming matching kernels
  solvers/    pose LM, two-view initializer, EPnP RANSAC, Sim3 Horn, local BA,
              Sim3 pose-graph optimization
  gf/         Good-Feature engine: measurement Jacobians, info matrices,
              Max-logDet lazier-greedy selection, active matching
  mapping/    SoA map state, keyframe/map-point lifecycle, local mapping program
  retrieval/  TPU-resident binary BoW vocabulary + inverted-file keyframe database
  loop/       loop detection, Sim3 verification, loop correction
  parallel/   sharded distributed global BA over jax.sharding meshes
  io_utils/   dataset loaders (EuRoC/TUM/NUIM + synthetic), config, trajectory IO
  pipeline/   tracking state machine and full-system orchestration
"""

__version__ = "0.1.0"
