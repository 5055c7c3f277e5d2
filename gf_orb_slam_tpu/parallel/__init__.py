"""Multi-device parallelism: distributed global bundle adjustment over
jax.sharding meshes (new capability mandated by BASELINE.json configs 4-5;
no reference counterpart — the reference is single-machine threads).
"""
