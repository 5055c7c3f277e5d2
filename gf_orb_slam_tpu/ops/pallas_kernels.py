"""Hand-written Pallas TPU kernels for the hottest inner ops.

The XLA-level implementations in ops/matching.py are already fused dense
programs; these kernels exist where explicit VMEM tiling beats XLA's default
schedule:

* hamming_matrix_pallas — the (Nq, Nt) packed-descriptor Hamming distance
  matrix. Tiled 128×128 output blocks; each block streams both descriptor
  tiles into VMEM once and accumulates XOR+popcount over the 8 words with a
  static unrolled loop, avoiding the (Nq, Nt, 8) intermediate XLA
  materializes.

On non-TPU backends the kernels run in interpreter mode (tests), so the same
call sites work everywhere; `matching` auto-selects at trace time.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128
WORDS = 8


def _hamming_kernel(q_ref, t_ref, out_ref):
    """q_ref: (TILE, 8) u32; t_ref: (TILE, 8) u32; out: (TILE, TILE) i32."""
    acc = jnp.zeros((TILE, TILE), jnp.int32)
    for w in range(WORDS):  # static unroll over descriptor words
        qw = q_ref[:, w][:, None]          # (TILE, 1)
        tw = t_ref[:, w][None, :]          # (1, TILE)
        x = jnp.bitwise_xor(qw, tw)        # (TILE, TILE) u32
        acc = acc + jax.lax.population_count(x).astype(jnp.int32)
    out_ref[:, :] = acc


def hamming_matrix_pallas(desc_q: jnp.ndarray, desc_t: jnp.ndarray) -> jnp.ndarray:
    """(Nq, 8) × (Nt, 8) uint32 → (Nq, Nt) int32 Hamming distances."""
    Nq, Nt = desc_q.shape[0], desc_t.shape[0]
    pq = (-Nq) % TILE
    pt = (-Nt) % TILE
    q = jnp.pad(desc_q, ((0, pq), (0, 0)))
    t = jnp.pad(desc_t, ((0, pt), (0, 0)))
    Mq, Mt = q.shape[0], t.shape[0]

    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        _hamming_kernel,
        grid=(Mq // TILE, Mt // TILE),
        in_specs=[
            pl.BlockSpec((TILE, WORDS), lambda i, j: (i, 0)),
            pl.BlockSpec((TILE, WORDS), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((TILE, TILE), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mq, Mt), jnp.int32),
        interpret=interpret,
    )(q, t)
    return out[:Nq, :Nt]
