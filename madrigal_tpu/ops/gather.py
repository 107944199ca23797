"""Row gathers with a sorted-transpose backward.

On TPU the transpose of a row gather `table[idx]` is a scatter-add over
[E] rows -- and unsorted row scatters run at ~32 GB/s vs ~152 GB/s for
gathers and ~254 GB/s for streaming writes (scripts/segment_bench.py).
The HGT's src-side gathers (`k_s[src]`, `v_s[src]`,
models/hgt.py:_edge_type_messages_chunked) therefore pay most of their
cost in the BACKWARD pass, where XLA emits exactly that scatter.

`gather_rows` keeps the forward gather but replaces the backward scatter
with the same degree-chunked (ELL) trick that fixed the forward
aggregation (data/kg.py `_chunked_edge_arena`): the host precomputes a
permutation of the edge axis sorted by source node, padded so each
source's run fills whole chunks. The backward then

  1. permutation-GATHERS the cotangent rows into src-sorted order
     (gathers are ~5x faster than unsorted scatters),
  2. reduces each aligned chunk with a streaming reshape-sum,
  3. scatter-adds only [P/chunk] rows with sorted indices.

Numerics: the same additions in a different order (bitwise-equal in the
common case of disjoint index sets per chunk; otherwise within one f32
ulp-reassociation -- tests/test_hgt.py pins f64 agreement).

No reference counterpart: the reference's torch-scatter backward runs on
CUDA where atomics make unsorted scatters cheap; this file exists because
TPU scatters are row-rate-bound (CLAUDE.md measured facts).

MEASURED NEGATIVE RESULT (full PrimeKG scale, v5e chip, 2-layer HGT
fwd+bwd, scripts/hgt_scale_bench.py --bwd): the per-source run padding
inflates the arena to ~3.4x the edge count (4.36M rows vs 1.29M edges at
chunk=8) and every [P, H, D] temp tile-pads a further 4x, so the sorted
path runs ~60% SLOWER than XLA's unsorted scatter-add (2550 vs 1561
ms f32 per-edge-type; 1805 vs 1368 bf16; OOMs the chip in global scope).
Kept as a tested opt-in (build_kg_batch(src_arena=True)); the production
default is OFF.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .segment import chunked_segment_sum
from .segment_pallas import sorted_segment_sum_mxu, supports_mxu_segment_sum


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def gather_rows(table, idx, bwd_perm, bwd_chunk_ids, chunk: int):
    """`table[idx]` with a sorted-transpose backward.

    Args:
      table: [N, ...] differentiable row table.
      idx: [E] int32 row indices (may repeat; padding rows allowed as long
        as their cotangents are zero, e.g. masked-out edges).
      bwd_perm: [P] int32 positions into the E axis, grouped by `idx`
        value with each group's run padded to a multiple of `chunk`
        (padding -> sentinel E, which reads an appended zero row).
      bwd_chunk_ids: [P // chunk] int32 table row of each aligned chunk
        (sentinel >= N for all-padding chunks).
      chunk: static chunk width (matches the KG arenas' edge_chunk).
    """
    return table[idx]


def _gather_rows_fwd(table, idx, bwd_perm, bwd_chunk_ids, chunk):
    return table[idx], (table.shape[0], idx, bwd_perm, bwd_chunk_ids)


def _gather_rows_bwd(chunk, res, cot):
    n, idx, bwd_perm, bwd_chunk_ids = res
    zero = jnp.zeros((1,) + cot.shape[1:], cot.dtype)
    cot_sorted = jnp.concatenate([cot, zero], axis=0)[bwd_perm]
    grad = chunked_segment_sum(cot_sorted, bwd_chunk_ids, n, chunk,
                               indices_are_sorted=True)
    f0 = lambda x: np.zeros(x.shape, jax.dtypes.float0)
    return grad, f0(idx), f0(bwd_perm), f0(bwd_chunk_ids)


gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


@jax.custom_vjp
def gather_rows_mxu(table, idx, order, starts):
    """`table[idx]` whose backward is a sorted MXU segment sum instead of
    XLA's unsorted row scatter-add.

    Unlike `gather_rows` (the arena approach above, a measured negative
    result at full scale because of its per-source run padding), this
    path needs NO padding: the backward (1) permutation-gathers the
    cotangent rows into source-sorted order (gathers run ~5x faster than
    unsorted scatters) and (2) reduces each source's ragged run with the
    one-hot-matmul kernel of ops/segment_pallas.py, which streams rows at
    DMA rate and accumulates on the MXU.

    Args:
      table: [N, W] f32/bf16 differentiable row table (W % 128 == 0; use
        `supports_mxu_segment_sum` to gate).
      idx: [E] int32 row indices (repeats fine; rows whose cotangent is
        nonzero must be real edges).
      order: [E] int32 permutation of the edge axis sorted by `idx` value,
        real edges first (padding/masked rows -- whose cotangents are
        zero -- sorted last).
      starts: [N + 1] int32 boundary table over the sorted order
        (ops/segment_pallas.segment_starts_np); starts[N] = number of
        real edges, so trailing padding rows never enter the reduction.
    """
    return table[idx]


def _gather_rows_mxu_fwd(table, idx, order, starts):
    return table[idx], (table.shape[0], idx, order, starts)


def _gather_rows_mxu_bwd(res, cot):
    # the gather output carries the table's dtype, hence so does cot
    n, idx, order, starts = res
    grad = sorted_segment_sum_mxu(cot[order], starts, n).astype(cot.dtype)
    f0 = lambda x: np.zeros(x.shape, jax.dtypes.float0)
    return grad, f0(idx), f0(order), f0(starts)


gather_rows_mxu.defvjp(_gather_rows_mxu_fwd, _gather_rows_mxu_bwd)
