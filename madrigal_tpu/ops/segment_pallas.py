"""Pallas sorted-segment-sum: TPU scatters at MXU speed.

The one op in the KG pipeline still far from speed-of-light is the
row scatter-add: XLA lowers `jax.ops.segment_sum` on TPU to a serial
per-row scatter measured at ~32 GB/s unsorted / ~52 GB/s sorted, vs
~152 GB/s gathers and ~254 GB/s streaming writes
(scripts/segment_bench.py). It is the transpose of every gather in the
HGT message pass, so it dominates the HGT *backward*
(docs/EPOCH_PROFILE.md: hgt_bwd_only 400 ms of a 2.2 s epoch).

This kernel computes a segment sum over PRE-SORTED rows as a sequence
of tiny one-hot matmuls on the MXU instead of a scatter:

  grid step j owns segment block [j*S, (j+1)*S) of the output;
  because rows are sorted by segment id, that block's rows live in one
  contiguous span of `data`, whose chunk bounds are host-precomputed
  from the segment-boundary table. Each [T, W] chunk is DMA'd
  HBM->VMEM (double-buffered) and folded into the [S, W] output block
  with one [S, T] x [T, W] matmul whose lhs is the 0/1 membership
  matrix `oh[s, t] = starts[s] <= t < ends[s]` built on the fly from
  the boundary table -- no per-row segment ids, no run padding (the
  failure mode of the arena approach in ops/gather.py), no scatter.

Cost: reads each row once at DMA stream rate; matmul work is
2*E*S*W FLOPs (MXU-negligible at S=128). Accumulation is float32 on
the MXU in ascending row order -- deterministic; for float32 inputs the
lhs is exactly 0/1 so `precision=HIGHEST` makes each product exact and
the result matches XLA's scatter-add up to f32 re-association.

No reference counterpart: the reference's torch-scatter backward runs
on CUDA atomics (reference: madrigal/models/models.py:15); this file
exists because TPU has no scatter atomics and XLA's fallback is
row-rate-bound.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def segment_starts_np(sorted_ids: np.ndarray, num_segments: int,
                      total_rows: int | None = None) -> np.ndarray:
    """[num_segments + 1] boundary table for rows sorted by segment id.

    starts[s] = first row of segment s; starts[num_segments] = number of
    real rows (rows at or beyond it are ignored by the kernel, so padding
    rows can carry any trailing sentinel id).
    """
    sorted_ids = np.asarray(sorted_ids)
    starts = np.searchsorted(sorted_ids, np.arange(num_segments + 1),
                             side="left").astype(np.int32)
    if total_rows is not None:
        starts[num_segments] = min(int(starts[num_segments]), total_rows)
    return starts


def _kernel(pos_ref, data_ref, starts_ref, ends_ref, out_ref, dbuf, dsem,
            *, block_segs: int, chunk_rows: int, precision):
    S, T = block_segs, chunk_rows
    j = pl.program_id(0)
    c0 = pos_ref[j] // T
    c1 = (pos_ref[j + 1] + T - 1) // T
    n = c1 - c0
    out_ref[...] = jnp.zeros_like(out_ref)
    starts = starts_ref[...]  # [S, 1] int32
    ends = ends_ref[...]

    def dma(k, slot):
        return pltpu.make_async_copy(
            data_ref.at[pl.ds((c0 + k) * T, T)], dbuf.at[slot],
            dsem.at[slot])

    @pl.when(n > 0)
    def _():
        dma(0, 0).start()

    def body(k, carry):
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < n)
        def _():
            dma(k + 1, 1 - slot).start()

        dma(k, slot).wait()
        # membership matrix for this chunk: rows outside the block's
        # segment range (alignment slop at the span ends) match no s
        g = (c0 + k) * T + jax.lax.broadcasted_iota(jnp.int32, (S, T), 1)
        oh = ((g >= starts) & (g < ends)).astype(dbuf.dtype)
        out_ref[...] += jax.lax.dot_general(
            oh, dbuf[slot],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        return carry

    jax.lax.fori_loop(0, n, body, None)


@functools.partial(jax.jit, static_argnames=(
    "num_segments", "block_segs", "chunk_rows", "interpret"))
def _sorted_segment_sum_mxu(data, seg_starts, num_segments: int,
                            block_segs: int, chunk_rows: int,
                            interpret: bool):
    S, T = block_segs, chunk_rows
    E, W = data.shape
    if E % T:
        data = jnp.pad(data, ((0, T - E % T), (0, 0)))
    nb = -(-num_segments // S)
    seg = jnp.minimum(seg_starts, E).astype(jnp.int32)
    idx = jnp.minimum(jnp.arange(nb * S, dtype=jnp.int32), num_segments)
    starts = seg[idx].reshape(nb * S, 1)
    ends = seg[jnp.minimum(idx + 1, num_segments)].reshape(nb * S, 1)
    # empty padding segments beyond num_segments: starts == ends == E_real
    ends = jnp.maximum(ends, starts)
    pos = seg[jnp.minimum(
        jnp.arange(nb + 1, dtype=jnp.int32) * S, num_segments)]

    precision = (jax.lax.Precision.HIGHEST
                 if data.dtype == jnp.float32 else None)
    kernel = functools.partial(_kernel, block_segs=S, chunk_rows=T,
                               precision=precision)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((S, 1), lambda j, pos: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 1), lambda j, pos: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, W), lambda j, pos: (j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, T, W), data.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb * S, W), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(pos, data, starts, ends)
    return out[:num_segments]


def supports_mxu_segment_sum(dtype, width: int) -> bool:
    """The kernel handles f32/bf16 rows with lane-aligned width; other
    dtypes (notably the f64 x64-parity paths) fall back to XLA."""
    return jnp.dtype(dtype) in (jnp.dtype(jnp.float32),
                                jnp.dtype(jnp.bfloat16)) and width % 128 == 0


def sorted_segment_sum_mxu(data, seg_starts, num_segments: int, *,
                           block_segs: int = 128, chunk_rows: int = 512,
                           interpret: bool | None = None):
    """Segment sum of `data` rows sorted by segment id, via MXU one-hot
    matmuls (see module docstring).

    Args:
      data: [E, W] float32/bfloat16, rows grouped by ascending segment id.
        W must be a multiple of 128 (use the XLA path otherwise).
      seg_starts: [num_segments + 1] int32 boundary table
        (`segment_starts_np`); rows at or beyond seg_starts[-1] are
        ignored (trailing padding).
      interpret: run the Pallas interpreter (default: on for non-TPU
        backends so tests exercise the same code path on CPU).
    Returns [num_segments, W] float32.
    """
    if not supports_mxu_segment_sum(data.dtype, data.shape[1]):
        raise ValueError(
            f"sorted_segment_sum_mxu: unsupported dtype/width "
            f"{data.dtype}/{data.shape[1]} (need f32|bf16, width % 128 == 0)")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    block_segs = min(block_segs, -(-num_segments // 8) * 8)
    return _sorted_segment_sum_mxu(
        data, seg_starts, num_segments, block_segs, chunk_rows,
        bool(interpret))
