"""Segment reductions for static-shape graph computation on TPU.

These replace the reference's torch-scatter CUDA kernels
(reference: madrigal/models/models.py:15 `scatter_mean/add/max`) with
XLA-native `jax.ops.segment_*` over padded index arrays. All shapes are
static; padding entries carry a sentinel segment id == num_segments which
XLA drops (indices >= num_segments are ignored by segment ops).

Every reduction takes an optional `axis_name`: inside `shard_map` with the
DATA (edge) axis sharded over a mesh axis and the segment table replicated,
the local partial reduction is merged across devices with one XLA
collective (`psum`/`pmax`) over ICI. This is what makes the full-KG HGT
forward graph-parallel (each chip owns an edge shard; node tables are
replicated).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(data, segment_ids, num_segments: int, axis_name=None,
                indices_are_sorted: bool = False):
    out = jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    if axis_name is not None:
        out = jax.lax.psum(out, axis_name)
    return out


def segment_mean(data, segment_ids, num_segments: int, eps: float = 0.0):
    total = segment_sum(data, segment_ids, num_segments)
    ones = jnp.ones(data.shape[:1], dtype=data.dtype)
    count = segment_sum(ones, segment_ids, num_segments)
    denom = jnp.maximum(count, 1.0) if eps == 0.0 else count + eps
    return total / denom.reshape((-1,) + (1,) * (data.ndim - 1))


def segment_max(data, segment_ids, num_segments: int, initial=-jnp.inf,
                axis_name=None, indices_are_sorted: bool = False):
    out = jax.ops.segment_max(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    if axis_name is not None:
        out = jax.lax.pmax(out, axis_name)
    # Segments with no members come back as -inf; leave caller to mask.
    return out


def segment_softmax(logits, segment_ids, num_segments: int, mask=None,
                    axis_name=None, indices_are_sorted: bool = False):
    """Numerically-stable softmax within segments.

    Used by the HGT attention (replacing PyG's `softmax(alpha, index)`;
    reference semantics: torch_geometric.nn.conv.HGTConv message()).

    With `axis_name`, segments span all devices' shards of the edge axis:
    the per-segment max and the denominator are globally merged
    (pmax + psum over the mesh axis); the returned per-edge weights stay
    local to each device's edge shard.

    Args:
      logits: [E, ...] per-edge logits.
      segment_ids: [E] destination-node ids (padding entries must be
        >= num_segments or masked out via `mask`).
      mask: optional [E] bool; False entries get zero weight.
    """
    if mask is not None:
        logits = jnp.where(
            mask.reshape(mask.shape + (1,) * (logits.ndim - 1)), logits, -jnp.inf
        )
    # The max shift cancels analytically, so it is computed on a
    # stop_gradient-ed copy: exact same value, and the backward never sees
    # the (non-differentiable) pmax collective.
    seg_max = jax.ops.segment_max(
        jax.lax.stop_gradient(logits), segment_ids,
        num_segments=num_segments, indices_are_sorted=indices_are_sorted,
    )
    if axis_name is not None:
        seg_max = jax.lax.pmax(seg_max, axis_name)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    shifted = logits - seg_max[segment_ids]
    exp = jnp.exp(shifted)
    if mask is not None:
        exp = jnp.where(mask.reshape(mask.shape + (1,) * (exp.ndim - 1)), exp, 0.0)
    denom = segment_sum(exp, segment_ids, num_segments, axis_name=axis_name,
                        indices_are_sorted=indices_are_sorted)
    denom = jnp.maximum(denom, 1e-16)
    return exp / denom[segment_ids]


def chunked_segment_sum(data, chunk_dst, num_segments: int, chunk: int,
                        axis_name=None, indices_are_sorted: bool = True):
    """Segment sum over the degree-chunked (ELL-style) edge layout.

    `data` is [E, ...] where every aligned chunk of `chunk` consecutive
    rows shares the destination `chunk_dst[i]` (data/kg.py
    `build_kg_batch(edge_chunk=...)`; padding rows must already be zeroed).
    The intra-chunk reduction is a streaming reshape-sum (~8x less scatter
    traffic than per-edge segment_sum; TPU scatters measured at 32 GB/s vs
    ~254 GB/s streaming -- scripts/segment_bench.py)."""
    partial = data.reshape((-1, chunk) + data.shape[1:]).sum(axis=1)
    return segment_sum(partial, chunk_dst, num_segments,
                       axis_name=axis_name,
                       indices_are_sorted=indices_are_sorted)


def chunked_segment_softmax(logits, mask, chunk_dst, num_segments: int,
                            chunk: int, axis_name=None,
                            indices_are_sorted: bool = True):
    """Segment softmax over the degree-chunked edge layout.

    Args:
      logits: [E, ...] per-edge logits (chunk-aligned as above).
      mask: [E] bool; False rows get zero weight.
      chunk_dst: [E // chunk] destination of each chunk (sentinel
        >= num_segments for all-padding chunks).
    Returns per-edge weights [E, ...] (zero on masked rows).

    All destination-side statistics move at chunk granularity: the max and
    denominator are gathered once per chunk and broadcast intra-chunk,
    instead of one [E]-row gather each.
    """
    if mask is not None:
        logits = jnp.where(
            mask.reshape(mask.shape + (1,) * (logits.ndim - 1)),
            logits, -jnp.inf)
    cshape = (-1, chunk) + logits.shape[1:]
    lc = logits.reshape(cshape)
    # per-chunk max -> per-segment max (stop_gradient: the shift cancels)
    cmax = jnp.max(jax.lax.stop_gradient(lc), axis=1)
    seg_max = jax.ops.segment_max(cmax, chunk_dst,
                                  num_segments=num_segments,
                                  indices_are_sorted=indices_are_sorted)
    if axis_name is not None:
        seg_max = jax.lax.pmax(seg_max, axis_name)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    shifted = lc - seg_max[chunk_dst][:, None]
    exp = jnp.exp(shifted)
    exp = jnp.where(jnp.isfinite(shifted), exp, 0.0)  # masked rows -> 0
    denom = segment_sum(exp.sum(axis=1), chunk_dst, num_segments,
                        axis_name=axis_name,
                        indices_are_sorted=indices_are_sorted)
    denom = jnp.maximum(denom, 1e-16)
    alpha = exp / denom[chunk_dst][:, None]
    return alpha.reshape(logits.shape)


def masked_mean_pool(tokens, keep_mask, axis: int = 1, eps: float = 0.0):
    """Mean over `axis` of `tokens` restricted to keep_mask==True rows.

    Replaces the reference's scatter_mean-based masked pooling
    (reference: madrigal/models/models.py:447,873).

    Args:
      tokens: [..., T, D]
      keep_mask: [..., T] bool (True = keep)
    """
    m = keep_mask.astype(tokens.dtype)[..., None]
    total = jnp.sum(tokens * m, axis=axis)
    count = jnp.maximum(jnp.sum(m, axis=axis), 1.0)
    return total / count


def masked_max_pool(tokens, keep_mask, axis: int = 1):
    """Max over `axis` restricted to keep_mask==True rows
    (reference: models.py:451,878). Empty selections return 0 like
    torch-scatter's default."""
    neg = jnp.full_like(tokens, -jnp.inf)
    masked = jnp.where(keep_mask[..., None], tokens, neg)
    out = jnp.max(masked, axis=axis)
    any_kept = jnp.any(keep_mask, axis=axis)[..., None]
    return jnp.where(any_kept, out, 0.0)
