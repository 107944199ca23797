"""Heterogeneous Graph Transformer (HGT) KG encoder.

TPU-native re-implementation of the reference's PyG HGTConv stack
(reference: madrigal/models/models.py:71-96 builds torch_geometric.nn.HGTConv
layers; default 2 layers, hidden 128, 4 heads, group='sum' --
parse_args.py:52-55).

Per-layer math:
  per node type t:  [k|q|v] = x_t @ W_kqv_t          ([N_t, 3F] -> H heads)
  per edge type r=(s,rel,d), per head h:
      k' = k_s @ K_rel[r,h],  v' = v_s @ V_rel[r,h]   (node-level transforms)
      alpha_e = (q_d[dst_e] . k'[src_e]) * p_rel[r,h] / sqrt(D)
  softmax_scope='per_edge_type' (PyG <=2.2 HGTConv, the API the reference's
  code text uses via group='sum'):
      alpha = segment_softmax(alpha_e over dst_e)     per edge type
      m_d   = group-aggregate of per-edge-type segment sums
  softmax_scope='global' (PyG 2.3.x HGTConv -- the version the reference's
  env pins; its rewrite softmaxes over ALL incoming edges of a dst node
  across edge types, equivalent to one bipartite propagate):
      alpha = segment_softmax(concat of all edge types' alpha_e over dst_e)
      m_d   = segment_sum(alpha * v')
  per node type t:  out = a_lin_t(gelu(m_t)); g = sigmoid(skip_t);
                    out = g * out + (1 - g) * x_t  (when dims match)

All edge types are unrolled statically; each is a dense gather +
segment-softmax + segment-sum over padded edge arenas.
"""
from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax.numpy as jnp

from ..config import HGTConfig
from ..data.kg import HeteroKGBatch, edge_key
from ..ops.gather import gather_rows, gather_rows_mxu
from ..ops.segment_pallas import supports_mxu_segment_sum
from ..ops.segment import (
    chunked_segment_softmax,
    chunked_segment_sum,
    segment_softmax,
    segment_sum,
)


def _src_gather(table, src, src_bwd, chunk: int):
    """Gather node rows by edge source, routing the BACKWARD through the
    fastest transpose the batch's layout supports (unsorted [E]-row
    scatter-adds run ~5x slower than gathers on TPU):

      src_bwd = (src_perm, src_chunk, src_order, src_starts), any of which
      may be None. Preference order:
      1. src_order/src_starts (build_kg_batch(src_sort=True)): permutation
         gather + MXU one-hot segment sum, no padding (ops/gather.py
         gather_rows_mxu) -- requires f32/bf16 tables, 128-aligned width;
      2. src_perm/src_chunk (src_arena=True): sorted-chunk scatter, a
         measured negative result at full scale (kept as opt-in);
      3. plain gather (XLA emits the unsorted scatter-add transpose).
    """
    src_perm, src_chunk, src_order, src_starts = src_bwd
    if src_order is not None and supports_mxu_segment_sum(
            table.dtype, table.shape[-1]):
        return gather_rows_mxu(table, src, src_order, src_starts)
    if src_perm is None:
        return table[src]
    return gather_rows(table, src, src_perm, src_chunk, chunk)


def _block_diag(rel: jnp.ndarray) -> jnp.ndarray:
    """Per-head relation matrices [H, D, E] -> block-diagonal [H*D, H*E].

    Lane-layout keystone: with the relation transform expressed as ONE
    [F, F] matmul on flat [N, F] tables (F = H*D = 128), every edge-axis
    stream downstream (gathers, weighted messages, segment sums) keeps
    H*D merged in the lane dimension and tiles perfectly as T(8, 128).
    The per-head einsum formulation instead pins shapes like [E, 4, 32]
    whose minor dims tile-pad 4x on TPU -- measured 28% program memory
    utilization and ~4x excess HBM traffic in the fwd+bwd at PrimeKG
    scale. The extra FLOPs (zero blocks) are MXU-negligible at F=128.
    Adding the zero blocks into the contraction is exact in IEEE."""
    H, D, E = rel.shape
    eye = jnp.eye(H, dtype=rel.dtype)
    return jnp.einsum("hde,hg->hdge", rel, eye).reshape(H * D, H * E)


def _casters(compute_dtype):
    """(cast, upcast) helpers for the mixed-precision edge pipeline.

    compute_dtype None or float32 -> both are identity (no casts inserted;
    preserves exact f32 numerics AND the f64 parity-test path). A reduced
    dtype (bfloat16) -> cast lowers the big [E, H, D] streams, upcast
    restores f32 for softmax statistics / accumulation."""
    if compute_dtype is None or jnp.dtype(compute_dtype) == jnp.float32:
        return (lambda x: x), (lambda x: x)
    cdt = jnp.dtype(compute_dtype)
    return (lambda x: x.astype(cdt)), (lambda x: x.astype(jnp.float32))


def _head_logits(prod, H: int):
    """Per-head lane-group sum [E, F] -> [E, H] as ONE block-indicator
    matmul instead of `prod.reshape(E, H, D).sum(-1)`.

    The reshape-sum materializes an [E, H, D] temp whose D=32 minor dim
    tile-pads 4x (T(4, 128)) -- at full-KG scale that single temp is the
    largest allocation in the step (1.87 GB f32 for a ~1M-edge type) and
    OOMs the stage-1 link-pred step. The [F, H] 0/1 indicator matmul
    keeps the edge stream in the merged-lane [E, F] layout end to end
    (see _block_diag). precision=HIGHEST stops the TPU from rounding f32
    inputs to bf16 (exact: the indicator is 0/1, so the dot is a pure
    f32/f64 sum of the products); accumulation is >= f32 via
    preferred_element_type, matching the up()-then-sum it replaces."""
    import jax

    F = prod.shape[-1]
    seg = jnp.repeat(jnp.eye(H, dtype=prod.dtype), F // H, axis=0)  # [F,H]
    return jax.lax.dot_general(
        prod, seg, (((prod.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.promote_types(prod.dtype, jnp.float32),
    )


def _edge_type_messages(q_dst, k_src, v_src, k_rel, v_rel, p_rel,
                        src, dst, mask, src_bwd, n_dst: int, axis_name=None,
                        indices_are_sorted: bool = False,
                        compute_dtype=jnp.float32):
    """One edge type's attention aggregate [n_dst, F] (pure arrays so it
    can be jax.checkpoint-ed: at full-KG training scale the per-edge
    [E, H, D] buffers of all 17 edge types otherwise stay live through
    the backward).

    With `axis_name` (inside shard_map, src/dst/mask sharded over that
    mesh axis, node tables replicated) the segment softmax and sum merge
    across the fleet's edge shards -- graph-parallel message passing.

    `compute_dtype=bfloat16` runs the edge-level [E, F] streams
    (gathers, logits product, weighted messages) in bf16 -- the pass is
    HBM-bandwidth-bound, so this approaches 2x. Softmax statistics and
    the output accumulation stay float32. compute_dtype=None inserts no
    casts at all (f32 production path and f64 parity tests).

    Lane layout: node tables are flat [N, F] and every edge-axis stream
    is [E, F] (H*D merged in lanes -- see _block_diag); only the [E, H]
    logits/alpha leave that layout."""
    H, D = k_rel.shape[0], k_rel.shape[-1]
    F = H * D
    cast, up = _casters(compute_dtype)
    k_s = cast(k_src) @ _block_diag(cast(k_rel))  # [N, F]
    v_s = cast(v_src) @ _block_diag(cast(v_rel))
    # k and v are gathered with the SAME src indices: gather once from the
    # concatenated [N, 2F] table. TPU row scatters are ROW-rate-bound
    # (segment_bench: [E,128] 32 GB/s vs [E,256] ~2x the bytes/s), so the
    # fused gather halves the backward's scatter-add cost. Exact numerics
    # (gather of a concat == concat of the gathers).
    kv_g = _src_gather(jnp.concatenate([k_s, v_s], axis=-1),
                       src, src_bwd, 0)  # [E, 2F]
    q_c = cast(q_dst)
    dst_safe = jnp.where(mask, dst, n_dst)
    prod = q_c[dst] * kv_g[:, :F]  # [E, F], compute dtype
    logits = (
        _head_logits(prod, H)  # [E, H], f32-accumulated (f64 in x64)
        * p_rel[None, :]
        / jnp.sqrt(jnp.asarray(D, jnp.float32))
    )
    alpha = segment_softmax(logits, dst_safe, n_dst, mask=mask,
                            axis_name=axis_name,
                            indices_are_sorted=indices_are_sorted)
    msg = kv_g[:, F:] * jnp.repeat(cast(alpha), D, axis=-1)  # [E, F]
    return segment_sum(up(msg), dst_safe, n_dst,
                       axis_name=axis_name,
                       indices_are_sorted=indices_are_sorted)


def _edge_type_messages_chunked(q_dst, k_src, v_src, k_rel, v_rel, p_rel,
                                src, mask, chunk_dst, src_bwd,
                                n_dst: int,
                                chunk: int, axis_name=None,
                                indices_are_sorted: bool = True,
                                compute_dtype=jnp.float32):
    """Degree-chunked variant of `_edge_type_messages` (same math; see
    KGMetadata.edge_chunk). Destination-side values (query rows, softmax
    statistics) move at chunk granularity and the output accumulation is a
    streaming intra-chunk reduction + chunk-granular scatter -- the layout
    that sidesteps the TPU's slow per-edge scatters. Edge-axis streams
    stay [E, F] / [E/c, c, F] (lanes = H*D; see _block_diag)."""
    H, D = k_rel.shape[0], k_rel.shape[-1]
    F = H * D
    cast, up = _casters(compute_dtype)
    k_s = cast(k_src) @ _block_diag(cast(k_rel))  # [N, F]
    v_s = cast(v_src) @ _block_diag(cast(v_rel))
    q_chunk = cast(q_dst)[chunk_dst]  # [E/c, F] (clamped sentinel
    # rows are garbage but fully masked below)
    # fused k|v gather: one [E, 2F] gather / one backward scatter (row-
    # rate-bound; see _edge_type_messages)
    kv_g = _src_gather(jnp.concatenate([k_s, v_s], axis=-1),
                       src, src_bwd, chunk)  # [E, 2F]
    prod = q_chunk[:, None] * kv_g[:, :F].reshape(-1, chunk, F)
    logits = (
        # [E/c, c, F] -> [E, F] is a lane-preserving bitcast
        _head_logits(prod.reshape(-1, F), H)
        * p_rel[None, :]
        / jnp.sqrt(jnp.asarray(D, jnp.float32))
    )  # [E, H]
    alpha = chunked_segment_softmax(
        logits, mask, chunk_dst, n_dst, chunk, axis_name=axis_name,
        indices_are_sorted=indices_are_sorted)
    msg = kv_g[:, F:] * jnp.repeat(cast(alpha), D, axis=-1)  # [E, F]
    return chunked_segment_sum(
        up(msg), chunk_dst, n_dst, chunk,
        axis_name=axis_name, indices_are_sorted=indices_are_sorted)


class HGTConv(nn.Module):
    out_channels: int
    heads: int
    group: str = "sum"
    softmax_scope: str = "per_edge_type"
    remat_edge_types: bool = False
    shard_axis: str | None = None
    compute_dtype: str = "float32"
    src_sorted_bwd: bool = True

    @nn.compact
    def __call__(self, g: HeteroKGBatch, x_dict: Dict[str, jnp.ndarray]):
        F = self.out_channels
        H = self.heads
        D = F // H
        assert D * H == F
        cdt = self.compute_dtype  # message fns interpret "float32" = no-op
        cast, up = _casters(cdt)
        chunk = g.metadata.edge_chunk
        edge_fn = _edge_type_messages
        edge_fn_c = _edge_type_messages_chunked
        if self.remat_edge_types:
            import jax

            edge_fn = jax.checkpoint(_edge_type_messages,
                                     static_argnums=(10, 11, 12, 13))
            edge_fn_c = jax.checkpoint(_edge_type_messages_chunked,
                                       static_argnums=(10, 11, 12, 13, 14))

        # node tables stay flat [N, F] (h-major lanes); per-head structure
        # only surfaces in the [E, H] logits (see _block_diag)
        k_dict, q_dict, v_dict = {}, {}, {}
        for nt in g.metadata.node_types:
            kqv = nn.Dense(3 * F, name=f"kqv__{nt}")(x_dict[nt])
            k_dict[nt], q_dict[nt], v_dict[nt] = jnp.split(kqv, 3, axis=-1)

        # per-edge-type logits + transformed values. When rematting, a
        # barrier carry serializes the edge types: XLA otherwise schedules
        # all 17 types' (re)computations concurrently and the [E, H, D]
        # buffers coexist anyway.
        agg: Dict[str, list] = {nt: [] for nt in g.metadata.node_types}
        pending: Dict[str, list] = {nt: [] for nt in g.metadata.node_types}
        carry = None
        for et in g.metadata.edge_types:
            src_t, _, dst_t = et
            ek = edge_key(et)
            k_rel = self.param(
                f"k_rel__{ek}", nn.initializers.glorot_uniform(), (H, D, D)
            )
            v_rel = self.param(
                f"v_rel__{ek}", nn.initializers.glorot_uniform(), (H, D, D)
            )
            p_rel = self.param(f"p_rel__{ek}", nn.initializers.ones, (H,))

            src = g.edge_src[ek]
            dst = g.edge_dst[ek]
            mask = g.edge_mask[ek]
            n_dst = g.num_nodes(dst_t)
            # source-transpose layouts index the GLOBAL edge axis, so they
            # are unusable when the edge axis is sharded over a mesh axis
            if self.shard_axis is None:
                src_bwd = (g.edge_src_perm.get(ek),
                           g.edge_src_chunk.get(ek),
                           g.edge_src_order.get(ek) if self.src_sorted_bwd
                           else None,
                           g.edge_src_starts.get(ek) if self.src_sorted_bwd
                           else None)
            else:
                src_bwd = (None, None, None, None)

            if self.softmax_scope == "global":
                # global scope must hold every type's logits/values until
                # the per-dst-type softmax, so remat cannot apply here
                k_s = cast(k_dict[src_t]) @ _block_diag(cast(k_rel))
                v_s = cast(v_dict[src_t]) @ _block_diag(cast(v_rel))
                kv_s = jnp.concatenate([k_s, v_s], axis=-1)  # fused k|v
                if chunk > 0:
                    chunk_dst = g.edge_chunk_dst[ek]
                    q_chunk = cast(q_dict[dst_t])[chunk_dst]  # [E/c, F]
                    kv_g = _src_gather(kv_s, src, src_bwd, chunk)
                    prod = up(q_chunk[:, None]
                              * kv_g[:, :F].reshape(-1, chunk, F))
                    logits = (
                        prod.reshape(-1, H, D).sum(axis=-1)
                        * p_rel[None, :]
                        / jnp.sqrt(jnp.asarray(D, jnp.float32))
                    )  # [E, H]
                    pending[dst_t].append(
                        (logits, kv_g[:, F:], chunk_dst, mask))
                    continue
                dst_safe = jnp.where(mask, dst, n_dst)
                kv_g = _src_gather(kv_s, src, src_bwd, 0)  # [E, 2F]
                prod = up(cast(q_dict[dst_t])[dst] * kv_g[:, :F])
                logits = (
                    prod.reshape(-1, H, D).sum(axis=-1)
                    * p_rel[None, :]
                    / jnp.sqrt(jnp.asarray(D, jnp.float32))
                )  # [E, H]
                pending[dst_t].append((logits, kv_g[:, F:], dst_safe, mask))
                continue
            chunk_dst = g.edge_chunk_dst[ek] if chunk > 0 else dst
            if self.remat_edge_types:
                import jax

                if carry is None:
                    carry = jnp.zeros((), jnp.float32)
                src, dst, chunk_dst, carry_in = jax.lax.optimization_barrier(
                    (src, dst, chunk_dst, carry)
                )
            if chunk > 0:
                out = edge_fn_c(
                    q_dict[dst_t], k_dict[src_t], v_dict[src_t],
                    k_rel, v_rel, p_rel, src, mask, chunk_dst,
                    src_bwd,
                    n_dst, chunk, self.shard_axis, True, cdt,
                )
            else:
                out = edge_fn(
                    q_dict[dst_t], k_dict[src_t], v_dict[src_t],
                    k_rel, v_rel, p_rel, src, dst, mask, src_bwd, n_dst,
                    self.shard_axis, g.metadata.edges_sorted, cdt,
                )
            if self.remat_edge_types:
                carry = out[0, 0]
            agg[dst_t].append(out)

        if self.softmax_scope == "global":
            # PyG 2.3 semantics: one softmax over the concatenation of all
            # edge types' incoming edges per destination node (the single
            # bipartite propagate of the rewritten HGTConv)
            for nt, items in pending.items():
                if not items:
                    continue
                n_dst = g.num_nodes(nt)
                logits = jnp.concatenate([it[0] for it in items], axis=0)
                vals = jnp.concatenate([it[1] for it in items], axis=0)
                dsts = jnp.concatenate([it[2] for it in items], axis=0)
                masks = jnp.concatenate([it[3] for it in items], axis=0)
                if chunk > 0:
                    # concatenation preserves chunk alignment (each type's
                    # budget divides chunk) but not global dst order
                    alpha = chunked_segment_softmax(
                        logits, masks, dsts, n_dst, chunk,
                        axis_name=self.shard_axis,
                        indices_are_sorted=False)
                    msg = vals * jnp.repeat(cast(alpha), D, axis=-1)
                    agg[nt].append(chunked_segment_sum(
                        up(msg), dsts, n_dst, chunk,
                        axis_name=self.shard_axis,
                        indices_are_sorted=False))
                    continue
                alpha = segment_softmax(logits, dsts, n_dst, mask=masks,
                                        axis_name=self.shard_axis)
                msg = vals * jnp.repeat(cast(alpha), D, axis=-1)
                agg[nt].append(
                    segment_sum(up(msg), dsts, n_dst,
                                axis_name=self.shard_axis)
                )

        out_dict = {}
        for nt in g.metadata.node_types:
            x = x_dict[nt]
            if not agg[nt]:
                out_dict[nt] = x
                continue
            stacked = jnp.stack(agg[nt])
            if self.softmax_scope == "global" or self.group == "sum":
                m = jnp.sum(stacked, axis=0)
            elif self.group == "mean":
                m = jnp.mean(stacked, axis=0)
            elif self.group == "max":
                m = jnp.max(stacked, axis=0)
            else:
                raise NotImplementedError(self.group)
            out = nn.Dense(F, name=f"out__{nt}")(nn.gelu(m, approximate=False))
            if out.shape[-1] == x.shape[-1]:
                skip = self.param(f"skip__{nt}", nn.initializers.ones, (1,))
                gate = nn.sigmoid(skip)
                out = gate * out + (1.0 - gate) * x
            out_dict[nt] = out
        return out_dict


class HGTEncoder(nn.Module):
    """HGT stack + per-node-type output head (reference HGT class,
    models.py:71-96: relu between convs except after the last, then
    lin_dict per node type to embed_dim)."""

    cfg: HGTConfig
    embed_dim: int
    drug_only_head: bool = False

    @nn.compact
    def __call__(self, g: HeteroKGBatch, *, train: bool = False):
        x = dict(g.node_feats)
        for i in range(self.cfg.num_layers):
            x = HGTConv(
                out_channels=self.cfg.hidden_dim, heads=self.cfg.att_heads,
                group=self.cfg.group,
                softmax_scope=getattr(self.cfg, "softmax_scope",
                                      "per_edge_type"),
                remat_edge_types=getattr(self.cfg, "remat_edge_types",
                                         False),
                shard_axis=getattr(self.cfg, "shard_axis", None),
                compute_dtype=getattr(self.cfg, "compute_dtype", "float32"),
                src_sorted_bwd=getattr(self.cfg, "src_sorted_bwd", True),
                name=f"conv_{i}",
            )(g, x)
            # reference relu placement (models.py:90-94): relu after conv i
            # for 1 <= i <= num_layers-2 (never after conv 0 or the last)
            if 1 <= i <= self.cfg.num_layers - 2:
                x = {nt: nn.relu(h) for nt, h in x.items()}
        out = {}
        node_types = (
            ("drug",) if self.drug_only_head else g.metadata.node_types
        )
        for nt in node_types:
            out[nt] = nn.Dense(self.embed_dim, name=f"lin__{nt}")(x[nt])
        return out
