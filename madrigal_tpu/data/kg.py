"""Heterogeneous knowledge-graph batches with static shapes.

Replaces PyG's `HeteroData` (reference: madrigal/data/data_utils.py:296-337,
models/models.py:724-738) with padded per-edge-type index arrays and
per-node-type feature matrices. The reference's default path clones the FULL
KG every forward (data_utils.py:330-332), which on TPU becomes one big
static message-passing program -- ideal for XLA as long as shapes never
change, hence fixed padding budgets per edge type.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

EdgeType = Tuple[str, str, str]  # (src_node_type, relation, dst_node_type)


def edge_key(et: EdgeType) -> str:
    return "__".join(et)


@dataclasses.dataclass(frozen=True)
class KGMetadata:
    """Static schema: node types and canonical edge types (PyG metadata()).

    edges_sorted: every edge type's arrays are ordered by destination node
    (padding last), letting the segment reductions pass
    indices_are_sorted=True to XLA (faster scatter lowering on TPU).

    edge_chunk: when > 0, every edge type's arrays use the degree-chunked
    (ELL-style) layout: dst-sorted with each destination's edge run padded
    to a multiple of edge_chunk, so each aligned chunk of edge_chunk
    consecutive slots shares ONE destination (HeteroKGBatch.edge_chunk_dst
    holds it, sentinel n_dst for all-padding chunks). The HGT then replaces
    its per-edge scatters (measured 32 GB/s on TPU) with streaming
    intra-chunk reductions (~254 GB/s) plus a chunk-granular scatter, and
    gathers destination-side values at chunk granularity. Implies
    edges_sorted. Numerics are identical (tests/test_hgt.py).
    """

    node_types: Tuple[str, ...]
    edge_types: Tuple[EdgeType, ...]
    edges_sorted: bool = False
    edge_chunk: int = 0

    def __post_init__(self):
        object.__setattr__(self, "node_types", tuple(self.node_types))
        object.__setattr__(
            self, "edge_types", tuple(tuple(e) for e in self.edge_types)
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HeteroKGBatch:
    """Padded heterogeneous graph.

    node_feats: {node_type: [N_t, F_t]} float32.
    edge_src/edge_dst: {edge_key: [E_r]} int32 (padding -> 0, masked).
    edge_mask: {edge_key: [E_r]} bool.
    drug_index_map: [num_kg_drugs] int32 -- global drug id of each row of
      node_feats['drug'] (reference kg_drug_index_map, data_utils.py:299).
    metadata: static schema.
    """

    node_feats: Dict[str, jnp.ndarray]
    edge_src: Dict[str, jnp.ndarray]
    edge_dst: Dict[str, jnp.ndarray]
    edge_mask: Dict[str, jnp.ndarray]
    drug_index_map: jnp.ndarray
    metadata: KGMetadata = dataclasses.field(metadata=dict(static=True))
    # degree-chunked layout only (metadata.edge_chunk > 0): per edge type,
    # [E / edge_chunk] int32 destination of each aligned chunk (sentinel
    # n_dst for all-padding chunks). Empty dict otherwise.
    edge_chunk_dst: Dict[str, jnp.ndarray] = dataclasses.field(
        default_factory=dict)
    # source-transpose arenas (backward-pass layout; see ops/gather.py):
    # edge_src_perm[k]: [P] int32 positions into the edge axis grouped by
    #   source node, runs padded to edge_chunk (sentinel = edge budget E);
    # edge_src_chunk[k]: [P / edge_chunk] int32 source node of each chunk
    #   (sentinel n_src). Empty dicts unless built with src_arena=True.
    edge_src_perm: Dict[str, jnp.ndarray] = dataclasses.field(
        default_factory=dict)
    edge_src_chunk: Dict[str, jnp.ndarray] = dataclasses.field(
        default_factory=dict)
    # source-sorted transpose layout (backward-pass; ops/gather.py
    # gather_rows_mxu + ops/segment_pallas.py). NO run padding:
    # edge_src_order[k]: [E] int32 edge positions sorted by source node,
    #   real edges first (masked/padding rows last);
    # edge_src_starts[k]: [n_src + 1] int32 boundary table over that
    #   order (starts[n_src] = number of real edges).
    # Empty dicts unless built with src_sort=True.
    edge_src_order: Dict[str, jnp.ndarray] = dataclasses.field(
        default_factory=dict)
    edge_src_starts: Dict[str, jnp.ndarray] = dataclasses.field(
        default_factory=dict)

    def num_nodes(self, node_type: str) -> int:
        return self.node_feats[node_type].shape[0]


def _chunked_edge_arena(ei: np.ndarray, chunk: int):
    """Degree-chunked (ELL-style) layout for one edge type.

    Sorts by dst and pads each destination's run to a multiple of `chunk`
    (padding slots: src=0, dst=run's dst, mask=False), so every aligned
    chunk of `chunk` consecutive slots shares one destination. Returns
    (src, dst, mask, chunk_dst) WITHOUT trailing arena padding. Expected
    overhead vs raw E is <= (chunk-1)/2 slots per active destination
    (~5% at PrimeKG degree scale with chunk=8).
    """
    e = ei.shape[1]
    if e == 0:
        z = np.zeros((0,), np.int32)
        return z, z, np.zeros((0,), bool), z
    order = np.argsort(ei[1], kind="stable")
    src_s, dst_s = ei[0][order], ei[1][order]
    uniq, counts = np.unique(dst_s, return_counts=True)
    padded_counts = ((counts + chunk - 1) // chunk) * chunk
    total = int(padded_counts.sum())
    src = np.zeros((total,), np.int32)
    dst = np.repeat(uniq.astype(np.int32), padded_counts)
    msk = np.zeros((total,), bool)
    # scatter the sorted edges into their padded runs
    run_starts = np.concatenate([[0], np.cumsum(padded_counts)[:-1]])
    in_starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = (np.arange(e) - np.repeat(in_starts, counts)
           + np.repeat(run_starts, counts))
    src[pos] = src_s
    msk[pos] = True
    chunk_dst = dst[::chunk].copy()
    return src, dst, msk, chunk_dst


def _src_transpose_arena(src: np.ndarray, msk: np.ndarray, chunk: int,
                         pad_multiple: int):
    """Backward-pass layout for one edge type (ops/gather.py gather_rows).

    Groups the REAL edge positions by source node (stable argsort of the
    final arena's src column), pads each source's run to a multiple of
    `chunk` with the sentinel position E (which reads an appended zero
    cotangent row), and pads the whole arena to a static budget. Returns
    (perm [P], chunk_src [P // chunk]).
    """
    e_budget = src.shape[0]
    pos = np.nonzero(msk)[0].astype(np.int32)
    mult = int(np.lcm(pad_multiple, chunk))
    if pos.shape[0] == 0:
        return (np.full((mult,), e_budget, np.int32),
                np.full((mult // chunk,), np.iinfo(np.int32).max, np.int32))
    s = src[pos]
    order = np.argsort(s, kind="stable")
    pos, s = pos[order], s[order]
    uniq, counts = np.unique(s, return_counts=True)
    padded = ((counts + chunk - 1) // chunk) * chunk
    total = int(padded.sum())
    perm = np.full((total,), e_budget, np.int32)
    run_starts = np.concatenate([[0], np.cumsum(padded)[:-1]])
    in_starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    ppos = (np.arange(pos.shape[0]) - np.repeat(in_starts, counts)
            + np.repeat(run_starts, counts))
    perm[ppos] = pos
    chunk_src = np.repeat(uniq.astype(np.int32), padded // chunk)
    budget = max(((total + mult - 1) // mult) * mult, mult)
    perm = np.concatenate(
        [perm, np.full((budget - total,), e_budget, np.int32)])
    chunk_src = np.concatenate([
        chunk_src,
        np.full(((budget - total) // chunk,), np.iinfo(np.int32).max,
                np.int32),
    ])
    return perm, chunk_src


def _src_sort_layout(src: np.ndarray, msk: np.ndarray, n_src: int):
    """Source-sorted transpose layout for one edge type (see
    HeteroKGBatch.edge_src_order): positions of real edges sorted by
    source node, masked/padding rows last, plus the [n_src + 1]
    segment-boundary table consumed by ops/segment_pallas.py."""
    e = src.shape[0]
    key = np.where(msk, src.astype(np.int64), np.int64(n_src) + 1)
    order = np.argsort(key, kind="stable").astype(np.int32)
    n_real = int(msk.sum())
    starts = np.searchsorted(
        src[order[:n_real]], np.arange(n_src + 1)).astype(np.int32)
    return order, starts


def build_kg_batch(
    node_feats: Dict[str, np.ndarray],
    edge_indices: Dict[EdgeType, np.ndarray],  # [2, E] per canonical triple
    drug_ids: Sequence[int],
    pad_multiple: int = 512,
    edge_budgets: Dict[str, int] | None = None,
    sort_edges: bool = False,
    edge_chunk: int = 0,
    src_arena: bool | None = None,
    src_sort: bool | None = None,
) -> HeteroKGBatch:
    """Assemble a padded HeteroKGBatch from host arrays.

    sort_edges: order each edge type by destination node (free host-side
    preprocessing) so the device segment reductions run with
    indices_are_sorted=True.

    edge_chunk: > 0 selects the degree-chunked layout (see KGMetadata);
    8 is a good TPU default. Implies dst-sorted arenas.

    src_arena: also build the source-transpose (backward-pass) arenas so
    the HGT's src gathers backprop without unsorted row scatters
    (ops/gather.py). Default OFF: measured at full PrimeKG scale the
    per-source run padding inflates the arena ~3.4x (4.36M rows vs
    1.29M edges) and the sorted path runs ~60% SLOWER than XLA's
    unsorted scatter-add (2550 vs 1561 ms/fwd+bwd f32 per-edge-type,
    1805 vs 1368 bf16; OOM in global scope) -- the scatter it avoids is
    cheaper than the padding it adds (scripts/hgt_scale_bench.py --bwd)."""
    metadata = KGMetadata(
        node_types=tuple(sorted(node_feats)),
        edge_types=tuple(sorted(edge_indices)),
        edges_sorted=sort_edges or edge_chunk > 0,
        edge_chunk=edge_chunk,
    )
    if src_arena is None:
        src_arena = False
    if src_sort is None:
        src_sort = False
    n_nodes = {k: np.asarray(v).shape[0] for k, v in node_feats.items()}
    src_d, dst_d, mask_d, cdst_d = {}, {}, {}, {}
    sperm_d, schunk_d = {}, {}
    sorder_d, sstarts_d = {}, {}
    for et, ei in edge_indices.items():
        k = edge_key(et)
        ei = np.asarray(ei)
        n_dst = n_nodes[et[2]]
        if edge_chunk > 0:
            src, dst, msk, chunk_dst = _chunked_edge_arena(ei, edge_chunk)
            e = src.shape[0]
            mult = int(np.lcm(pad_multiple, edge_chunk))
            budget = (edge_budgets or {}).get(k) or max(
                ((e + mult - 1) // mult) * mult, mult
            )
            if e > budget or budget % edge_chunk:
                raise ValueError(
                    f"edge budget invalid for {k}: chunked size {e}, "
                    f"budget {budget} (must be a multiple of {edge_chunk})")
            pad = budget - e
            src = np.concatenate([src, np.zeros((pad,), np.int32)])
            # padding edges carry dst=0 with mask=False; per-edge consumers
            # (HAN/RGCN) drop them via the mask, the chunked HGT path via
            # the edge_chunk_dst sentinel appended below
            dst = np.concatenate([dst, np.zeros((pad,), np.int32)])
            msk = np.concatenate([msk, np.zeros((pad,), bool)])
            chunk_dst = np.concatenate([
                chunk_dst,
                np.full((pad // edge_chunk,), n_dst, np.int32),
            ])
            src_d[k], dst_d[k], mask_d[k] = (
                jnp.asarray(src), jnp.asarray(dst), jnp.asarray(msk))
            cdst_d[k] = jnp.asarray(chunk_dst)
            if src_arena:
                perm, chunk_src = _src_transpose_arena(
                    src, msk, edge_chunk, pad_multiple)
                sperm_d[k] = jnp.asarray(perm)
                schunk_d[k] = jnp.asarray(chunk_src)
            if src_sort:
                order, starts = _src_sort_layout(src, msk, n_nodes[et[0]])
                sorder_d[k] = jnp.asarray(order)
                sstarts_d[k] = jnp.asarray(starts)
            continue
        if sort_edges and ei.shape[1]:
            order = np.argsort(ei[1], kind="stable")
            ei = ei[:, order]
        e = ei.shape[1]
        budget = (edge_budgets or {}).get(k) or max(
            ((e + pad_multiple - 1) // pad_multiple) * pad_multiple, pad_multiple
        )
        if e > budget:
            raise ValueError(f"edge budget too small for {k}: {e} > {budget}")
        src = np.zeros((budget,), np.int32)
        dst = np.zeros((budget,), np.int32)
        msk = np.zeros((budget,), bool)
        src[:e] = ei[0]
        dst[:e] = ei[1]
        msk[:e] = True
        src_d[k], dst_d[k], mask_d[k] = (
            jnp.asarray(src), jnp.asarray(dst), jnp.asarray(msk),
        )
        if src_sort:
            order, starts = _src_sort_layout(src, msk, n_nodes[et[0]])
            sorder_d[k] = jnp.asarray(order)
            sstarts_d[k] = jnp.asarray(starts)
    return HeteroKGBatch(
        node_feats={k: jnp.asarray(v, jnp.float32) for k, v in node_feats.items()},
        edge_src=src_d,
        edge_dst=dst_d,
        edge_mask=mask_d,
        drug_index_map=jnp.asarray(np.asarray(drug_ids, np.int32)),
        metadata=metadata,
        edge_chunk_dst=cdst_d,
        edge_src_perm=sperm_d,
        edge_src_chunk=schunk_d,
        edge_src_order=sorder_d,
        edge_src_starts=sstarts_d,
    )


def remove_edges_attached_to_drugs(
    edge_indices: Dict[EdgeType, np.ndarray],
    drug_rows: np.ndarray,
    num_drug_nodes: int,
) -> Dict[EdgeType, np.ndarray]:
    """Drop KG edges touching the given drug-node rows (leakage control for
    eval drugs; reference: data_utils.py:279-293)."""
    keep_mask = np.ones((num_drug_nodes,), dtype=bool)
    keep_mask[drug_rows] = False
    out = {}
    for et, ei in edge_indices.items():
        src_t, _, dst_t = et
        ei = np.asarray(ei)
        keep = np.ones(ei.shape[1], dtype=bool)
        if src_t == "drug":
            keep &= keep_mask[ei[0]]
        if dst_t == "drug":
            keep &= keep_mask[ei[1]]
        out[et] = ei[:, keep]
    return out


def drug_row_lookup(drug_index_map: np.ndarray, num_total_drugs: int) -> np.ndarray:
    """Inverse map: global drug id -> row in the KG drug-node table, or -1.

    The reference pads non-KG drugs with randn then masks them downstream
    (models.py:734); we instead gather row -1 -> zeros, which is
    masked-equivalent and deterministic (SURVEY.md section 7.3).
    """
    lut = np.full((num_total_drugs,), -1, dtype=np.int32)
    lut[np.asarray(drug_index_map)] = np.arange(len(drug_index_map), dtype=np.int32)
    return lut
