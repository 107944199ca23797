"""Static-shape padded molecular graph batches.

Replaces torchdrug's `PackedMolecule` (reference: madrigal/data/data.py:10,
models/models.py:720-721) with a TPU-friendly struct of padded arrays:
XLA requires static shapes, so graphs are packed into one node/edge arena
with bucketed padding budgets to avoid recompilation.
"""
from __future__ import annotations

import dataclasses
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import BOND_DIM, MOL_DIM


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MolGraphBatch:
    """A batch of molecules packed into a single padded arena.

    Attributes:
      node_feats: [N_pad, MOL_DIM] float32 atom features.
      node_mask:  [N_pad] bool, True for real atoms.
      node_graph: [N_pad] int32 graph id per atom; padding rows hold
                  `num_graphs` (dropped by segment ops).
      edge_src/edge_dst: [E_pad] int32; bonds appear in both directions.
                  Padding rows hold index 0 and are masked by edge_mask.
      edge_feats: [E_pad, BOND_DIM] float32 bond features.
      edge_mask:  [E_pad] bool.
      num_graphs: static int -- number of molecules in the batch.
    """

    node_feats: jnp.ndarray
    node_mask: jnp.ndarray
    node_graph: jnp.ndarray
    edge_src: jnp.ndarray
    edge_dst: jnp.ndarray
    edge_feats: jnp.ndarray
    edge_mask: jnp.ndarray
    num_graphs: int = dataclasses.field(metadata=dict(static=True))

    @property
    def num_nodes_padded(self) -> int:
        return self.node_feats.shape[0]

    @property
    def num_edges_padded(self) -> int:
        return self.edge_src.shape[0]


def round_up(x: int, multiple: int) -> int:
    return ((x + multiple - 1) // multiple) * multiple


def pack_molecules(
    graphs: Sequence[dict],
    node_budget: int | None = None,
    edge_budget: int | None = None,
    pad_multiple: int = 128,
) -> MolGraphBatch:
    """Pack a list of per-molecule dicts into one padded MolGraphBatch.

    Each input dict has numpy arrays:
      'node_feats' [n, MOL_DIM], 'edge_index' [e, 2] (directed, both
      directions present), 'edge_feats' [e, BOND_DIM].

    Budgets are rounded up to `pad_multiple` (bucketed padding keeps the
    number of distinct compiled shapes small).
    """
    n_total = sum(int(g["node_feats"].shape[0]) for g in graphs)
    e_total = sum(int(g["edge_index"].shape[0]) for g in graphs)
    n_pad = node_budget or round_up(max(n_total, 1), pad_multiple)
    e_pad = edge_budget or round_up(max(e_total, 1), pad_multiple)
    if n_total > n_pad or e_total > e_pad:
        raise ValueError(
            f"budget too small: nodes {n_total}>{n_pad} or edges {e_total}>{e_pad}"
        )

    node_feats = np.zeros((n_pad, MOL_DIM), dtype=np.float32)
    node_mask = np.zeros((n_pad,), dtype=bool)
    node_graph = np.full((n_pad,), len(graphs), dtype=np.int32)
    edge_src = np.zeros((e_pad,), dtype=np.int32)
    edge_dst = np.zeros((e_pad,), dtype=np.int32)
    edge_feats = np.zeros((e_pad, BOND_DIM), dtype=np.float32)
    edge_mask = np.zeros((e_pad,), dtype=bool)

    n_off = 0
    e_off = 0
    for gid, g in enumerate(graphs):
        n = int(g["node_feats"].shape[0])
        e = int(g["edge_index"].shape[0])
        node_feats[n_off : n_off + n] = g["node_feats"]
        node_mask[n_off : n_off + n] = True
        node_graph[n_off : n_off + n] = gid
        if e:
            ei = np.asarray(g["edge_index"], dtype=np.int32)
            edge_src[e_off : e_off + e] = ei[:, 0] + n_off
            edge_dst[e_off : e_off + e] = ei[:, 1] + n_off
            edge_feats[e_off : e_off + e] = g["edge_feats"]
            edge_mask[e_off : e_off + e] = True
        n_off += n
        e_off += e

    return MolGraphBatch(
        node_feats=jnp.asarray(node_feats),
        node_mask=jnp.asarray(node_mask),
        node_graph=jnp.asarray(node_graph),
        edge_src=jnp.asarray(edge_src),
        edge_dst=jnp.asarray(edge_dst),
        edge_feats=jnp.asarray(edge_feats),
        edge_mask=jnp.asarray(edge_mask),
        num_graphs=len(graphs),
    )


def gather_molecules(store: List[dict], indices: Sequence[int], **kw) -> MolGraphBatch:
    """Batch the molecules at `indices` from a host-side per-drug store
    (the collator path; reference: data.py:888-889)."""
    return pack_molecules([store[int(i)] for i in indices], **kw)
