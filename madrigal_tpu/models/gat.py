"""Graph Attention Network structure encoder (alternative to GIN).

The reference exposes `--str_encoder gat` building torchdrug's
GraphAttentionNetwork (reference: madrigal/models/models.py:215,
parse_args.py:23-29: hidden [128,128,128], 4 heads, edge features, mean
readout). Per-layer semantics (GAT v1 with edge-conditioned messages):

  h = W x                       (shared linear, all nodes)
  m_e = h[src_e] + W_e e_e      (edge-conditioned source message)
  logit_e,k = LeakyReLU(a_k . [h[dst_e] || m_e])   (per head k)
  alpha = segment_softmax over dst
  out_v = act(BN?(concat_k sum_e alpha_e,k * m_e,k))

Heads concatenate (output_dim split across heads).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..data.molgraph import MolGraphBatch
from ..ops.segment import segment_mean, segment_softmax, segment_sum
from .mlp import activation
from .norm import MaskedBatchNorm


class GATConv(nn.Module):
    output_dim: int
    num_head: int = 4
    negative_slope: float = 0.2
    batch_norm: bool = False
    actn: str = "relu"

    @nn.compact
    def __call__(self, g: MolGraphBatch, x, *, train: bool = False):
        act = activation(self.actn)
        H = self.num_head
        D = self.output_dim // H
        assert D * H == self.output_dim, "output_dim must divide num_head"

        h = nn.Dense(self.output_dim, name="linear")(x)
        edge_term = nn.Dense(self.output_dim, name="edge_linear")(g.edge_feats)
        msg = h[g.edge_src] + jnp.where(g.edge_mask[:, None], edge_term, 0.0)

        hq = h[g.edge_dst].reshape(-1, H, D)
        mk = msg.reshape(-1, H, D)
        att = self.param(
            "att", nn.initializers.glorot_uniform(), (H, 2 * D)
        )
        logits = jnp.einsum(
            "ehd,hd->eh", jnp.concatenate([hq, mk], axis=-1), att
        )
        logits = nn.leaky_relu(logits, negative_slope=self.negative_slope)

        n = g.num_nodes_padded
        dst = jnp.where(g.edge_mask, g.edge_dst, n)
        alpha = segment_softmax(logits, dst, n, mask=g.edge_mask)
        out = segment_sum(mk * alpha[..., None], dst, n).reshape(
            n, self.output_dim
        )
        if self.batch_norm:
            out = MaskedBatchNorm(name="bn")(out, mask=g.node_mask,
                                             train=train)
        return act(out)


class GATEncoder(nn.Module):
    """Stacked GAT with mean/sum readout; hidden_dims includes the final
    embed dim (reference models.py:215 appends embed_dim)."""

    hidden_dims: Sequence[int] = (128, 128, 128, 128)
    num_head: int = 4
    negative_slope: float = 0.2
    batch_norm: bool = False
    actn: str = "relu"
    readout: str = "mean"

    @nn.compact
    def __call__(self, g: MolGraphBatch, *, train: bool = False):
        x = g.node_feats
        for i, dim in enumerate(self.hidden_dims):
            x = GATConv(
                output_dim=dim, num_head=self.num_head,
                negative_slope=self.negative_slope,
                batch_norm=self.batch_norm, actn=self.actn,
                name=f"layer_{i}",
            )(g, x, train=train)
        x = jnp.where(g.node_mask[:, None], x, 0.0)
        seg = jnp.where(g.node_graph < g.num_graphs, g.node_graph,
                        g.num_graphs)
        if self.readout == "mean":
            gf = segment_mean(x, seg, g.num_graphs)
        elif self.readout == "sum":
            gf = segment_sum(x, seg, g.num_graphs)
        else:
            raise NotImplementedError(self.readout)
        return gf, x
