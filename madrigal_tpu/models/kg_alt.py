"""Alternate KG encoders: HAN and RGCN.

The reference exposes `--kg_encoder han*` (PyG HANConv; reference:
madrigal/models/models.py:41-68) and an RGCN variant (models.py:99-117).

HANConv semantics (PyG): per edge type, GAT-style node-level attention
(separate src/dst attention vectors) produces a per-edge-type dst
embedding; semantic-level attention (q . tanh(W z + b), averaged over
nodes, softmaxed over edge types) mixes them.

RGCN semantics (PyG RGCNConv with bases): per relation r,
W_r = sum_b a_rb B_b; out_v = W_0 x_v + sum_r mean/sum_{e in r, dst=v}
W_r x_src; followed by a per-node-type linear head (HeteroLinear).
"""
from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax.numpy as jnp

from ..config import HANConfig
from ..data.kg import HeteroKGBatch, edge_key
from ..ops.segment import segment_mean, segment_softmax, segment_sum


class HANConv(nn.Module):
    out_channels: int
    heads: int = 4
    negative_slope: float = 0.2
    dropout: float = 0.0

    @nn.compact
    def __call__(self, g: HeteroKGBatch, x_dict, *, train: bool = False):
        H = self.heads
        D = self.out_channels // H
        assert D * H == self.out_channels

        proj = {
            nt: nn.Dense(self.out_channels, name=f"proj__{nt}")(x)
            .reshape(-1, H, D)
            for nt, x in x_dict.items()
        }

        per_type: Dict[str, list] = {nt: [] for nt in x_dict}
        per_type_keys: Dict[str, list] = {nt: [] for nt in x_dict}
        for et in g.metadata.edge_types:
            src_t, _, dst_t = et
            ek = edge_key(et)
            a_src = self.param(f"att_src__{ek}",
                               nn.initializers.glorot_uniform(), (H, D))
            a_dst = self.param(f"att_dst__{ek}",
                               nn.initializers.glorot_uniform(), (H, D))
            src = g.edge_src[ek]
            dst = g.edge_dst[ek]
            mask = g.edge_mask[ek]
            n_dst = g.num_nodes(dst_t)
            logits = (
                jnp.einsum("ehd,hd->eh", proj[src_t][src], a_src)
                + jnp.einsum("ehd,hd->eh", proj[dst_t][dst], a_dst)
            )
            logits = nn.leaky_relu(logits, self.negative_slope)
            dst_safe = jnp.where(mask, dst, n_dst)
            alpha = segment_softmax(logits, dst_safe, n_dst, mask=mask)
            if self.dropout > 0:
                alpha = nn.Dropout(rate=self.dropout,
                                   deterministic=not train,
                                   name=f"drop__{ek}")(alpha)
            out = segment_sum(
                proj[src_t][src] * alpha[..., None], dst_safe, n_dst
            ).reshape(n_dst, self.out_channels)
            per_type[dst_t].append(out)
            per_type_keys[dst_t].append(ek)

        sem_w = nn.Dense(self.out_channels, name="sem_lin")
        sem_q = self.param("sem_q", nn.initializers.normal(stddev=0.1),
                           (self.out_channels,))
        out_dict = {}
        for nt in x_dict:
            if not per_type[nt]:
                out_dict[nt] = jnp.zeros(
                    (x_dict[nt].shape[0], self.out_channels)
                )
                continue
            stacked = jnp.stack(per_type[nt])  # [R, N, F]
            scores = jnp.mean(
                jnp.einsum("rnf,f->rn", nn.tanh(sem_w(stacked)), sem_q),
                axis=1,
            )  # [R]
            beta = nn.softmax(scores)
            out_dict[nt] = jnp.einsum("r,rnf->nf", beta, stacked)
        return out_dict


class HANEncoder(nn.Module):
    """Reference HAN wrapper (models.py:41-68): convs with relu between
    (except after the last), drug-only output linear."""

    cfg: HANConfig
    embed_dim: int

    @nn.compact
    def __call__(self, g: HeteroKGBatch, *, train: bool = False):
        x = dict(g.node_feats)
        for i in range(self.cfg.num_layers):
            x = HANConv(
                out_channels=self.cfg.hidden_dim, heads=self.cfg.att_heads,
                negative_slope=self.cfg.negative_slope,
                dropout=self.cfg.dropout, name=f"conv_{i}",
            )(g, x, train=train)
            if 1 <= i <= self.cfg.num_layers - 2:
                x = {nt: nn.relu(h) for nt, h in x.items()}
        return {"drug": nn.Dense(self.embed_dim, name="lin__drug")(x["drug"])}


class RGCNEncoder(nn.Module):
    """Homogeneous-index RGCN over the flattened heterogeneous graph:
    node/edge types become integer ids (reference models.py:99-117 with
    `Data` input). Works directly on HeteroKGBatch by treating each
    canonical edge type as one relation."""

    hidden_dim: int
    embed_dim: int
    num_layers: int = 2
    num_bases: int = 8
    aggr: str = "mean"
    actn: str = "relu"

    @nn.compact
    def __call__(self, g: HeteroKGBatch, *, train: bool = False):
        from .mlp import activation

        act = activation(self.actn)
        # flatten node types into one arena (ordered by metadata)
        offsets = {}
        total = 0
        feats = []
        for nt in g.metadata.node_types:
            offsets[nt] = total
            total += g.num_nodes(nt)
            feats.append(g.node_feats[nt])
        x = jnp.concatenate(feats, axis=0)

        relations = list(g.metadata.edge_types)
        dims = [x.shape[-1]] + [self.hidden_dim] * self.num_layers
        for li in range(self.num_layers):
            in_dim, out_dim = dims[li], dims[li + 1]
            bases = self.param(
                f"bases_{li}", nn.initializers.glorot_uniform(),
                (self.num_bases, in_dim, out_dim),
            )
            coeffs = self.param(
                f"coeffs_{li}", nn.initializers.glorot_uniform(),
                (len(relations), self.num_bases),
            )
            root = nn.Dense(out_dim, name=f"root_{li}")
            agg = jnp.zeros((total, out_dim))
            for ri, et in enumerate(relations):
                src_t, _, dst_t = et
                ek = edge_key(et)
                w_r = jnp.einsum("b,bio->io", coeffs[ri], bases)
                src = g.edge_src[ek] + offsets[src_t]
                dst = g.edge_dst[ek] + offsets[dst_t]
                mask = g.edge_mask[ek]
                msg = jnp.where(mask[:, None], x[src] @ w_r, 0.0)
                dst_safe = jnp.where(mask, dst, total)
                if self.aggr == "mean":
                    agg = agg + segment_mean(msg, dst_safe, total)
                else:
                    agg = agg + segment_sum(msg, dst_safe, total)
            x = root(x) + agg
            if li < self.num_layers - 1:
                x = act(x)

        # per-node-type output head (HeteroLinear)
        drug_slice = x[offsets["drug"]: offsets["drug"]
                       + g.num_nodes("drug")]
        return {"drug": nn.Dense(self.embed_dim, name="lin__drug")(drug_slice)}
