"""Key-exact torch replicas of PyG's HGTConv, both API generations.

PyG itself is not installable in this environment, so these modules are the
executable specification of the checkpoint layouts that
`interop.convert_checkpoint.convert_hgt_pyg23` / `convert_hgt_pyg22`
decode. Each replica:

  * registers parameters under the EXACT state_dict key names the real PyG
    version produces (asserted in tests -- drift in either the replica or
    the converter's layout assumptions fails the key-set check), and
  * implements the corresponding forward semantics
    (2.3.x: one softmax over all incoming edges of a destination node
     across edge types -- hgt_conv.py's single bipartite propagate;
     <=2.2: per-edge-type softmax, then group aggregation).

Sources: torch_geometric 2.3.x nn/conv/hgt_conv.py (HeteroDictLinear
kqv_lin/out_lin, HeteroLinear k_rel/v_rel with type index
head * num_edge_types + edge_type, p_rel [1, H]); torch_geometric <=2.2
hgt_conv.py (k/q/v/a_lin ModuleDicts, a_rel/m_rel/p_rel ParameterDicts).
"""
from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as TF


def _segment_softmax(logits: torch.Tensor, index: torch.Tensor,
                     n: int) -> torch.Tensor:
    """softmax(logits) grouped by index (PyG's torch_geometric.utils
    softmax), numerically stabilized per group."""
    out = torch.zeros_like(logits)
    for node in range(n):
        sel = index == node
        if not sel.any():
            continue
        l = logits[sel]
        e = torch.exp(l - l.max(dim=0, keepdim=True).values)
        out[sel] = e / e.sum(dim=0, keepdim=True)
    return out


class HGTConvPyG23(nn.Module):
    """PyG 2.3.x HGTConv replica (post segment-matmul rewrite)."""

    def __init__(self, in_channels: int, out_channels: int, metadata,
                 heads: int):
        super().__init__()
        node_types, edge_types = metadata
        self.node_types = list(node_types)
        self.edge_types = [tuple(e) for e in edge_types]
        self.heads = heads
        self.out_channels = out_channels
        F, H = out_channels, heads
        D = F // H
        R = len(self.edge_types)

        # HeteroDictLinear: container module 'lins' holding one Linear per
        # type -> keys kqv_lin.lins.{nt}.weight/bias
        self.kqv_lin = nn.Module()
        self.kqv_lin.lins = nn.ModuleDict(
            {nt: nn.Linear(in_channels, 3 * F) for nt in self.node_types}
        )
        self.out_lin = nn.Module()
        self.out_lin.lins = nn.ModuleDict(
            {nt: nn.Linear(F, F) for nt in self.node_types}
        )
        # HeteroLinear: weight [num_types, in, out], applied x @ weight[t];
        # num_types = heads * num_edge_types, type = h * R + e
        self.k_rel = nn.Module()
        self.k_rel.weight = nn.Parameter(torch.randn(H * R, D, D) * 0.3)
        self.v_rel = nn.Module()
        self.v_rel.weight = nn.Parameter(torch.randn(H * R, D, D) * 0.3)
        self.skip = nn.ParameterDict(
            {nt: nn.Parameter(torch.randn(1)) for nt in self.node_types}
        )
        self.p_rel = nn.ParameterDict(
            {"__".join(et): nn.Parameter(torch.randn(1, H) * 0.5 + 1.0)
             for et in self.edge_types}
        )

    @torch.no_grad()
    def forward(self, x_dict, edge_index_dict):
        F, H = self.out_channels, self.heads
        D = F // H
        R = len(self.edge_types)

        k_dict, q_dict, v_dict = {}, {}, {}
        for nt, x in x_dict.items():
            kqv = self.kqv_lin.lins[nt](x)
            k, q, v = torch.tensor_split(kqv, 3, dim=1)
            k_dict[nt] = k.view(-1, H, D)
            q_dict[nt] = q.view(-1, H, D)
            v_dict[nt] = v.view(-1, H, D)

        # one bipartite propagate: per dst type, concat all edge types'
        # (transformed k/v, p_rel-scaled logits), one softmax per dst node
        per_dst = {nt: {"logits": [], "v": [], "dst": []}
                   for nt in self.node_types}
        for et, ei in edge_index_dict.items():
            et = tuple(et)
            src_t, _, dst_t = et
            e_idx = self.edge_types.index(et)
            # HeteroLinear with type = h * R + e: x @ weight[type]
            k_w = self.k_rel.weight[torch.arange(H) * R + e_idx]  # [H, D, D]
            v_w = self.v_rel.weight[torch.arange(H) * R + e_idx]
            k_s = torch.einsum("nhd,hde->nhe", k_dict[src_t], k_w)
            v_s = torch.einsum("nhd,hde->nhe", v_dict[src_t], v_w)
            src = torch.as_tensor(ei[0], dtype=torch.long)
            dst = torch.as_tensor(ei[1], dtype=torch.long)
            p = self.p_rel["__".join(et)].view(H)
            logits = (q_dict[dst_t][dst] * k_s[src]).sum(-1) * p \
                / math.sqrt(D)
            per_dst[dst_t]["logits"].append(logits)
            per_dst[dst_t]["v"].append(v_s[src])
            per_dst[dst_t]["dst"].append(dst)

        out_dict = {}
        for nt, x in x_dict.items():
            if not per_dst[nt]["logits"]:
                out_dict[nt] = x
                continue
            logits = torch.cat(per_dst[nt]["logits"])
            vals = torch.cat(per_dst[nt]["v"])
            dst = torch.cat(per_dst[nt]["dst"])
            n = x.shape[0]
            alpha = _segment_softmax(logits, dst, n)
            msg = vals * alpha.unsqueeze(-1)
            agg = torch.zeros(n, H, D)
            agg.index_add_(0, dst, msg)
            out = self.out_lin.lins[nt](TF.gelu(agg.reshape(n, F)))
            if out.shape[-1] == x.shape[-1]:
                a = torch.sigmoid(self.skip[nt])
                out = a * out + (1 - a) * x
            out_dict[nt] = out
        return out_dict


class HGTConvPyG22(nn.Module):
    """PyG <=2.2 HGTConv replica (the group='sum' API generation)."""

    def __init__(self, in_channels: int, out_channels: int, metadata,
                 heads: int, group: str = "sum"):
        super().__init__()
        node_types, edge_types = metadata
        self.node_types = list(node_types)
        self.edge_types = [tuple(e) for e in edge_types]
        self.heads = heads
        self.out_channels = out_channels
        self.group = group
        F, H = out_channels, heads
        D = F // H

        self.k_lin = nn.ModuleDict(
            {nt: nn.Linear(in_channels, F) for nt in self.node_types})
        self.q_lin = nn.ModuleDict(
            {nt: nn.Linear(in_channels, F) for nt in self.node_types})
        self.v_lin = nn.ModuleDict(
            {nt: nn.Linear(in_channels, F) for nt in self.node_types})
        self.a_lin = nn.ModuleDict(
            {nt: nn.Linear(F, F) for nt in self.node_types})
        self.skip = nn.ParameterDict(
            {nt: nn.Parameter(torch.randn(1)) for nt in self.node_types})
        self.a_rel = nn.ParameterDict(
            {"__".join(et): nn.Parameter(torch.randn(H, D, D) * 0.3)
             for et in self.edge_types})
        self.m_rel = nn.ParameterDict(
            {"__".join(et): nn.Parameter(torch.randn(H, D, D) * 0.3)
             for et in self.edge_types})
        self.p_rel = nn.ParameterDict(
            {"__".join(et): nn.Parameter(torch.randn(H) * 0.5 + 1.0)
             for et in self.edge_types})

    @torch.no_grad()
    def forward(self, x_dict, edge_index_dict):
        F, H = self.out_channels, self.heads
        D = F // H

        k_dict, q_dict, v_dict = {}, {}, {}
        for nt, x in x_dict.items():
            k_dict[nt] = self.k_lin[nt](x).view(-1, H, D)
            q_dict[nt] = self.q_lin[nt](x).view(-1, H, D)
            v_dict[nt] = self.v_lin[nt](x).view(-1, H, D)

        agg = {nt: [] for nt in self.node_types}
        for et, ei in edge_index_dict.items():
            et = tuple(et)
            src_t, _, dst_t = et
            ek = "__".join(et)
            k_s = torch.einsum("nhd,hde->nhe", k_dict[src_t],
                               self.a_rel[ek])
            v_s = torch.einsum("nhd,hde->nhe", v_dict[src_t],
                               self.m_rel[ek])
            src = torch.as_tensor(ei[0], dtype=torch.long)
            dst = torch.as_tensor(ei[1], dtype=torch.long)
            logits = (q_dict[dst_t][dst] * k_s[src]).sum(-1) \
                * self.p_rel[ek] / math.sqrt(D)
            n = x_dict[dst_t].shape[0]
            alpha = _segment_softmax(logits, dst, n)  # per edge type
            msg = v_s[src] * alpha.unsqueeze(-1)
            out = torch.zeros(n, H, D)
            out.index_add_(0, dst, msg)
            agg[dst_t].append(out.reshape(n, F))

        out_dict = {}
        for nt, x in x_dict.items():
            if not agg[nt]:
                out_dict[nt] = x
                continue
            stacked = torch.stack(agg[nt])
            m = {"sum": stacked.sum(0), "mean": stacked.mean(0),
                 "max": stacked.max(0).values}[self.group]
            out = self.a_lin[nt](TF.gelu(m))
            if out.shape[-1] == x.shape[-1]:
                a = torch.sigmoid(self.skip[nt])
                out = a * out + (1 - a) * x
            out_dict[nt] = out
        return out_dict


class HGTPyGReplica(nn.Module):
    """The reference's HGT wrapper (models.py:71-96): conv stack + relu
    between inner convs + per-node-type output Linear."""

    def __init__(self, in_channels, hidden, out_channels, num_layers, heads,
                 metadata, conv_cls):
        super().__init__()
        self.convs = nn.ModuleList(
            [conv_cls(in_channels if i == 0 else hidden, hidden, metadata,
                      heads) for i in range(num_layers)]
        )
        self.lin_dict = nn.ModuleDict(
            {nt: nn.Linear(hidden, out_channels) for nt in metadata[0]}
        )

    @torch.no_grad()
    def forward(self, x_dict, edge_index_dict):
        out = self.convs[0](x_dict, edge_index_dict)
        for i in range(1, len(self.convs)):
            out = self.convs[i](out, edge_index_dict)
            if i < len(self.convs) - 1:
                out = {nt: torch.relu(x) for nt, x in out.items()}
        return {nt: self.lin_dict[nt](x) for nt, x in out.items()}


def expected_pyg23_keys(node_types, edge_types, num_layers):
    """The exact state_dict key set a real PyG 2.3.x HGT stack produces."""
    keys = set()
    for i in range(num_layers):
        for nt in node_types:
            keys |= {
                f"convs.{i}.kqv_lin.lins.{nt}.weight",
                f"convs.{i}.kqv_lin.lins.{nt}.bias",
                f"convs.{i}.out_lin.lins.{nt}.weight",
                f"convs.{i}.out_lin.lins.{nt}.bias",
                f"convs.{i}.skip.{nt}",
            }
        keys |= {f"convs.{i}.k_rel.weight", f"convs.{i}.v_rel.weight"}
        for et in edge_types:
            keys.add(f"convs.{i}.p_rel.{'__'.join(et)}")
    for nt in node_types:
        keys |= {f"lin_dict.{nt}.weight", f"lin_dict.{nt}.bias"}
    return keys


def expected_pyg22_keys(node_types, edge_types, num_layers):
    keys = set()
    for i in range(num_layers):
        for nt in node_types:
            for lin in ("k_lin", "q_lin", "v_lin", "a_lin"):
                keys |= {f"convs.{i}.{lin}.{nt}.weight",
                         f"convs.{i}.{lin}.{nt}.bias"}
            keys.add(f"convs.{i}.skip.{nt}")
        for et in edge_types:
            ek = "__".join(et)
            keys |= {f"convs.{i}.a_rel.{ek}", f"convs.{i}.m_rel.{ek}",
                     f"convs.{i}.p_rel.{ek}"}
    for nt in node_types:
        keys |= {f"lin_dict.{nt}.weight", f"lin_dict.{nt}.bias"}
    return keys
