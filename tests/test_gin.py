"""GIN structure-encoder parity vs a torch fixture implementing the
documented torchdrug GraphIsomorphismConv math, driven by the reference's
real pretrained weights (modality_pretraining/str/GIN_256x4_muv.pt)."""
import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax.numpy as jnp

from madrigal_tpu.constants import BOND_DIM, MOL_DIM
from madrigal_tpu.data.molgraph import pack_molecules
from madrigal_tpu.interop.torch_convert import (
    convert_gin,
    strip_torchdrug_model_prefix,
)
from madrigal_tpu.models.gin import GINEncoder


class TorchGINConvFixture(tnn.Module):
    """torchdrug GraphIsomorphismConv semantics: message = x[src] +
    edge_linear(e); aggregate = scatter-sum on dst; combine =
    relu(BN(MLP((1+eps)x + agg)))."""

    def __init__(self, in_dim, out_dim, num_mlp=3):
        super().__init__()
        self.eps = tnn.Parameter(torch.zeros(1))
        self.edge_linear = tnn.Linear(BOND_DIM, in_dim)
        dims = [in_dim] + [out_dim] * num_mlp
        self.mlp = tnn.ModuleList(
            [tnn.Linear(dims[i], dims[i + 1]) for i in range(num_mlp)]
        )
        self.batch_norm = tnn.BatchNorm1d(out_dim)

    def forward(self, x, edge_index, edge_feats):
        src, dst = edge_index[:, 0], edge_index[:, 1]
        msg = x[src] + self.edge_linear(edge_feats)
        agg = torch.zeros_like(x[:, : msg.shape[1]])
        agg = torch.zeros((x.shape[0], msg.shape[1]), dtype=msg.dtype)
        agg.index_add_(0, dst, msg)
        h = (1 + self.eps) * x + agg
        for i, lin in enumerate(self.mlp):
            h = lin(h)
            if i < len(self.mlp) - 1:
                h = torch.relu(h)
        h = self.batch_norm(h)
        return torch.relu(h)


class TorchGINFixture(tnn.Module):
    def __init__(self, dims=(MOL_DIM, 128, 128, 128, 128)):
        super().__init__()
        self.layers = tnn.ModuleList(
            [TorchGINConvFixture(dims[i], dims[i + 1]) for i in range(len(dims) - 1)]
        )

    def forward(self, x, edge_index, edge_feats, graph_ids, num_graphs):
        for layer in self.layers:
            x = layer(x, edge_index, edge_feats)
        out = torch.zeros((num_graphs, x.shape[1]), dtype=x.dtype)
        out.index_add_(0, graph_ids, x)
        counts = torch.zeros(num_graphs).index_add_(
            0, graph_ids, torch.ones(x.shape[0])
        )
        return out / counts[:, None]


def random_molecule(rng, n_atoms):
    """Random connected-ish graph with both bond directions."""
    node_feats = rng.rand(n_atoms, MOL_DIM).astype(np.float32)
    edges = []
    feats = []
    for i in range(1, n_atoms):
        j = rng.randint(0, i)
        f = rng.rand(BOND_DIM).astype(np.float32)
        edges += [(i, j), (j, i)]
        feats += [f, f]
    return {
        "node_feats": node_feats,
        "edge_index": np.array(edges, dtype=np.int32).reshape(-1, 2),
        "edge_feats": np.array(feats, dtype=np.float32).reshape(-1, BOND_DIM),
    }


def test_gin_parity_with_pretrained_weights(rng):
    sd = torch.load(
        "/root/reference/modality_pretraining/str/GIN_256x4_muv.pt",
        map_location="cpu", weights_only=False,
    )
    sd = strip_torchdrug_model_prefix(sd)

    tmod = TorchGINFixture()
    remap = {}
    for k, v in sd.items():
        k2 = k.replace(".mlp.layers.", ".mlp.")
        remap[k2] = v
    missing = tmod.load_state_dict(remap, strict=False)
    assert not missing.missing_keys, missing.missing_keys
    tmod.eval()

    graphs = [random_molecule(rng, n) for n in (5, 9, 3)]
    batch = pack_molecules(graphs, pad_multiple=32)

    # torch path on the unpadded arena
    all_nodes = np.concatenate([g["node_feats"] for g in graphs])
    offs = np.cumsum([0] + [g["node_feats"].shape[0] for g in graphs][:-1])
    ei = np.concatenate(
        [g["edge_index"] + o for g, o in zip(graphs, offs)]
    )
    ef = np.concatenate([g["edge_feats"] for g in graphs])
    gids = np.concatenate(
        [np.full(g["node_feats"].shape[0], i) for i, g in enumerate(graphs)]
    )
    with torch.no_grad():
        ref = tmod(
            torch.from_numpy(all_nodes),
            torch.from_numpy(ei).long(),
            torch.from_numpy(ef),
            torch.from_numpy(gids).long(),
            len(graphs),
        ).numpy()

    model = GINEncoder()
    params, stats = convert_gin(sd, num_layers=4)
    graph_feat, _ = model.apply(
        {"params": params, "batch_stats": stats}, batch, train=False
    )
    np.testing.assert_allclose(np.asarray(graph_feat), ref, atol=2e-4, rtol=1e-4)


def test_gin_padding_invariance(rng):
    """Graph features must not depend on the padding budget."""
    sd = strip_torchdrug_model_prefix(
        torch.load(
            "/root/reference/modality_pretraining/str/GIN_256x4_muv.pt",
            map_location="cpu", weights_only=False,
        )
    )
    model = GINEncoder()
    params, stats = convert_gin(sd, num_layers=4)
    graphs = [random_molecule(rng, 6), random_molecule(rng, 4)]
    b1 = pack_molecules(graphs, pad_multiple=16)
    b2 = pack_molecules(graphs, pad_multiple=256)
    f1, _ = model.apply({"params": params, "batch_stats": stats}, b1, train=False)
    f2, _ = model.apply({"params": params, "batch_stats": stats}, b2, train=False)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-5)
