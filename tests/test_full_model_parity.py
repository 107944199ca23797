"""FULL-MODEL parity: torch fixture of the reference's complete forward
(NovelDDIMultilabel semantics, models.py:717-953 -- per-modality encoders,
boolean-indexed uni/multimodal routing, bottleneck insertion, sinusoidal
positional encoding, x-attn fusion, symmetric bilinear decode) vs our
static-shape masked implementation, weight-for-weight.

This is the closest available stand-in for the BASELINE "per-triple score
parity <= 1e-4 vs the PyTorch reference" check: torchdrug/PyG are not
installed here, so their layers are reconstructed from documented semantics
(independently validated in test_gin / test_hgt / test_chemcpa /
test_fusion against numpy oracles and released checkpoints).
"""
import dataclasses

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from madrigal_tpu.config import (
    ChemCPAConfig,
    EncoderConfig,
    FusionConfig,
    GINConfig,
    HGTConfig,
    MLPEncoderConfig,
    ProjectorConfig,
)
from madrigal_tpu.constants import NUM_CELL_LINES
from madrigal_tpu.data.collate import DDICollator
from madrigal_tpu.data.kg import edge_key
from madrigal_tpu.data.synthetic import make_dataset
from madrigal_tpu.interop.torch_convert import (
    convert_chemcpa,
    convert_gin,
    convert_mlp_encoder,
    convert_transformer_fusion,
)
from madrigal_tpu.models.encoder import MadrigalMultilabel, init_multilabel
from tests.test_fusion import TorchFusionFixture
from tests.test_gin import TorchGINFixture
from tests.test_mlp import torch_mlp_encoder

FEAT = 32
NUM_MOD = 3 + NUM_CELL_LINES
NUM_BT = 2


class TorchHGTFixture(tnn.Module):
    """HGT with parameter names mirroring models/hgt.py (conversion is then
    mechanical); math validated independently in test_hgt."""

    def __init__(self, node_types, edge_types, in_dims, hidden, heads,
                 num_layers, out_dim):
        super().__init__()
        self.node_types = node_types
        self.edge_types = edge_types
        self.heads = heads
        self.hidden = hidden
        self.num_layers = num_layers
        D = hidden // heads
        self.convs = tnn.ModuleList()
        for li in range(num_layers):
            conv = tnn.Module()
            conv.kqv = tnn.ModuleDict({
                nt: tnn.Linear(in_dims[nt] if li == 0 else hidden,
                               3 * hidden)
                for nt in node_types
            })
            conv.k_rel = tnn.ParameterDict({
                edge_key(et): tnn.Parameter(torch.randn(heads, D, D) * 0.2)
                for et in edge_types
            })
            conv.v_rel = tnn.ParameterDict({
                edge_key(et): tnn.Parameter(torch.randn(heads, D, D) * 0.2)
                for et in edge_types
            })
            conv.p_rel = tnn.ParameterDict({
                edge_key(et): tnn.Parameter(torch.ones(heads))
                for et in edge_types
            })
            conv.out = tnn.ModuleDict({
                nt: tnn.Linear(hidden, hidden) for nt in node_types
            })
            conv.skip = tnn.ParameterDict({
                nt: tnn.Parameter(torch.ones(1)) for nt in node_types
            })
            self.convs.append(conv)
        self.lin_drug = tnn.Linear(hidden, out_dim)

    def forward(self, x_dict, edges):
        H = self.heads
        D = self.hidden // H
        x = dict(x_dict)
        for li, conv in enumerate(self.convs):
            k_d, q_d, v_d = {}, {}, {}
            for nt in self.node_types:
                kqv = conv.kqv[nt](x[nt])
                k, q, v = torch.chunk(kqv, 3, dim=-1)
                k_d[nt] = k.reshape(-1, H, D)
                q_d[nt] = q.reshape(-1, H, D)
                v_d[nt] = v.reshape(-1, H, D)
            agg = {nt: [] for nt in self.node_types}
            for et in self.edge_types:
                src_t, _, dst_t = et
                ek = edge_key(et)
                ei = edges[et]
                k_s = torch.einsum("nhd,hde->nhe", k_d[src_t],
                                   conv.k_rel[ek])
                v_s = torch.einsum("nhd,hde->nhe", v_d[src_t],
                                   conv.v_rel[ek])
                src = torch.from_numpy(ei[0]).long()
                dst = torch.from_numpy(ei[1]).long()
                n_dst = x[dst_t].shape[0]
                logits = (q_d[dst_t][dst] * k_s[src]).sum(-1) * \
                    conv.p_rel[ek] / (D ** 0.5)
                # segment softmax over dst
                out = torch.zeros(n_dst, H, D, dtype=logits.dtype)
                for h in range(H):
                    m = torch.full((n_dst,), -torch.inf, dtype=logits.dtype)
                    m = m.scatter_reduce(0, dst, logits[:, h],
                                         reduce="amax", include_self=True)
                    m = torch.where(torch.isfinite(m), m,
                                    torch.zeros_like(m))
                    e = torch.exp(logits[:, h] - m[dst])
                    denom = torch.zeros(n_dst, dtype=e.dtype).index_add_(0, dst, e)
                    denom = torch.clamp(denom, min=1e-16)
                    alpha = e / denom[dst]
                    out[:, h].index_add_(0, dst, alpha[:, None] * v_s[src][:, h])
                agg[dst_t].append(out.reshape(n_dst, self.hidden))
            new_x = {}
            for nt in self.node_types:
                xv = x[nt]
                if not agg[nt]:
                    new_x[nt] = xv
                    continue
                msum = torch.stack(agg[nt]).sum(0)
                o = conv.out[nt](torch.nn.functional.gelu(msum))
                if o.shape[-1] == xv.shape[-1]:
                    gate = torch.sigmoid(conv.skip[nt])
                    o = gate * o + (1 - gate) * xv
                new_x[nt] = o
            x = new_x
            # reference relu placement: none for 2-layer stacks
        return self.lin_drug(x["drug"])


class TorchMadrigalFixture(tnn.Module):
    """Complete reference-forward fixture with boolean-indexed routing."""

    def __init__(self, kg_meta, kg_in_dims, num_labels):
        super().__init__()
        self.str_encoder = TorchGINFixture(dims=(67, FEAT, FEAT))
        self.kg_encoder = TorchHGTFixture(
            kg_meta[0], kg_meta[1], kg_in_dims, hidden=16, heads=4,
            num_layers=2, out_dim=FEAT,
        )
        self.cv_encoder = torch_mlp_encoder(559, (64, 32), FEAT, 0.0, None)
        self.tx_enc_net = torch_mlp_encoder(978, (64,), FEAT, 0.0, None)
        # simple chemCPA: encoder MLP + cov embedding (use_drugs=False)
        self.cov_embedding = tnn.Embedding(NUM_CELL_LINES, FEAT)
        self.tx_bottleneck_tokens = tnn.Parameter(torch.randn(NUM_BT, FEAT))
        self.fusion = TorchFusionFixture(
            FEAT, NUM_BT, nlayers=2, nheads=4, head_dim=8, ffn=64,
            norm_first=True, agg="x-attn",
        )
        self.uni_fuser = torch_mlp_encoder(FEAT, (64, 64), FEAT, 0.0, "ln")
        w = torch.randn(num_labels, FEAT, FEAT) * 0.1
        self.decoder_weight = tnn.Parameter(w)

    def sinusoidal_pe(self, max_len):
        import math

        pe = torch.zeros(max_len, FEAT, dtype=self.tx_bottleneck_tokens.dtype)
        pos = torch.arange(max_len)[:, None].float()
        div = torch.exp(torch.arange(0, FEAT, 2).float() *
                        (-math.log(10000.0) / FEAT))
        pe[:, 0::2] = torch.sin(pos * div)
        pe[:, 1::2] = torch.cos(pos * div)
        return pe[None]

    def encode(self, mols, kg_x, kg_edges, kg_rows, cv, tx_sigs, masks):
        """masks: [B, 19] bool (True = missing). Reference encode()
        semantics (models.py:717-896) with zero-padding for missing KG."""
        x, ei, ef, gids, n_graphs = mols
        str_out = self.str_encoder(x, ei, ef, gids, n_graphs)

        kg_table = self.kg_encoder(kg_x, kg_edges)
        kg_out = torch.zeros(str_out.shape[0], FEAT, dtype=str_out.dtype)
        valid = kg_rows >= 0
        kg_out[valid] = kg_table[kg_rows[valid].long()]

        cv_out = self.cv_encoder(cv)

        C, B, G = tx_sigs.shape
        genes = tx_sigs.reshape(C * B, G)
        lat = self.tx_enc_net(genes)
        cov_idx = torch.arange(C).repeat_interleave(B)
        lat = lat + self.cov_embedding(cov_idx)
        tx_tokens = lat.reshape(C, B, FEAT)

        all_embeds = torch.stack(
            [str_out, kg_out, cv_out] + list(tx_tokens), dim=1
        )

        # boolean-indexed routing (models.py:783-865)
        observed_multi = (~masks).sum(1) > 1
        fusion_seq = all_embeds[observed_multi]
        masks_fusion = masks[observed_multi]

        fusion_seq = torch.cat([
            fusion_seq[:, :3],
            self.tx_bottleneck_tokens[None].repeat(fusion_seq.shape[0], 1, 1),
            fusion_seq[:, 3:],
        ], dim=1)
        bt_mask = torch.zeros(masks_fusion.shape[0], NUM_BT,
                              dtype=torch.bool)
        masks_fusion = torch.cat(
            [masks_fusion[:, :3], bt_mask, masks_fusion[:, 3:]], dim=1
        )
        S = NUM_MOD + NUM_BT
        src_mask = torch.zeros(S, S, dtype=torch.bool)
        src_mask[:3, -NUM_CELL_LINES:] = True
        src_mask[-NUM_CELL_LINES:, :3] = True

        pe = self.sinusoidal_pe(3)  # pos_emb_max_len = non-tx only
        seq = fusion_seq.clone()
        seq[:, :3] += pe[0]
        z_fusion = self.fusion(seq, masks_fusion, src_mask)

        uni_idx = torch.where(~masks[~observed_multi])[1]
        uni_embeds = all_embeds[~observed_multi, uni_idx]
        z_uni = self.uni_fuser(uni_embeds)

        z = torch.empty(all_embeds.shape[0], FEAT, dtype=all_embeds.dtype)
        z[observed_multi] = z_fusion
        z[~observed_multi] = z_uni
        return z

    def decode(self, z1, z2):
        w = self.decoder_weight.triu() + \
            self.decoder_weight.triu(1).transpose(-1, -2)
        return torch.matmul(torch.matmul(z1, w), z2.T)


def _hgt_params_to_flax(tmod: TorchHGTFixture):
    from madrigal_tpu.interop.torch_convert import _dense, _np

    out = {}
    for li, conv in enumerate(tmod.convs):
        layer = {}
        for nt in tmod.node_types:
            layer[f"kqv__{nt}"] = {
                "kernel": conv.kqv[nt].weight.detach().numpy().T,
                "bias": conv.kqv[nt].bias.detach().numpy(),
            }
            layer[f"out__{nt}"] = {
                "kernel": conv.out[nt].weight.detach().numpy().T,
                "bias": conv.out[nt].bias.detach().numpy(),
            }
            layer[f"skip__{nt}"] = conv.skip[nt].detach().numpy()
        for et in tmod.edge_types:
            ek = edge_key(et)
            layer[f"k_rel__{ek}"] = conv.k_rel[ek].detach().numpy()
            layer[f"v_rel__{ek}"] = conv.v_rel[ek].detach().numpy()
            layer[f"p_rel__{ek}"] = conv.p_rel[ek].detach().numpy()
        out[f"conv_{li}"] = layer
    out["lin__drug"] = {
        "kernel": tmod.lin_drug.weight.detach().numpy().T,
        "bias": tmod.lin_drug.bias.detach().numpy(),
    }
    return out


def _cast_float_tree(tree, dtype):
    def cast(x):
        a = np.asarray(x)
        if np.issubdtype(a.dtype, np.floating):
            return jnp.asarray(a.astype(dtype))
        return x

    return jax.tree_util.tree_map(cast, tree)


def _run_full_model_parity(use_x64: bool):
    """use_x64=True runs BOTH sides in float64: the implementations then
    agree to ~1e-10, proving exact MATH parity (the BASELINE <=1e-4
    per-triple target with orders of magnitude to spare). use_x64=False is
    the production-dtype run; its ~1e-3 ceiling is pure f32 rounding of
    two independently-ordered implementations, documented here."""
    torch.manual_seed(7)
    tdtype = torch.float64 if use_x64 else torch.float32
    ndtype = np.float64 if use_x64 else np.float32
    ds = make_dataset(num_drugs=16, num_labels=5, num_edges=24, seed=20)
    # ensure at least one strictly-unimodal drug exercises the uni route
    ds.mod_avail[3, 1:] = 0
    ds.mod_avail[7, 1:] = 0
    coll = DDICollator(ds, split="train")
    batch, kg = coll()

    kg_meta = (tuple(sorted(ds.kg_node_feats)),
               tuple(sorted(ds.kg_edge_indices)))
    kg_in_dims = {k: v.shape[1] for k, v in ds.kg_node_feats.items()}
    tmod = TorchMadrigalFixture(kg_meta, kg_in_dims, num_labels=5)
    tmod.eval()
    tmod.to(tdtype)
    # our 'mlp' tx encoder has no covariate embedding; zero the fixture's so
    # both sides compute the same tx tokens (the chemCPA cov-embedding path
    # is parity-tested separately in test_chemcpa)
    tmod.cov_embedding.weight.data.zero_()

    # ---- torch forward on the head batch
    g = batch.head.mols
    nmask = np.asarray(g.node_mask)
    emask = np.asarray(g.edge_mask)
    mols_t = (
        torch.from_numpy(np.asarray(g.node_feats)[nmask]).to(tdtype),
        torch.from_numpy(
            np.stack([np.asarray(g.edge_src)[emask],
                      np.asarray(g.edge_dst)[emask]], 1)
        ).long(),
        torch.from_numpy(np.asarray(g.edge_feats)[emask]).to(tdtype),
        torch.from_numpy(np.asarray(g.node_graph)[nmask]).long(),
        g.num_graphs,
    )
    kg_x = {k: torch.from_numpy(v).to(tdtype)
            for k, v in ds.kg_node_feats.items()}
    with torch.no_grad():
        z_head_t = tmod.encode(
            mols_t, kg_x, ds.kg_edge_indices,
            torch.from_numpy(np.asarray(batch.head.kg_rows)),
            torch.from_numpy(np.asarray(batch.head.cv)).to(tdtype),
            torch.from_numpy(np.asarray(batch.head.tx_sigs)).to(tdtype),
            torch.from_numpy(np.asarray(batch.head.masks)),
        )
        scores_t = tmod.decode(z_head_t, z_head_t).numpy()

    # ---- convert ALL weights into our model's param tree
    sd = tmod.state_dict()
    gin_sd = {k[len("str_encoder."):].replace(".mlp.", ".mlp.layers."): v
              for k, v in sd.items() if k.startswith("str_encoder.")}
    gin_p, gin_s = convert_gin(gin_sd, num_layers=2, num_mlp_layer=3)
    cv_p, _ = convert_mlp_encoder(
        {f"fc.{k}": v for k, v in tmod.cv_encoder.state_dict().items()},
        (64, 32), 0.0, None,
    )
    fusion_sd = {k[len("fusion."):]: v for k, v in sd.items()
                 if k.startswith("fusion.")}
    fusion_p = convert_transformer_fusion(fusion_sd, num_layers=2,
                                          agg="x-attn")
    uni_fuser_p, _ = convert_mlp_encoder(
        {f"fc.{k}": v for k, v in tmod.uni_fuser.state_dict().items()},
        (64, 64), 0.0, "ln",
    )
    tx_enc_p, _ = convert_mlp_encoder(
        {f"fc.{k}": v for k, v in tmod.tx_enc_net.state_dict().items()},
        (64,), 0.0, None,
    )

    enc_cfg = EncoderConfig(
        feature_dim=FEAT,
        gin=GINConfig(hidden_dims=(FEAT,), num_mlp_layer=3),
        hgt=HGTConfig(hidden_dim=16, num_layers=2, att_heads=4),
        cv=MLPEncoderConfig(hidden_dims=(64, 32), dropout=0.0, norm=None),
        tx_encoder="mlp",
        tx_mlp=MLPEncoderConfig(input_dim=978, hidden_dims=(64,),
                                dropout=0.0, norm=None),
        transformer=FusionConfig(num_layers=2, att_heads=4, head_dim=8,
                                 ffn_dim=64, dropout=0.0, actn="gelu",
                                 norm_first=True, agg="x-attn",
                                 num_tx_bottlenecks=NUM_BT),
        proj=ProjectorConfig(hidden_dims=(64, 64), dropout=0.0, norm="ln"),
        pos_emb_type="sinusoidal",
        pos_emb_dropout=0.0,
    )
    model = MadrigalMultilabel(enc_cfg=enc_cfg, prediction_dim=5)
    variables = init_multilabel(model, jax.random.PRNGKey(0), batch.head,
                                batch.head, kg)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])

    enc = params["encoder"]
    enc["str_encoder"] = gin_p
    enc["kg_encoder"] = _hgt_params_to_flax(tmod.kg_encoder)
    enc["cv_encoder"] = cv_p
    enc["tx_encoder"] = tx_enc_p
    enc["transformer"] = fusion_p
    enc["uni_fuser"] = uni_fuser_p
    enc["tx_bottleneck_tokens"] = tmod.tx_bottleneck_tokens.detach().numpy()
    params["decoder"]["weight"] = tmod.decoder_weight.detach().numpy()
    bstats = dict(variables.get("batch_stats", {}))
    bstats["encoder"] = dict(bstats.get("encoder", {}))
    bstats["encoder"]["str_encoder"] = gin_s

    new_vars = _cast_float_tree(
        {"params": params, "batch_stats": bstats}, ndtype
    )
    head_b = _cast_float_tree(batch.head, ndtype)
    kg_b = _cast_float_tree(kg, ndtype)

    z_j = model.apply(
        new_vars, head_b, kg_b, train=False,
        method=lambda m, b, k, train: m.encoder.encode(b, kg=k, train=train),
    )
    z_atol = 1e-9 if use_x64 else 5e-4
    np.testing.assert_allclose(np.asarray(z_j), z_head_t.numpy(),
                               atol=z_atol, rtol=1e-3)

    scores_j = model.apply(
        new_vars, jnp.asarray(np.asarray(z_j)), jnp.asarray(np.asarray(z_j)),
        method=lambda m, a, b: m.decoder.all_pairs(a, b),
    )
    # per-triple parity over every (label, i, j) entry
    max_abs = float(np.abs(np.asarray(scores_j) - scores_t).max())
    if use_x64:
        # exact math parity: BASELINE's <=1e-4 per-triple target is met
        # with orders of magnitude to spare once rounding is removed
        assert max_abs < 1e-4, max_abs
        np.testing.assert_allclose(np.asarray(scores_j), scores_t,
                                   atol=1e-8, rtol=1e-8)
    else:
        # f32 run: the residual is float32 rounding of two independently
        # ordered implementations (XLA vs torch reduction order), not a
        # math difference -- the f64 run above proves that
        np.testing.assert_allclose(np.asarray(scores_j), scores_t,
                                   atol=1e-3, rtol=1e-3)
        assert max_abs < 1e-3, max_abs


def test_full_model_per_triple_parity():
    _run_full_model_parity(use_x64=False)


@pytest.mark.slow
def test_full_model_per_triple_parity_f64_exact():
    """Both sides in float64: implementations agree to <=1e-8, satisfying
    the BASELINE <=1e-4 per-triple parity target exactly. Slow lane: the
    f32 run above is the fast-lane smoke for this family."""
    jax.config.update("jax_enable_x64", True)
    try:
        _run_full_model_parity(use_x64=True)
    finally:
        jax.config.update("jax_enable_x64", False)
