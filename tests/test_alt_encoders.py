"""Alternate encoder families: GAT structure encoder, HAN/RGCN KG
encoders, end-to-end through the full model."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from madrigal_tpu.config import (
    ChemCPAConfig,
    EncoderConfig,
    FusionConfig,
    GATConfig,
    GINConfig,
    HANConfig,
    HGTConfig,
    MLPEncoderConfig,
    ProjectorConfig,
    RGCNConfig,
)
from madrigal_tpu.data.collate import DDICollator
from madrigal_tpu.data.synthetic import make_dataset
from madrigal_tpu.models.encoder import MadrigalMultilabel, init_multilabel


@pytest.fixture(scope="module")
def data():
    ds = make_dataset(num_drugs=14, num_labels=4, num_edges=20, seed=8)
    batch, kg = DDICollator(ds, split="train")()
    return ds, batch, kg


def cfg_with(str_enc="gin", kg_enc="hgt"):
    return EncoderConfig(
        feature_dim=16,
        str_encoder=str_enc,
        gin=GINConfig(hidden_dims=(16, 16), num_mlp_layer=2),
        gat=GATConfig(hidden_dims=(16, 16), att_heads=2),
        kg_encoder=kg_enc,
        hgt=HGTConfig(hidden_dim=8, num_layers=2, att_heads=2),
        han=HANConfig(hidden_dim=8, num_layers=1, att_heads=2, dropout=0.0),
        rgcn=RGCNConfig(hidden_dim=8, num_layers=2, num_bases=4),
        cv=MLPEncoderConfig(hidden_dims=(32, 16)),
        chemcpa=ChemCPAConfig(dim=16, autoencoder_width=32,
                              autoencoder_depth=1),
        transformer=FusionConfig(num_layers=1, att_heads=2, head_dim=8,
                                 ffn_dim=32, dropout=0.0, norm_first=True,
                                 agg="x-attn", num_tx_bottlenecks=2),
        proj=ProjectorConfig(hidden_dims=(32, 32)),
        pos_emb_type="sinusoidal",
    )


@pytest.mark.parametrize("str_enc,kg_enc", [
    ("gat", "hgt"), ("gin", "han"), ("gin", "rgcn"),
])
def test_alt_encoder_forward(data, str_enc, kg_enc):
    ds, batch, kg = data
    model = MadrigalMultilabel(enc_cfg=cfg_with(str_enc, kg_enc),
                               prediction_dim=ds.num_labels)
    variables = init_multilabel(model, jax.random.PRNGKey(0), batch.head,
                                batch.tail, kg)
    scores = model.apply(variables, batch.head, batch.tail, kg, train=False)
    assert scores.shape == (ds.num_labels, batch.head.batch_size,
                            batch.tail.batch_size)
    assert np.isfinite(np.asarray(scores)).all()


def test_gat_attention_normalizes(data):
    """Per-destination attention weights sum to 1 over incoming edges."""
    from madrigal_tpu.ops.segment import segment_softmax, segment_sum

    ds, batch, kg = data
    g = batch.head.mols
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(g.num_edges_padded, 2).astype(np.float32))
    n = g.num_nodes_padded
    dst = jnp.where(g.edge_mask, g.edge_dst, n)
    alpha = segment_softmax(logits, dst, n, mask=g.edge_mask)
    sums = segment_sum(alpha, dst, n)
    has_in = np.asarray(segment_sum(
        g.edge_mask.astype(jnp.float32), dst, n)) > 0
    np.testing.assert_allclose(np.asarray(sums)[has_in], 1.0, atol=1e-5)
