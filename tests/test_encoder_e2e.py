"""End-to-end model tests over the synthetic miniature dataset:
full MadrigalMultilabel forward (4 modalities, fusion, bilinear scores),
unimodal-routing semantics, and collator invariants."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from madrigal_tpu.config import (
    ChemCPAConfig,
    EncoderConfig,
    FusionConfig,
    HGTConfig,
    GINConfig,
    MLPEncoderConfig,
    ProjectorConfig,
)
from madrigal_tpu.data.collate import DDICollator
from madrigal_tpu.data.synthetic import make_dataset
from madrigal_tpu.models.encoder import (
    MadrigalEncoder,
    MadrigalMultilabel,
    init_multilabel,
)


def tiny_encoder_cfg(num_bt=2, agg="x-attn", fusion="transformer_uni_proj"):
    return EncoderConfig(
        feature_dim=32,
        gin=GINConfig(hidden_dims=(32, 32), num_mlp_layer=2),
        hgt=HGTConfig(hidden_dim=16, num_layers=2, att_heads=4),
        cv=MLPEncoderConfig(hidden_dims=(64, 32)),
        chemcpa=ChemCPAConfig(dim=32, autoencoder_width=64,
                              autoencoder_depth=2, use_drugs=False),
        transformer=FusionConfig(num_layers=2, att_heads=4, head_dim=16,
                                 ffn_dim=64, dropout=0.1, norm_first=True,
                                 agg=agg, num_tx_bottlenecks=num_bt),
        proj=ProjectorConfig(hidden_dims=(64, 64)),
        pos_emb_type="sinusoidal",
        fusion=fusion,
    )


@pytest.fixture(scope="module")
def ds():
    return make_dataset(num_drugs=20, num_labels=6, num_edges=40, seed=1)


def test_full_model_forward(ds):
    cfg = tiny_encoder_cfg()
    model = MadrigalMultilabel(enc_cfg=cfg, prediction_dim=ds.num_labels)
    coll = DDICollator(ds, split="train")
    batch, kg = coll()

    variables = init_multilabel(
        model, jax.random.PRNGKey(0), batch.head, batch.tail, kg
    )
    scores = model.apply(variables, batch.head, batch.tail, kg, train=False)
    assert scores.shape == (
        ds.num_labels, batch.head.batch_size, batch.tail.batch_size,
    )
    assert np.isfinite(np.asarray(scores)).all()

    # triple-gather path must equal dense fancy-indexing
    trip = model.apply(
        variables, batch.head, batch.tail, kg,
        batch.head_idx, batch.tail_idx, batch.labels,
        train=False, method=MadrigalMultilabel.score_triples,
    )
    dense = np.asarray(scores)[
        np.asarray(batch.labels), np.asarray(batch.head_idx),
        np.asarray(batch.tail_idx),
    ]
    np.testing.assert_allclose(np.asarray(trip), dense, atol=1e-4, rtol=1e-4)


def test_unimodal_routing(ds):
    """Drugs with exactly one modality must take the uni_fuser path: their
    embedding equals uni_fuser(single modality embedding)
    (reference models.py:855-865)."""
    cfg = tiny_encoder_cfg()
    enc = MadrigalEncoder(cfg=cfg)
    coll = DDICollator(ds, split="train")
    batch, kg = coll()

    from madrigal_tpu.models.encoder import init_encoder
    variables = init_encoder(enc, jax.random.PRNGKey(1), batch.head, kg)

    # force str-only masks for every drug
    str_only = np.ones_like(np.asarray(batch.head.masks))
    str_only[:, 0] = False
    import dataclasses
    b_uni = dataclasses.replace(batch.head, masks=jnp.asarray(str_only))
    z = enc.apply(variables, b_uni, kg, train=False)

    # manual: GIN embedding -> uni_fuser
    tokens = enc.apply(
        variables, b_uni, kg, train=False,
        method=lambda m, b, k, train: m.modality_tokens(b, kg=k, train=train),
    )
    z_manual = enc.apply(
        variables, np.asarray(tokens)[:, 0], train=False,
        method=lambda m, x, train: m.uni_fuser(x, train=train),
    )
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_manual), atol=1e-5)


def test_encode_deterministic_eval(ds):
    cfg = tiny_encoder_cfg()
    model = MadrigalMultilabel(enc_cfg=cfg, prediction_dim=ds.num_labels)
    coll = DDICollator(ds, split="train")
    batch, kg = coll()
    variables = init_multilabel(
        model, jax.random.PRNGKey(0), batch.head, batch.tail, kg
    )
    s1 = model.apply(variables, batch.head, batch.tail, kg, train=False)
    s2 = model.apply(variables, batch.head, batch.tail, kg, train=False)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_collator_invariants(ds):
    coll = DDICollator(ds, split="train")
    batch, kg = coll()
    E = len(ds.edge_df)
    # undirected train edges: 2E positives + 4E fixed negatives
    assert batch.labels.shape[0] == 6 * E
    pos = np.asarray(batch.pos_neg)
    assert pos.sum() == 2 * E
    # inverse indices round-trip to global drug ids
    heads_global = np.asarray(batch.head.drugs)[np.asarray(batch.head_idx)]
    df = ds.edge_df
    expected_first = df["head"].values[0]
    assert heads_global[0] == expected_first


def test_on_the_fly_negative_sampling(ds):
    coll = DDICollator(ds, split="train", num_negative_samples_per_pair=2,
                       seed=3)
    batch, _ = coll()
    # sampled negatives must not collide with true triples in either direction
    truths = set()
    for h, t, l in ds.edge_df[["head", "tail", "label_indexed"]].values:
        truths.add((l, h, t))
        truths.add((l, t, h))
    labels = np.asarray(batch.labels)
    pos_neg = np.asarray(batch.pos_neg)
    hg = np.asarray(batch.head.drugs)[np.asarray(batch.head_idx)]
    tg = np.asarray(batch.tail.drugs)[np.asarray(batch.tail_idx)]
    neg_rows = np.nonzero(pos_neg == 0)[0]
    for r in neg_rows:
        assert (labels[r], hg[r], tg[r]) not in truths
        assert hg[r] != tg[r]


@pytest.mark.slow
def test_fusion_batch_chunk_exact():
    """fusion_batch_chunk is numerically exact: per-drug sequences are
    independent through the fusion transformer."""
    import dataclasses

    import jax

    from madrigal_tpu.config import (
        ChemCPAConfig, EncoderConfig, FusionConfig, GINConfig, HGTConfig,
        MLPEncoderConfig, ProjectorConfig,
    )
    from madrigal_tpu.data.collate import DDICollator
    from madrigal_tpu.data.synthetic import make_dataset
    from madrigal_tpu.models.encoder import MadrigalEncoder, init_encoder

    enc = EncoderConfig(
        feature_dim=16,
        gin=GINConfig(hidden_dims=(16, 16), num_mlp_layer=2),
        hgt=HGTConfig(hidden_dim=8, num_layers=2, att_heads=2),
        cv=MLPEncoderConfig(hidden_dims=(32, 16)),
        chemcpa=ChemCPAConfig(dim=16, autoencoder_width=32,
                              autoencoder_depth=1),
        transformer=FusionConfig(num_layers=1, att_heads=2, head_dim=8,
                                 ffn_dim=32, dropout=0.0, norm_first=True,
                                 agg="x-attn", num_tx_bottlenecks=2),
        proj=ProjectorConfig(hidden_dims=(32, 32)),
        pos_emb_type="sinusoidal",
    )
    ds = make_dataset(num_drugs=13, num_labels=4, num_edges=16, seed=4)
    coll = DDICollator(ds, split="train")
    batch = coll.drug_batch(np.arange(13))
    kg = coll.kg_batch()

    m1 = MadrigalEncoder(cfg=enc)
    m2 = MadrigalEncoder(
        cfg=dataclasses.replace(enc, fusion_batch_chunk=5))  # 13 -> 5,5,3
    v = init_encoder(m1, jax.random.PRNGKey(0), batch, kg)
    z1 = m1.apply(v, batch, kg=kg, train=False,
                  method=lambda m, b, kg, train: m.encode(b, kg=kg,
                                                          train=train))
    z2 = m2.apply(v, batch, kg=kg, train=False,
                  method=lambda m, b, kg, train: m.encode(b, kg=kg,
                                                          train=train))
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=1e-6)
