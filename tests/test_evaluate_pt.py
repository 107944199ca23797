"""CL-pretraining evaluation orchestration tests."""
import numpy as np
import pytest

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
from madrigal_tpu.data.collate import DDICollator
from madrigal_tpu.data.synthetic import make_dataset
from madrigal_tpu.eval.evaluate_pt import evaluate_pt, save_embeds
from madrigal_tpu.models.encoder import MadrigalEncoder, init_encoder


@pytest.fixture(scope="module")
def setup():
    enc_cfg = EncoderConfig(
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
    ds = make_dataset(num_drugs=20, num_labels=4, num_edges=20, seed=40)
    coll = DDICollator(ds, split="train")
    kg = coll.kg_batch()
    enc = MadrigalEncoder(cfg=enc_cfg)
    batch = coll.drug_batch(np.arange(8))
    variables = init_encoder(enc, jax.random.PRNGKey(0), batch, kg)

    def apply_fn(variables, batch, kg, raw):
        return enc.apply(
            variables, batch, kg, train=False, raw_encoder_output=raw,
            method=lambda m, b, k, train, raw_encoder_output: m.encode(
                b, kg=k, train=train, raw_encoder_output=raw_encoder_output),
        )

    return ds, coll, kg, apply_fn, variables


def test_evaluate_pt_metrics(setup):
    ds, coll, kg, apply_fn, variables = setup
    metrics = evaluate_pt(
        apply_fn, variables, coll, kg, np.arange(ds.num_drugs),
        modality_indices=(0, 1, 2), topk=(1, 5),
    )
    # str always available; kg/cv partially -> str-kg and str-cv pairs exist
    assert any(k.startswith("top1_0_") for k in metrics)
    assert any(k.startswith("foscttm_") for k in metrics)
    for k, v in metrics.items():
        if k.startswith("top"):
            assert 0.0 <= v <= 1.0, (k, v)


def test_save_embeds(setup, tmp_path):
    import os

    ds, coll, kg, apply_fn, variables = setup
    out = save_embeds(
        apply_fn, variables, coll, kg,
        train_drugs=np.arange(12), val_drugs=np.arange(12, 20),
        save_dir=str(tmp_path), modality_indices=(0, 2),
    )
    assert "0" in out["train"]
    z = out["train"]["0"]["embeds"]
    assert z.shape == (12, 16)  # str available for every drug
    files = os.listdir(tmp_path)
    assert "train_embeds_0.npz" in files
    loaded = np.load(tmp_path / "train_embeds_0.npz")
    np.testing.assert_array_equal(loaded["embeds"], z)
