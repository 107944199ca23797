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
from madrigal_tpu.eval.evaluate_pt import (
    evaluate_final_embeds,
    evaluate_pt,
    save_embeds,
)
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


def test_evaluate_final_embeds(setup, tmp_path):
    """End-of-pretraining per-pair alignment table over saved embeds
    (reference evaluate.py:456-504 evaluate_final_embeds flow)."""
    import json
    import os

    ds, coll, kg, apply_fn, variables = setup
    out = save_embeds(
        apply_fn, variables, coll, kg,
        train_drugs=np.arange(14), val_drugs=np.arange(14, 20),
        modality_indices=(0, 1, 2),
    )
    table = evaluate_final_embeds(out, save_dir=str(tmp_path))
    # str (0) is available for every drug; kg/cv partially -> at least the
    # train 0 v {1,2} pairs must exist
    assert any(k.startswith("train 0 v ") for k in table), table.keys()
    for name, row in table.items():
        assert {"alignment", "uniformity_a", "uniformity_b", "foscttm",
                "sample_size", "geomca_precision", "geomca_recall",
                "geomca_network_consistency",
                "geomca_network_quality"} <= set(row), (name, row)
        assert 0.0 <= row["foscttm"] <= 1.0
        assert 0.0 <= row["geomca_precision"] <= 1.0
        assert row["sample_size"] >= 3
    with open(os.path.join(tmp_path, "final_embeds_metrics.json")) as f:
        assert json.load(f).keys() == table.keys()


@pytest.mark.slow
def test_cli_pretrain_final_embeds_eval(tmp_path):
    """--final_embeds_eval runs the save_embeds -> evaluate_final_embeds
    orchestration at the end of cli/pretrain (pretrain.py:260-265)."""
    import os

    from madrigal_tpu.cli.pretrain import main as cl_main

    save = str(tmp_path / "cl")
    cl_main([
        "--synthetic", "--synthetic_drugs", "16", "--synthetic_labels", "4",
        "--synthetic_edges", "16", "--num_steps", "2", "--batch_size", "8",
        "--platform", "cpu", "--save_dir", save, "--final_embeds_eval",
        "--set", "encoder.feature_dim=16",
        "--set", "encoder.gin.hidden_dims=[16,16]",
        "--set", "encoder.gin.num_mlp_layer=2",
        "--set", "encoder.hgt.hidden_dim=8",
        "--set", "encoder.hgt.att_heads=2",
        "--set", "encoder.cv.hidden_dims=[32,16]",
        "--set", "encoder.chemcpa.dim=16",
        "--set", "encoder.chemcpa.autoencoder_width=32",
        "--set", "encoder.chemcpa.autoencoder_depth=1",
        "--set", "encoder.transformer.num_layers=1",
        "--set", "encoder.transformer.att_heads=2",
        "--set", "encoder.transformer.head_dim=8",
        "--set", "encoder.transformer.ffn_dim=32",
        "--set", "encoder.proj.hidden_dims=[32,32]",
    ])
    assert os.path.exists(os.path.join(save, "final_embeds_metrics.json"))
    assert os.path.isdir(os.path.join(save, "final_embeds"))
