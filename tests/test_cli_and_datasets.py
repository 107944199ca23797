"""CLI entry points + reference-format dataset round-trip tests."""
import os

import numpy as np
import pytest

from madrigal_tpu.data.datasets import (
    export_synthetic_as_reference_layout,
    load_reference_dataset,
)
from madrigal_tpu.data.synthetic import make_dataset


def test_reference_layout_roundtrip(tmp_path):
    ds = make_dataset(num_drugs=10, num_labels=4, num_edges=16, seed=7)
    root = str(tmp_path / "data")
    export_synthetic_as_reference_layout(ds, root)
    ds2 = load_reference_dataset(root)
    assert ds2.num_drugs == ds.num_drugs
    assert ds2.num_labels == ds.num_labels
    np.testing.assert_array_equal(ds2.mod_avail, ds.mod_avail)
    np.testing.assert_allclose(ds2.cv_table, ds.cv_table, atol=1e-5)
    np.testing.assert_allclose(ds2.tx_table, ds.tx_table, atol=1e-5)
    np.testing.assert_array_equal(ds2.kg_drug_ids, ds.kg_drug_ids)
    assert set(ds2.kg_edge_indices) == set(ds.kg_edge_indices)
    assert len(ds2.edge_df) == len(ds.edge_df)


def test_directedness_assertion(tmp_path):
    """Loader must reject undirected duplicate edges (data.py:594-596)."""
    import pandas as pd

    ds = make_dataset(num_drugs=10, num_labels=4, num_edges=16, seed=7)
    root = str(tmp_path / "data")
    export_synthetic_as_reference_layout(ds, root)
    p = os.path.join(root, "polypharmacy_new", "TWOSIDES",
                     "split_by_triplets", "train_df.csv")
    df = pd.read_csv(p)
    dup = df.iloc[[0]].rename(
        columns={"head": "tail", "tail": "head"})[df.columns]
    pd.concat([df, dup]).to_csv(p, index=False)
    with pytest.raises(AssertionError):
        load_reference_dataset(root)


TINY_MODEL_FLAGS = [
    "--set", "model.encoder.feature_dim=16",
    "--set", "model.encoder.gin.hidden_dims=[16,16]",
    "--set", "model.encoder.gin.num_mlp_layer=2",
    "--set", "model.encoder.hgt.hidden_dim=8",
    "--set", "model.encoder.hgt.att_heads=2",
    "--set", "model.encoder.cv.hidden_dims=[32,16]",
    "--set", "model.encoder.chemcpa.dim=16",
    "--set", "model.encoder.chemcpa.autoencoder_width=32",
    "--set", "model.encoder.chemcpa.autoencoder_depth=1",
    "--set", "model.encoder.transformer.num_layers=1",
    "--set", "model.encoder.transformer.att_heads=2",
    "--set", "model.encoder.transformer.head_dim=8",
    "--set", "model.encoder.transformer.ffn_dim=32",
    "--set", "model.encoder.transformer.num_tx_bottlenecks=2",
    "--set", "model.encoder.proj.hidden_dims=[32,32]",
    "--set", "model.encoder.pos_emb_type=sinusoidal",
]


def test_cli_train_and_predict(tmp_path):
    from madrigal_tpu.cli.predict import main as predict_main
    from madrigal_tpu.cli.train_ddi import main as train_main

    save = str(tmp_path / "out")
    key = train_main([
        "--synthetic", "--synthetic_drugs", "12", "--synthetic_labels", "4",
        "--synthetic_edges", "16", "--num_epochs", "6",
        "--evaluate_interval", "2", "--warmup_epochs", "1",
        "--save_dir", save, "--platform", "cpu",
    ] + TINY_MODEL_FLAGS)
    assert np.isfinite(key)
    assert os.path.exists(os.path.join(save, "last_model"))
    assert os.path.exists(os.path.join(save, "train_ddi.log"))
    assert os.path.exists(os.path.join(save, "train_ddi_metrics.jsonl"))

    emb_path = str(tmp_path / "z.npy")
    scores = predict_main([
        "--synthetic", "--synthetic_drugs", "12", "--synthetic_labels", "4",
        "--synthetic_edges", "16",
        "--checkpoint", os.path.join(save, "last_model"),
        "--export_embeddings", emb_path,
        "--triples", "0:1:2", "3:4:5", "--platform", "cpu",
    ])
    assert len(scores) == 2 and np.isfinite(scores).all()
    z = np.load(emb_path)
    assert z.shape == (12, 16)


@pytest.mark.slow
def test_cli_resume_mid_run(tmp_path):
    """--resume restores params + optimizer state + epoch and continues to
    num_epochs (reference has no finetune resume at all; pretrain.py:185-194
    pattern applied to stage 3)."""
    import json

    from madrigal_tpu.cli.train_ddi import main as train_main

    save = str(tmp_path / "out")
    common = [
        "--synthetic", "--synthetic_drugs", "12", "--synthetic_labels", "4",
        "--synthetic_edges", "16", "--evaluate_interval", "2",
        "--warmup_epochs", "1", "--save_dir", save, "--platform", "cpu",
    ] + TINY_MODEL_FLAGS
    train_main(common + ["--num_epochs", "5"])
    last = os.path.join(save, "last_model")
    with open(os.path.join(last, "madrigal_meta.json")) as f:
        assert json.load(f)["epoch"] == 5

    key = train_main(common + ["--num_epochs", "8", "--resume", last])
    assert np.isfinite(key)
    with open(os.path.join(last, "madrigal_meta.json")) as f:
        assert json.load(f)["epoch"] == 8
    # metric log shows the resumed run trained epochs 5..7 only
    steps = []
    with open(os.path.join(save, "train_ddi_metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "train_total" in rec:
                steps.append(rec["_step"])
    # run 1 trained epochs 0-4; the resumed run continued at 5 (no repeats)
    assert steps == list(range(8))


@pytest.mark.slow
def test_cli_between_within_sweep_and_early_stop(tmp_path):
    """split_by_drugs produces between/within splits; the eval sweep covers
    them (full SPLIT_EVAL_TYPES per split), tracks best_within, and
    --patience early-stops."""
    from madrigal_tpu.cli.train_ddi import main as train_main

    save = str(tmp_path / "out")
    key = train_main([
        "--synthetic", "--synthetic_drugs", "14", "--synthetic_labels", "4",
        "--synthetic_edges", "40", "--num_epochs", "9",
        "--evaluate_interval", "2", "--warmup_epochs", "1",
        "--split_method", "split_by_drugs_random", "--patience", "1",
        "--save_dir", save, "--platform", "cpu", "--test",
    ] + TINY_MODEL_FLAGS)
    assert np.isfinite(key)
    log = open(os.path.join(save, "train_ddi.log")).read()
    # between/within sweeps ran with their SPLIT_EVAL_TYPES lists
    assert "val_between full_full" in log
    assert "val_between str_full" in log  # between-only eval type
    if "val_within" in log:
        assert "val_within str+tx_str+tx" in log  # within-only eval type


@pytest.mark.slow
def test_cli_modality_pretrain_all_four_then_cl(tmp_path):
    """Stage-1 CLI for each modality exports an encoder checkpoint;
    stage-2 pretrain warm-starts from all four (--modality_ckpts), i.e.
    the full reference flow modality_pretraining/ -> pretrain.py."""
    from madrigal_tpu.cli.modality_pretrain import main as s1_main
    from madrigal_tpu.cli.pretrain import main as cl_main

    save = str(tmp_path / "s1")
    common = [
        "--synthetic", "--synthetic_drugs", "12", "--synthetic_labels", "4",
        "--synthetic_edges", "16", "--num_epochs", "3", "--platform", "cpu",
        "--save_dir", save, "--feature_dim", "16",
    ]
    paths = []
    paths.append(s1_main(common + [
        "--modality", "str", "--num_tasks", "5",
        "--gin_hidden_dims", "16", "16", "--gin_num_mlp_layer", "2"]))
    paths.append(s1_main(common + [
        "--modality", "kg", "--hgt_hidden_dim", "8",
        "--hgt_att_heads", "2"]))
    paths.append(s1_main(common + [
        "--modality", "cv", "--cv_hidden_dims", "32", "16"]))
    paths.append(s1_main(common + [
        "--modality", "tx", "--tx_width", "32", "--tx_depth", "1",
        "--tx_batch_size", "32", "--eval_disentanglement"]))
    for p in paths:
        assert os.path.exists(p), p

    cl_main([
        "--synthetic", "--synthetic_drugs", "12", "--synthetic_labels", "4",
        "--synthetic_edges", "16", "--num_steps", "3", "--batch_size", "8",
        "--platform", "cpu", "--save_dir", str(tmp_path / "s2"),
        "--modality_ckpts", *paths,
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
    assert os.path.exists(str(tmp_path / "s2" / "cl_last"))


def test_set_value_parsing():
    """--set value coercion: Python-style bool/None spellings must not
    fall through as truthy strings (a silent opposite-of-intent for
    `--set encoder.hgt.remat_edge_types=False`)."""
    from madrigal_tpu.cli.common import _parse_value

    assert _parse_value("false") is False
    assert _parse_value("False") is False
    assert _parse_value("TRUE") is True
    assert _parse_value("true") is True
    assert _parse_value("none") is None
    assert _parse_value("null") is None
    assert _parse_value("3") == 3
    assert _parse_value("0.5") == 0.5
    assert _parse_value("[16,16]") == [16, 16]
    assert _parse_value("bfloat16") == "bfloat16"
    assert _parse_value("x-attn") == "x-attn"
