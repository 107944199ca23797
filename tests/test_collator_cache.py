"""Collator device-table memo + build_kg gating + the --synthetic_scale
CLI path (VERDICT r4 items 1-2, ADVICE r4 items 1-2).

At reference scale each split's collator used to pin its OWN copy of the
full modality tables (tx alone ~0.4 GB) plus a redundant full-KG arena in
HBM -- enough to OOM the production finetune recipe. The fix is
(a) `build_kg=False` (eval/test score against the train collator's KG) and
(b) one shared `drug_table_cache` + `full_drug_table=True` so every
split's head AND tail batch alias one device copy of the tables.
"""
import os

import numpy as np
import pytest

from madrigal_tpu.data.collate import DDICollator
from madrigal_tpu.data.synthetic import make_dataset, make_split_dataset


def test_build_kg_false_returns_none():
    ds = make_dataset(num_drugs=10, num_labels=4, num_edges=16, seed=0)
    coll = DDICollator(ds, split="train", seed=0)
    batch, kg = coll(build_kg=False)
    assert kg is None
    assert batch.labels.shape[0] > 0
    # default still builds
    _, kg2 = coll()
    assert kg2 is not None


def test_build_kg_false_batch_identical():
    """build_kg only gates the KG slot; the DDIBatch is unchanged."""
    ds = make_dataset(num_drugs=10, num_labels=4, num_edges=16, seed=0)
    a, _ = DDICollator(ds, split="train", seed=0)(build_kg=False)
    b, _ = DDICollator(ds, split="train", seed=0)()
    np.testing.assert_array_equal(a.labels, b.labels)
    np.testing.assert_array_equal(a.head_idx, b.head_idx)
    np.testing.assert_array_equal(
        np.asarray(a.head.drugs), np.asarray(b.head.drugs))


def test_shared_cache_one_table_across_splits():
    """full_drug_table + one cache dict => train head, train tail, and
    every eval split's head/tail are the SAME DrugModalityBatch object
    (one HBM copy per run)."""
    ds, splits = make_split_dataset(
        num_drugs=16, num_labels=4, num_edges=60,
        split_method="split_by_triplets", seed=3)
    cache = {}
    train = DDICollator(ds, split="train", seed=0, drug_table_cache=cache,
                        full_drug_table=True)
    tb, kg = train()
    assert tb.head is tb.tail  # same cache entry, not just equal
    val_df = splits["val"]
    vcoll = DDICollator(ds, split="val", seed=0, drug_table_cache=cache,
                        full_drug_table=True)
    vb, vkg = vcoll(val_df, build_kg=False)
    assert vkg is None
    assert vb.head is tb.head and vb.tail is tb.head
    assert len(cache) == 1


def test_full_drug_table_structurally_identical():
    """The full-table layout maps each triple to the same global drugs
    as the unique layout (numerics follow: the encoder is per-drug)."""
    ds = make_dataset(num_drugs=12, num_labels=4, num_edges=20, seed=1)
    a, _ = DDICollator(ds, split="train", seed=0)(build_kg=False)
    b, _ = DDICollator(ds, split="train", seed=0,
                       full_drug_table=True)(build_kg=False)
    ah = np.asarray(a.head.drugs)[np.asarray(a.head_idx)]
    bh = np.asarray(b.head.drugs)[np.asarray(b.head_idx)]
    at = np.asarray(a.tail.drugs)[np.asarray(a.tail_idx)]
    bt = np.asarray(b.tail.drugs)[np.asarray(b.tail_idx)]
    m = np.asarray(a.mask)
    np.testing.assert_array_equal(ah[m], bh[m])
    np.testing.assert_array_equal(at[m], bt[m])
    np.testing.assert_array_equal(a.labels, b.labels)
    np.testing.assert_array_equal(a.pos_neg, b.pos_neg)
    assert np.asarray(b.head.drugs).shape[0] == ds.num_drugs


def test_cache_key_includes_pack_budgets():
    """Two collators sharing one cache with different molecule budgets
    must not alias entries (ADVICE r4 item 2)."""
    ds = make_dataset(num_drugs=8, num_labels=4, num_edges=12, seed=2)
    cache = {}
    ids = np.arange(8)
    small = DDICollator(ds, split="train", seed=0, drug_table_cache=cache,
                        node_budget=256, edge_budget=512)
    big = DDICollator(ds, split="train", seed=0, drug_table_cache=cache,
                      node_budget=512, edge_budget=1024)
    a = small.drug_batch(ids)
    b = big.drug_batch(ids)
    assert len(cache) == 2
    assert (a.mols.node_feats.shape[0] == 256
            and b.mols.node_feats.shape[0] == 512)
    # same collator, same ids -> cache hit
    assert small.drug_batch(ids) is a


def test_cli_synthetic_scale_shrunk(tmp_path):
    """The reference-scale CLI path (--synthetic_scale) on a
    shrunken-but-proportional dataset, INCLUDING one eval-cadence epoch
    (the production acceptance config that used to OOM), so the round-5
    headline path can't regress silently (VERDICT r4 item 2)."""
    from tests.test_cli_and_datasets import TINY_MODEL_FLAGS

    from madrigal_tpu.cli.train_ddi import main as train_main

    save = str(tmp_path / "out")
    key = train_main([
        "--synthetic_scale", "--synthetic_scale_shrink", "600",
        "--finetune_mode", "full_full", "--eval_types", "full_full",
        "--num_epochs", "3", "--evaluate_interval", "2",
        "--warmup_epochs", "1", "--label_chunk", "8",
        "--kg_chunk", "2", "--save_dir", save, "--platform", "cpu",
    ] + TINY_MODEL_FLAGS)
    assert np.isfinite(key)
    assert os.path.exists(os.path.join(save, "best_model"))
    # the eval sweep ran on held-out rows and logged its key metric
    import json

    recs = [json.loads(line) for line in
            open(os.path.join(save, "train_ddi_metrics.jsonl"))]
    assert any("val_key_auprc" in r for r in recs)
    assert any("train_total" in r for r in recs)
