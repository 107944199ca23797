"""Split-family generation + between-split collation + full evaluate_ft
sweep over val/between/within splits + attention capture."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from madrigal_tpu.data.collate import DDICollator
from madrigal_tpu.data.synthetic import make_split_dataset


def test_triplet_splits_partition():
    ds, splits = make_split_dataset(num_drugs=20, num_labels=4,
                                    num_edges=60, seed=13)
    total = sum(len(v) for v in splits.values())
    assert set(splits) == {"train", "val", "test"}
    assert total == 120  # make_split_dataset doubles num_edges
    assert len(splits["train"]) > len(splits["val"])


def test_drug_splits_between_within():
    ds, splits = make_split_dataset(
        num_drugs=24, num_labels=4, num_edges=80,
        split_method="split_by_drugs_random", seed=14,
    )
    between = [k for k in splits if k.endswith("_between")]
    assert between, splits.keys()
    for k in between:
        df = splits[k]
        assert "neg_tail_1" in df.columns and "neg_tail_2" in df.columns
        assert "neg_head" not in df.columns


def test_between_collation_and_eval():
    ds, splits = make_split_dataset(
        num_drugs=24, num_labels=4, num_edges=80,
        split_method="split_by_drugs_random", seed=14,
    )
    between_key = next(k for k in splits if k.endswith("_between"))
    coll = DDICollator(ds, split="val_between")
    batch, kg = coll(splits[between_key])
    # between: positives + 2 corrupted-tail negatives, NOT undirected
    E = len(splits[between_key])
    assert batch.labels.shape[0] == 3 * E
    assert int(np.asarray(batch.pos_neg).sum()) == E


def test_evaluate_ft_between_split():
    from madrigal_tpu.eval.evaluate import Evaluator
    from madrigal_tpu.models.encoder import MadrigalMultilabel, init_multilabel
    from madrigal_tpu.config import (
        ChemCPAConfig, EncoderConfig, FusionConfig, GINConfig, HGTConfig,
        MLPEncoderConfig, ProjectorConfig,
    )

    ds, splits = make_split_dataset(
        num_drugs=24, num_labels=4, num_edges=100,
        split_method="split_by_drugs_random", seed=15,
    )
    enc = EncoderConfig(
        feature_dim=16, gin=GINConfig(hidden_dims=(16, 16), num_mlp_layer=2),
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
    model = MadrigalMultilabel(enc_cfg=enc, prediction_dim=4)
    train_coll = DDICollator(ds, split="train")
    train_batch, kg = train_coll()
    variables = init_multilabel(model, jax.random.PRNGKey(0),
                                train_batch.head, train_batch.tail, kg)

    between_key = next(k for k in splits if k.endswith("_between"))
    bcoll = DDICollator(ds, split="val_between")
    bbatch, _ = bcoll(splits[between_key])
    ev = Evaluator(model, "str_random_sample")
    key = ev.evaluate_ft(variables, bbatch, kg, "val_between",
                         eval_types=["str_full", "str+tx_full", "full_full"])
    assert np.isfinite(key)


def test_attention_capture():
    from madrigal_tpu.models.encoder import MadrigalEncoder, init_encoder
    from madrigal_tpu.config import (
        ChemCPAConfig, EncoderConfig, FusionConfig, GINConfig, HGTConfig,
        MLPEncoderConfig, ProjectorConfig,
    )
    from madrigal_tpu.data.synthetic import make_dataset

    enc_cfg = EncoderConfig(
        feature_dim=16, gin=GINConfig(hidden_dims=(16, 16), num_mlp_layer=2),
        hgt=HGTConfig(hidden_dim=8, num_layers=2, att_heads=2),
        cv=MLPEncoderConfig(hidden_dims=(32, 16)),
        chemcpa=ChemCPAConfig(dim=16, autoencoder_width=32,
                              autoencoder_depth=1),
        transformer=FusionConfig(num_layers=2, att_heads=2, head_dim=8,
                                 ffn_dim=32, dropout=0.0, norm_first=True,
                                 agg="x-attn", num_tx_bottlenecks=2),
        proj=ProjectorConfig(hidden_dims=(32, 32)),
        pos_emb_type="sinusoidal",
    )
    ds = make_dataset(num_drugs=10, num_labels=4, num_edges=14, seed=16)
    coll = DDICollator(ds, split="train")
    batch, kg = coll()
    enc = MadrigalEncoder(cfg=enc_cfg)
    from madrigal_tpu.models.encoder import init_encoder
    variables = init_encoder(enc, jax.random.PRNGKey(0), batch.head, kg)
    z, attn = enc.apply(
        variables, batch.head, kg, train=False, return_attention=True,
        method=lambda m, b, k, train, return_attention: m.encode(
            b, kg=k, train=train, return_attention=return_attention),
    )
    B = batch.head.batch_size
    S = 19 + 2  # modalities + bottlenecks
    assert attn.shape == (B, 2, S, S)  # [B, heads, seq, seq]
    row_sums = np.asarray(attn).sum(-1)
    np.testing.assert_allclose(row_sums, 1.0, atol=1e-5)


def test_save_scores_and_stratified_metrics(tmp_path, rng=np.random.RandomState(5)):
    import pandas as pd

    from madrigal_tpu.eval.evaluate import save_scores_and_stratified_metrics

    T = 120
    preds = rng.rand(T)
    pos_neg = (rng.rand(T) < 0.4).astype(int)
    labels = rng.randint(0, 4, T)
    sp, mp = save_scores_and_stratified_metrics(
        preds, pos_neg, labels, str(tmp_path), "test", "full_full",
        "str_random_sample", label_map={i: f"outcome_{i}" for i in range(4)},
    )
    sdf = pd.read_csv(sp)
    assert len(sdf) == T and set(sdf.columns) == {"pred_score", "pos_neg",
                                                  "label"}
    mdf = pd.read_csv(mp)
    assert len(mdf) == 4
    assert "auprc" in mdf.columns and "pos_samples" in mdf.columns
    assert mdf["label"].tolist() == [f"outcome_{i}" for i in range(4)]


def test_direction_arrays_remap_via_global_ids():
    """Asymmetric val eval types score BOTH directions even when the
    collator deduped head/tail stores separately, by remapping through
    global drug ids (r1 ADVICE: previously silently one-directional)."""
    import dataclasses as dc

    import jax.numpy as jnp

    from madrigal_tpu.data.collate import DDIBatch
    from madrigal_tpu.data.batch import DrugModalityBatch
    from madrigal_tpu.eval.evaluate import _direction_arrays

    def drugs_batch(global_ids):
        n = len(global_ids)
        return DrugModalityBatch(
            drugs=jnp.asarray(global_ids, jnp.int32),
            mols=None, kg_rows=jnp.zeros(n, jnp.int32),
            cv=jnp.zeros((n, 4)), tx_sigs=jnp.zeros((2, n, 4)),
            tx_dosages=jnp.zeros((2, n)),
            masks=jnp.zeros((n, 5), bool),
        )

    # stores share the same drugs but in different orders/dedup
    head_store = [3, 5, 9]
    tail_store = [9, 3, 5]
    batch = DDIBatch(
        head=drugs_batch(head_store), tail=drugs_batch(tail_store),
        head_idx=jnp.asarray([0, 1], jnp.int32),  # drugs 3, 5
        tail_idx=jnp.asarray([0, 2], jnp.int32),  # drugs 9, 5
        labels=jnp.asarray([0, 1], jnp.int32),
        pos_neg=jnp.asarray([1.0, 0.0]),
        mask=jnp.asarray([True, True]),
    )
    hi, ti, lb, pn, m = _direction_arrays("val", "str_full", batch)
    assert len(hi) == 4  # both directions scored
    head_g = np.asarray([head_store[i] for i in hi])
    tail_g = np.asarray([tail_store[i] for i in ti])
    # reverse half swaps the global drug pairs exactly
    np.testing.assert_array_equal(head_g[2:], tail_g[:2])
    np.testing.assert_array_equal(tail_g[2:], head_g[:2])

    # tail store missing a reverse drug -> warning + one direction
    import warnings

    batch2 = dc.replace(batch, tail=drugs_batch([9, 4, 5]),
                        tail_idx=jnp.asarray([0, 2], jnp.int32))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        hi2, *_ = _direction_arrays("val", "str_full", batch2)
    # heads {3,5} not both present in tail store {9,4,5} -> no remap
    assert len(hi2) == 2
    assert any("bidirectional" in str(x.message) for x in w)
