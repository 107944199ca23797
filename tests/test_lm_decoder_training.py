"""LM-decoder training stack: zero-shot-outcome split, negative table
construction, end-to-end training that generalizes to held-out outcomes
(reference: LM_decoder/train_ddi_mistral.py + data.py 'split_by_classes')."""
import numpy as np
import pandas as pd
import pytest

from madrigal_tpu.train.lm_decoder import (
    LMDecoderTrainer,
    build_lm_table,
    split_by_outcome_classes,
)


def make_edges(rng, num_drugs=20, num_labels=10, n=300):
    return pd.DataFrame({
        "head": rng.randint(0, num_drugs, n),
        "tail": rng.randint(0, num_drugs, n),
        "label_indexed": rng.randint(0, num_labels, n),
    })


def test_split_by_outcome_classes(rng):
    df = make_edges(rng)
    tr, ev, trl, evl = split_by_outcome_classes(df, eval_frac=0.3, seed=1)
    # label partitions are disjoint and cover everything
    assert set(trl) & set(evl) == set()
    assert set(trl) | set(evl) == set(df["label_indexed"])
    assert len(tr) + len(ev) == len(df)
    # zero-shot: no eval outcome appears in the train table
    assert not set(tr["label_indexed"]) & set(evl)
    assert set(ev["label_indexed"]) <= set(evl)


def test_build_lm_table_negatives(rng):
    df = make_edges(rng, n=100)
    table = build_lm_table(df, num_drugs=20, num_neg_per_pos=2, seed=3)
    assert len(table["head"]) == 300  # 100 pos + 200 neg
    assert table["pos_neg"].sum() == 100
    # negatives never collide with a true (head, tail, label) positive
    pos = {(int(h), int(t), int(l)) for h, t, l in
           zip(df["head"], df["tail"], df["label_indexed"])}
    for h, t, l, pn in zip(table["head"], table["tail"], table["label"],
                           table["pos_neg"]):
        if pn == 0:
            assert (int(h), int(t), int(l)) not in pos


def _text_conditional_task(rng, num_drugs=30, num_labels=12, d=16,
                           n_per_label=60):
    """pos_neg = [(z_h + z_t) . text_l > 0]: a rule the head can only learn
    THROUGH the text embedding, so it transfers to unseen outcomes."""
    drug = rng.randn(num_drugs, d).astype(np.float32)
    text = rng.randn(num_labels, d).astype(np.float32)
    rows = {"head": [], "tail": [], "label": [], "pos_neg": []}
    for l in range(num_labels):
        h = rng.randint(0, num_drugs, n_per_label)
        t = rng.randint(0, num_drugs, n_per_label)
        y = ((drug[h] + drug[t]) @ text[l] > 0).astype(np.float32)
        rows["head"].append(h)
        rows["tail"].append(t)
        rows["label"].append(np.full(n_per_label, l))
        rows["pos_neg"].append(y)
    table = {k: np.concatenate(v) for k, v in rows.items()}
    return drug, text, table


def test_lm_trainer_zero_shot_generalization(rng):
    drug, text, table = _text_conditional_task(
        rng, num_labels=18, n_per_label=120)
    # outcomes 0-15 train, 16-17 are zero-shot eval
    is_eval = table["label"] >= 16
    train = {k: v[~is_eval] for k, v in table.items()}
    evalt = {k: v[is_eval] for k, v in table.items()}

    trainer = LMDecoderTrainer(drug, text, project_dim=64, mlp_dim=128,
                               dropout=0.0, self_att=False, lr=3e-3, seed=0)
    first = trainer.train_epoch(train, batch_size=256)
    for _ in range(80):
        last = trainer.train_epoch(train, batch_size=256)
    assert last < first * 0.7, (first, last)

    m = trainer.evaluate(evalt)
    assert m["auroc"] > 0.75, m  # generalizes to never-seen outcomes


def test_lm_trainer_paraphrase_bank(rng):
    drug, text, table = _text_conditional_task(rng, num_labels=6,
                                               n_per_label=30)
    bank = np.stack([text, text + 0.01 * rng.randn(*text.shape)
                     .astype(np.float32)])  # [P=2, L, d]
    trainer = LMDecoderTrainer(drug, bank, project_dim=16, mlp_dim=32,
                               dropout=0.0, self_att=True, lr=3e-3, seed=1)
    loss = trainer.train_epoch(table, batch_size=64)
    assert np.isfinite(loss)
    m = trainer.evaluate(table)  # averages metrics over both variants
    assert np.isfinite(m["auroc"])


def test_lm_trainer_pos_weight(rng):
    drug, text, table = _text_conditional_task(rng, num_labels=4,
                                               n_per_label=20)
    trainer = LMDecoderTrainer(drug, text, project_dim=16, mlp_dim=32,
                               dropout=0.0, self_att=False, lr=1e-3,
                               pos_weight=2.0, seed=2)
    loss = trainer.train_epoch(table, batch_size=32)
    assert np.isfinite(loss)


def test_cli_train_lm_synthetic(tmp_path):
    from madrigal_tpu.cli.train_lm import main

    save = str(tmp_path / "lm_out")
    auroc = main([
        "--synthetic", "--synthetic_drugs", "16", "--synthetic_labels", "8",
        "--synthetic_edges", "60", "--num_epochs", "3",
        "--batch_size", "64", "--lm_dim", "16", "--project_dim", "16",
        "--mlp_dim", "32", "--platform", "cpu", "--save_dir", save,
    ])
    import json
    import os

    assert os.path.exists(os.path.join(save, "lm_decoder", "lm_meta.json"))
    with open(os.path.join(save, "lm_decoder", "lm_meta.json")) as f:
        meta = json.load(f)
    assert set(meta["eval_labels"]) & set(meta["train_labels"]) == set()
    assert np.isfinite(auroc) or np.isnan(auroc)


def test_build_paraphrase_bank_templates():
    """Offline paraphrase bank: [P, L, dim], deterministic templates, each
    variant a distinct rendering of the same outcomes."""
    from madrigal_tpu.models.lm_decoder import (
        PARAPHRASE_TEMPLATES,
        build_paraphrase_bank,
    )

    rendered = []

    def fake_embed(texts):
        rendered.append(list(texts))
        return np.stack([
            np.frombuffer(
                __import__("hashlib").sha256(t.encode()).digest()[:32],
                dtype=np.uint8,
            ).astype(np.float32)
            for t in texts
        ])

    texts = ["nausea", "headache", "qt prolongation"]
    bank = build_paraphrase_bank(texts, num_variants=4, embed_fn=fake_embed)
    assert bank.shape == (4, 3, 32)
    # variant 0 is the raw description; others are template renderings
    assert rendered[0] == texts
    assert rendered[1] == [PARAPHRASE_TEMPLATES[1].format(t) for t in texts]
    # distinct variants embed differently
    assert not np.array_equal(bank[0], bank[1])
    # the bank plugs straight into the trainer's paraphrase path
    drug = np.random.RandomState(0).randn(6, 8).astype(np.float32)
    tr = LMDecoderTrainer(drug, bank, project_dim=8, mlp_dim=16,
                          dropout=0.0, self_att=False, lr=1e-3)
    table = {"head": np.array([0, 1]), "tail": np.array([2, 3]),
             "label": np.array([0, 2]), "pos_neg": np.array([1.0, 0.0],
                                                            np.float32)}
    assert np.isfinite(tr.train_epoch(table, batch_size=2))


def test_lm_table_validation_and_no_holdout(rng):
    drug, text, table = _text_conditional_task(rng, num_labels=4,
                                               n_per_label=10)
    trainer = LMDecoderTrainer(drug, text, project_dim=8, mlp_dim=16,
                               dropout=0.0, self_att=False, lr=1e-3)
    bad = dict(table)
    bad["label"] = np.full_like(table["label"], 7)  # only 4 outcomes exist
    with pytest.raises(ValueError, match="label"):
        trainer.train_epoch(bad, batch_size=8)
    bad2 = dict(table)
    bad2["tail"] = np.full_like(table["tail"], 99)
    with pytest.raises(ValueError, match="tail"):
        trainer.evaluate(bad2)

    # eval_frac=0 -> no zero-shot holdout at all
    df = make_edges(rng, num_labels=5, n=50)
    tr, ev, trl, evl = split_by_outcome_classes(df, eval_frac=0.0)
    assert len(evl) == 0 and len(ev) == 0 and len(tr) == len(df)


def test_build_lm_table_skips_unresolvable_negatives(rng):
    """A head positively paired with every other drug under an outcome
    yields NO negative for those rows (never a false negative)."""
    import pandas as pd

    rows = [(0, t, 0) for t in range(1, 4)]  # drug 0 pairs with all of 1-3
    df = pd.DataFrame(rows, columns=["head", "tail", "label_indexed"])
    table = build_lm_table(df, num_drugs=4, num_neg_per_pos=1, seed=0)
    # 3 positives; negatives can only be... none (cand != 0 and not pos)
    assert table["pos_neg"].sum() == 3
    assert (table["pos_neg"] == 0).sum() == 0
