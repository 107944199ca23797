"""Modality-ablation study (eval/ablation.py) — the fig2 notebook core:
mask mutation, per-label ablation tables, paired Wilcoxon comparisons,
drug-specific score rows."""
import numpy as np
import pytest

import jax

from madrigal_tpu.config import (
    ChemCPAConfig,
    EncoderConfig,
    FusionConfig,
    GINConfig,
    HGTConfig,
    MLPEncoderConfig,
    ProjectorConfig,
)
from madrigal_tpu.constants import NON_TX_MODALITIES, NUM_MODALITIES
from madrigal_tpu.data.collate import DDICollator
from madrigal_tpu.data.synthetic import make_dataset
from madrigal_tpu.eval.ablation import (
    compare_ablations,
    default_modality_combos,
    drug_specific_values,
    force_modality_masks,
    full_modality_drugs,
    modality_ablation_study,
)
from madrigal_tpu.eval.predict import make_predictions
from madrigal_tpu.models.encoder import MadrigalMultilabel, init_multilabel

N_TX = NUM_MODALITIES - len(NON_TX_MODALITIES)


def test_force_modality_masks():
    base = np.zeros((5, NUM_MODALITIES), bool)
    base[1, 0] = True  # drug 1 is missing str already

    m = force_modality_masks(base, ["str", "kg"])
    assert not m[:, 1].any()  # kg stays available
    assert m[:, 2].all()  # cv forced off everywhere
    assert m[:, len(NON_TX_MODALITIES):].all()  # all tx columns off
    assert m[1, 0]  # pre-existing missingness preserved
    assert not m[0, 0]

    # subset: only drugs 0 and 2 are mutated
    m = force_modality_masks(base, ["str"], drug_subset=[0, 2])
    assert m[0, 1] and m[2, 1] and not m[3, 1]
    # input never modified in place
    assert not base[:, 2].any()

    with pytest.raises(ValueError):
        force_modality_masks(base, ["str", "bogus"])


def test_full_modality_drugs():
    masks = np.zeros((4, NUM_MODALITIES), bool)
    masks[1, 2] = True  # missing cv
    masks[2, len(NON_TX_MODALITIES):] = True  # ALL tx cell lines missing
    masks[3, len(NON_TX_MODALITIES)] = True  # one tx line missing: still ok
    np.testing.assert_array_equal(full_modality_drugs(masks), [0, 3])


def test_default_modality_combos():
    combos = default_modality_combos()
    assert len(combos) == 15  # non-empty subsets of 4 modalities
    assert combos[0] == (NON_TX_MODALITIES[0],)
    assert combos[-1] == tuple(NON_TX_MODALITIES) + ("tx",)
    assert all(len(c) <= 2 for c in default_modality_combos(max_size=2))


@pytest.fixture(scope="module")
def setup():
    enc = EncoderConfig(
        feature_dim=16,
        gin=GINConfig(hidden_dims=(16, 16), num_mlp_layer=2),
        hgt=HGTConfig(hidden_dim=8, num_layers=2, att_heads=2),
        cv=MLPEncoderConfig(hidden_dims=(32, 16)),
        chemcpa=ChemCPAConfig(dim=16, autoencoder_width=32,
                              autoencoder_depth=1),
        transformer=FusionConfig(num_layers=1, att_heads=2, head_dim=8,
                                 ffn_dim=32, dropout=0.1, norm_first=True,
                                 agg="x-attn", num_tx_bottlenecks=2),
        proj=ProjectorConfig(hidden_dims=(32, 32)),
        pos_emb_type="sinusoidal",
    )
    ds = make_dataset(num_drugs=18, num_labels=6, num_edges=30, seed=5)
    coll = DDICollator(ds, split="train")
    batch, kg = coll()
    model = MadrigalMultilabel(enc_cfg=enc, prediction_dim=6)
    variables = init_multilabel(model, jax.random.PRNGKey(0), batch.head,
                                batch.tail, kg)
    return batch, kg, model, variables


def test_modality_ablation_study(setup):
    batch, kg, model, variables = setup
    table = modality_ablation_study(
        model, variables, batch, kg, "full_full",
        combos=[("str",), ("str", "kg"),
                tuple(NON_TX_MODALITIES) + ("tx",)],
    )
    assert set(table) == {"str", "str+kg",
                          "+".join(NON_TX_MODALITIES) + "+tx"}
    n_labels = len(table["str"]["labels"])
    for row in table.values():
        assert row["auprc"].shape == (n_labels,)
        finite = row["auprc"][np.isfinite(row["auprc"])]
        assert ((finite >= 0) & (finite <= 1)).all()

    # keeping every modality == no mutation at all
    keep = np.asarray(batch.mask).ravel()
    base = make_predictions(model, variables, batch, kg, "full_full",
                            "full_full").ravel()[keep]
    from madrigal_tpu.eval.metrics import get_metrics

    ys = np.asarray(batch.pos_neg).ravel()[keep]
    labels = np.asarray(batch.labels).ravel()[keep]
    ref, _ = get_metrics(base, ys, labels, average=None)
    full_key = "+".join(NON_TX_MODALITIES) + "+tx"
    np.testing.assert_allclose(table[full_key]["auprc"],
                               np.asarray(ref["auprc"]), rtol=1e-6)

    # str-only differs from full (the ablation must bite)
    assert not np.allclose(
        np.nan_to_num(table["str"]["auprc"]),
        np.nan_to_num(table[full_key]["auprc"]))

    res = compare_ablations(table, "str", full_key, metric="auprc")
    assert 0.0 <= res.pvalue <= 1.0


@pytest.mark.slow
def test_predict_cli_ablation(setup, tmp_path):
    """predict --ablation: the fig2 study end-to-end through the CLI."""
    import json

    from madrigal_tpu.cli.predict import main as predict_main
    from madrigal_tpu.config import ModelConfig, TrainConfig
    from madrigal_tpu.train.checkpoint import save_checkpoint

    batch, kg, model, variables = setup
    cfg = TrainConfig(model=ModelConfig(encoder=model.enc_cfg,
                                        prediction_dim=6))
    ckpt = str(tmp_path / "m")
    save_checkpoint(ckpt, variables["params"],
                    variables.get("batch_stats", {}), cfg, epoch=1)
    out = str(tmp_path / "ablation.json")
    predict_main(["--checkpoint", ckpt, "--synthetic", "--platform", "cpu",
                  "--synthetic_drugs", "18", "--synthetic_labels", "6",
                  "--synthetic_edges", "30", "--ablation", out,
                  "--ablation_combos", "str;str+kg+cv+tx"])
    with open(out) as f:
        table = json.load(f)
    assert set(table) == {"str", "str+kg+cv+tx"}
    assert len(table["str"]["auprc"]) == len(table["str"]["labels"])


def test_drug_specific_values():
    rng = np.random.RandomState(0)
    t = rng.rand(3, 10, 10)
    t = (t + t.transpose(0, 2, 1)) / 2
    v = drug_specific_values(t, 4)
    assert v.shape == (3, 10)
    assert np.isnan(v[:, 4]).all()
    np.testing.assert_allclose(v[1, :4], t[1, 4, :4])
    v2 = drug_specific_values(t, 4, labels=[2], exclude_self=False)
    np.testing.assert_allclose(v2[0], t[2, 4])
