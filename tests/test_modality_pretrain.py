"""Stage-1 modality pretraining tests over synthetic data."""
import numpy as np
import pytest

from madrigal_tpu.config import ChemCPAConfig, GINConfig, HGTConfig
from madrigal_tpu.data.kg import build_kg_batch
from madrigal_tpu.data.molgraph import pack_molecules
from madrigal_tpu.data.synthetic import make_dataset, random_molecule
from madrigal_tpu.train.modality_pretrain import (
    ChemCPAAdaptTrainer,
    GINPretrainer,
    HGTLinkPredTrainer,
    TabularAETrainer,
)


def test_gin_property_pretrain(rng):
    graphs = [random_molecule(rng, int(rng.randint(4, 12)))
              for _ in range(16)]
    batch = pack_molecules(graphs)
    labels = (rng.rand(16, 5) < 0.3).astype(np.float32)
    mask = (rng.rand(16, 5) < 0.8).astype(np.float32)
    tr = GINPretrainer(GINConfig(hidden_dims=(16, 16), num_mlp_layer=2),
                       feature_dim=16, num_tasks=5, lr=3e-3)
    losses = [tr.train_step(batch, labels, mask) for _ in range(15)]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    enc_p, enc_bs = tr.encoder_params()
    assert "layer_0" in enc_p


def test_hgt_link_pred(rng):
    ds = make_dataset(num_drugs=16, seed=4)
    split_rng = np.random.RandomState(0)
    num_nodes = {k: v.shape[0] for k, v in ds.kg_node_feats.items()}
    tr = HGTLinkPredTrainer(HGTConfig(hidden_dim=16, num_layers=2,
                                      att_heads=2), feature_dim=16, lr=3e-3)
    queries, labels, message_edges = tr.make_link_split(
        ds.kg_edge_indices, split_rng, num_nodes
    )
    kg = build_kg_batch(ds.kg_node_feats, message_edges, ds.kg_drug_ids)
    losses = [tr.train_step(kg, queries, labels) for _ in range(20)]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_cv_autoencoder(rng):
    x = rng.randn(64, 40).astype(np.float32)
    tr = TabularAETrainer(input_dim=40, hidden_dims=(32, 16), latent_dim=8,
                          lr=3e-3)
    losses = [tr.train_step(x) for _ in range(80)]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.95


@pytest.mark.parametrize("disable_adv", [True, False])
def test_chemcpa_adaptation(rng, disable_adv):
    cfg = ChemCPAConfig(num_genes=30, dim=16, autoencoder_width=32,
                        autoencoder_depth=1, num_covariates=4,
                        use_drugs=False, disable_adv=disable_adv,
                        adversary_width=16, adversary_depth=1)
    tr = ChemCPAAdaptTrainer(cfg, lr=3e-3, adversary_steps=2)
    genes = rng.randn(32, 30).astype(np.float32)
    cov = rng.randint(0, 4, 32)
    recon_losses, adv_losses = [], []
    for _ in range(16):
        out = tr.train_step(genes, cov)
        if "loss_reconstruction" in out:
            recon_losses.append(out["loss_reconstruction"])
        else:
            adv_losses.append(out["loss_adv"])
    assert np.isfinite(recon_losses).all()
    if disable_adv:
        assert not adv_losses
        assert recon_losses[-1] < recon_losses[0]
    else:
        # alternating schedule: every 2nd iteration is an adversary step
        assert len(adv_losses) == 8
        assert np.isfinite(adv_losses).all()


def test_chemcpa_disentanglement_probe(rng):
    """Probe accuracy ~1.0 when the covariate is linearly encoded in the
    latent, ~optimal (majority frequency) when it is absent."""
    from madrigal_tpu.train.modality_pretrain import evaluate_disentanglement

    cfg = ChemCPAConfig(num_genes=8, dim=8, autoencoder_width=16,
                        autoencoder_depth=1, num_covariates=2,
                        use_drugs=False)
    tr = ChemCPAAdaptTrainer(cfg, lr=1e-3)
    cov = rng.randint(0, 2, 64)
    # genes leak the covariate -> basal latent (a linear-ish encoder of
    # genes) is predictive of it
    genes = rng.randn(64, 8).astype(np.float32) * 0.05
    genes[:, 0] += cov * 3.0
    tr.train_step(genes, cov)  # init
    out = evaluate_disentanglement(
        tr, genes, {"covariate": cov}, epochs=150)
    assert out["covariate"] > 0.9
    assert 0.4 < out["covariate_optimal"] < 0.7

    # random labels uncorrelated with genes -> near-optimal accuracy only
    rand = rng.randint(0, 4, 64)
    out2 = evaluate_disentanglement(
        tr, rng.randn(64, 8).astype(np.float32),
        {"noise": rand}, epochs=60)
    assert out2["noise"] < 0.95  # cannot reach the separable-case accuracy


def test_chemcpa_logfold_r2(rng):
    from madrigal_tpu.train.modality_pretrain import evaluate_logfold_r2

    cfg = ChemCPAConfig(num_genes=12, dim=8, autoencoder_width=16,
                        autoencoder_depth=1, num_covariates=2,
                        use_drugs=False)
    tr = ChemCPAAdaptTrainer(cfg, lr=3e-3)
    n = 48
    cov = rng.randint(0, 2, n)
    genes = np.abs(rng.randn(n, 12)).astype(np.float32) + 0.5
    for _ in range(5):
        tr.train_step(genes, cov)
    cats = np.array([f"cell{c}_drugA_1.0" for c in cov])
    r2, sign = evaluate_logfold_r2(
        tr, genes, cov, genes * 0.8, cov, cats, min_count=5)
    assert np.isfinite(r2) and 0.0 <= sign <= 1.0

    # no category above min_count -> nan
    r2n, _ = evaluate_logfold_r2(
        tr, genes[:4], cov[:4], genes, cov, cats[:4], min_count=5)
    assert np.isnan(r2n)


def test_chemcpa_frozen_drug_embeddings(rng):
    """With freeze_drug_embeddings=True (reference embedding.py:10-20) the
    rdkit2D table must not move during AE training; with False it must."""
    for freeze in (True, False):
        cfg = ChemCPAConfig(num_genes=10, dim=8, autoencoder_width=16,
                            autoencoder_depth=1, num_covariates=2,
                            use_drugs=True, num_drugs=6,
                            drug_embedding_dim=9,
                            embedding_encoder_width=8,
                            embedding_encoder_depth=1,
                            dosers_width=4, dosers_depth=1,
                            freeze_drug_embeddings=freeze)
        tr = ChemCPAAdaptTrainer(cfg, lr=1e-2)
        genes = rng.randn(24, 10).astype(np.float32)
        cov = rng.randint(0, 2, 24)
        drugs = rng.randint(0, 6, 24)
        doses = rng.rand(24).astype(np.float32)
        tr.train_step(genes, cov, drugs, doses)  # init + first step
        before = np.asarray(
            tr._vars["params"]["drug_embeddings"]["embedding"]).copy()
        for _ in range(5):
            tr.train_step(genes, cov, drugs, doses)
        after = np.asarray(
            tr._vars["params"]["drug_embeddings"]["embedding"])
        if freeze:
            np.testing.assert_array_equal(before, after)
        else:
            assert not np.array_equal(before, after)


def test_chemcpa_r2_per_category(rng):
    """Per-category mean/var/DE-gene R2 (reference evaluate_r2): control
    categories filtered, DE subset respected, scores finite."""
    from madrigal_tpu.train.modality_pretrain import evaluate_r2_per_category

    cfg = ChemCPAConfig(num_genes=10, dim=8, autoencoder_width=16,
                        autoencoder_depth=1, num_covariates=2,
                        use_drugs=False)
    tr = ChemCPAAdaptTrainer(cfg, lr=3e-3)
    n = 40
    cov = rng.randint(0, 2, n)
    genes = rng.randn(n, 10).astype(np.float32)
    for _ in range(5):
        tr.train_step(genes, cov)
    cats = np.array([f"cell{c}_drugA_1.0" for c in cov])
    cats[:3] = "cell0_DMSO_0.0"  # must be skipped as control
    ctrl = rng.randn(24, 10).astype(np.float32)
    de = {c: np.array([0, 2, 4]) for c in np.unique(cats)}
    out = evaluate_r2_per_category(tr, genes, cov, ctrl, cats,
                                   de_gene_idx=de, min_count=5)
    assert set(out) == {"mean_score", "mean_score_de", "var_score",
                        "var_score_de"}
    assert np.isfinite(out["mean_score"])
    # all categories below min_count -> nan
    out2 = evaluate_r2_per_category(tr, genes[:4], cov[:4], ctrl, cats[:4],
                                    min_count=5)
    assert np.isnan(out2["mean_score"])


def test_chemcpa_sweep_mapping_real_yaml():
    """sweep_config_to_trainer_args decodes the reference's real sweep
    YAML hparam surface (chemcpa_tx_adapting_configs_sweep.yaml)."""
    import os

    from madrigal_tpu.train.chemcpa_sweep import sweep_config_to_trainer_args
    from madrigal_tpu.utils.config_gen import generate_configs, read_config

    path = "/root/reference/configs/chemcpa/chemcpa_tx_adapting_configs_sweep.yaml"
    if not os.path.exists(path):
        pytest.skip("reference configs unavailable")
    _, _, experiment = read_config(path)
    configs = generate_configs(experiment, seed=0)
    assert len(configs) == 100  # random block: samples=100
    cfg, tkw, rkw = sweep_config_to_trainer_args(configs[0])
    assert cfg.dim == 128
    assert cfg.autoencoder_width in (128, 256, 512)
    assert cfg.autoencoder_depth in (2, 3, 4, 5)
    assert cfg.dropout in (0.2, 0.3, 0.4, 0.5)
    assert tkw["lr"] in (1e-3, 1e-4, 1e-5)
    assert rkw["num_epochs"] == 300 and rkw["checkpoint_freq"] == 50
    assert rkw["patience"] == 10 and rkw["batch_size"] == 4096
    # the random block varies fields across samples
    cfgs = [sweep_config_to_trainer_args(c)[0] for c in configs[:20]]
    assert len({c.autoencoder_width for c in cfgs}) > 1


@pytest.mark.slow
def test_chemcpa_sweep_entry(tmp_path):
    """Tiny-grid sweep end-to-end through the CLI: expansion, early-stop
    loop, JSONL artifact, best-config selection + checkpoint."""
    import json
    import os

    from madrigal_tpu.cli import chemcpa_sweep

    yaml_text = """
fixed:
  training.num_epochs: 8
  training.checkpoint_freq: 2
  model.hparams.dim: 12
  model.hparams.batch_size: 96
  model.hparams.autoencoder_lr: 1e-3
  model.additional_params.patience: 2
  model.additional_params.seed: 0
grid:
  model.hparams.autoencoder_width:
    type: choice
    options: [24, 32]
"""
    sweep_yaml = tmp_path / "sweep.yaml"
    sweep_yaml.write_text(yaml_text)
    out = chemcpa_sweep.main([
        "--sweep_yaml", str(sweep_yaml), "--synthetic",
        "--synthetic_drugs", "24", "--platform", "cpu",
        "--save_dir", str(tmp_path / "out"), "--epoch_cap", "6",
    ])
    assert len(out["results"]) == 2
    assert out["best_index"] in (0, 1)
    assert np.isfinite(out["best_r2"])
    assert out["best_variables"] is not None
    assert out["best_config"].autoencoder_width in (24, 32)

    lines = [json.loads(l) for l in
             open(tmp_path / "out" / "sweep_results.jsonl")]
    summaries = [l["summary"] for l in lines if "summary" in l]
    assert len(summaries) == 2
    assert all(np.isfinite(s["best_r2"]) for s in summaries)
    evals = [l for l in lines if "test_r2" in l]
    assert len(evals) >= 2  # checkpoint_freq cadence fired
    assert os.path.isdir(tmp_path / "out" / "tx_pretrained_best")


def test_chemcpa_sweep_nan_and_early_stop(rng):
    """train_one_config stops on NaN loss and on patience exhaustion."""
    from madrigal_tpu.train.chemcpa_sweep import train_one_config

    genes = rng.randn(64, 12).astype(np.float32)
    cov = rng.randint(0, 2, 64)
    cfg = ChemCPAConfig(num_genes=12, dim=8, autoencoder_width=16,
                        autoencoder_depth=1, num_covariates=2,
                        use_drugs=False)
    # absurd lr -> NaN quickly
    res = train_one_config(
        cfg, {"lr": 1e12, "seed": 0}, 
        {"num_epochs": 50, "checkpoint_freq": 5, "max_minutes": 10,
         "batch_size": 64, "patience": 3},
        genes, cov, genes[:16], cov[:16])
    assert res["stop_reason"] in ("nan_loss", "nan_r2")
    assert res["epochs_run"] < 50

    # patience 0 -> stops at the second non-improving eval
    res2 = train_one_config(
        cfg, {"lr": 1e-9, "seed": 0},
        {"num_epochs": 200, "checkpoint_freq": 1, "max_minutes": 10,
         "batch_size": 64, "patience": 0},
        genes, cov, genes[:16], cov[:16])
    assert res2["stop_reason"] in ("early_stop", "max_epochs")
    assert res2["epochs_run"] < 200
