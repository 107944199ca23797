"""Serving API tests: checkpoint->model reconstruction, embed-all-drugs,
all-pairs scoring consistency with the decoder, triple lookups,
ensembling."""
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
    ModelConfig,
    ProjectorConfig,
    TrainConfig,
)
from madrigal_tpu.data.collate import DDICollator
from madrigal_tpu.data.synthetic import make_dataset
from madrigal_tpu.eval.predict import (
    embed_all_drugs,
    ensemble_sigmoid_mean,
    make_predictions,
    model_from_checkpoint,
    score_all_pairs,
    score_triples_for_pairs,
)
from madrigal_tpu.models.encoder import MadrigalMultilabel, init_multilabel


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
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
    cfg = TrainConfig(model=ModelConfig(encoder=enc, prediction_dim=6))
    ds = make_dataset(num_drugs=18, num_labels=6, num_edges=30, seed=5)
    coll = DDICollator(ds, split="train")
    batch, kg = coll()
    model = MadrigalMultilabel(enc_cfg=enc, prediction_dim=6)
    variables = init_multilabel(model, jax.random.PRNGKey(0), batch.head,
                                batch.tail, kg)
    path = str(tmp_path_factory.mktemp("ckpt") / "m")
    from madrigal_tpu.train.checkpoint import save_checkpoint

    save_checkpoint(path, variables["params"],
                    variables.get("batch_stats", {}), cfg, epoch=1)
    return cfg, ds, coll, batch, kg, model, variables, path


def test_model_from_checkpoint(setup):
    cfg, ds, coll, batch, kg, model, variables, path = setup
    model2, vars2, cfg2 = model_from_checkpoint(path)
    s1 = model.apply(variables, batch.head, batch.tail, kg, train=False)
    s2 = model2.apply(vars2, batch.head, batch.tail, kg, train=False)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)


def test_embed_and_score_all_pairs(setup):
    cfg, ds, coll, batch, kg, model, variables, path = setup
    z = embed_all_drugs(model, variables, coll, kg, batch_size=7)
    assert z.shape == (ds.num_drugs, 16)
    assert np.isfinite(z).all()

    scores = score_all_pairs(model, variables, z, label_chunk=4)
    assert scores.shape == (6, ds.num_drugs, ds.num_drugs)

    # decoder consistency: chunked export == direct decoder on embeddings
    direct = model.apply(
        variables, jnp.asarray(z), jnp.asarray(z),
        method=lambda m, a, b: m.decoder.all_pairs(a, b),
    )
    np.testing.assert_allclose(scores, np.asarray(direct), atol=1e-4,
                               rtol=1e-4)

    # triple lookup
    triples = [(0, 1, 2), (5, 3, 4), (2, 0, 17)]
    t = score_triples_for_pairs(model, variables, z, triples)
    for k, (l, a, b) in enumerate(triples):
        assert abs(t[k] - scores[l, a, b]) < 1e-4


def test_embedding_batch_invariance(setup):
    """Embeddings must not depend on batch chunking."""
    cfg, ds, coll, batch, kg, model, variables, path = setup
    z1 = embed_all_drugs(model, variables, coll, kg, batch_size=5)
    z2 = embed_all_drugs(model, variables, coll, kg, batch_size=18)
    np.testing.assert_allclose(z1, z2, atol=1e-5)


def test_make_predictions_eval_types(setup):
    cfg, ds, coll, batch, kg, model, variables, path = setup
    p_full = make_predictions(model, variables, batch, kg, "full_full",
                              "str_random_sample")
    p_str = make_predictions(model, variables, batch, kg, "str_str",
                             "str_random_sample")
    assert p_full.shape == p_str.shape == (batch.labels.shape[0],)
    assert ((p_full >= 0) & (p_full <= 1)).all()
    # different masks -> different predictions
    assert not np.allclose(p_full, p_str)


@pytest.mark.slow
def test_multi_seed_ensemble_cli(setup, tmp_path):
    """The published multi-seed serving protocol end-to-end through the
    CLI (reference generate_embeddings.ipynb cells 18-20,
    predict.py:466-499): per-seed normalized-rank tensors -> gmean ->
    re-rank, and sigmoid-mean score/triple ensembling."""
    from madrigal_tpu.cli import predict as cli_predict
    from madrigal_tpu.eval.ranks import ensemble_normalized_ranks
    from madrigal_tpu.train.checkpoint import save_checkpoint

    cfg, ds, coll, batch, kg, model, variables, path = setup
    variables2 = init_multilabel(model, jax.random.PRNGKey(1), batch.head,
                                 batch.tail, kg)
    path2 = str(tmp_path / "m2")
    save_checkpoint(path2, variables2["params"],
                    variables2.get("batch_stats", {}), cfg, epoch=1)

    data_flags = ["--synthetic", "--synthetic_drugs", "18",
                  "--synthetic_labels", "6", "--synthetic_edges", "30",
                  "--seed", "5", "--platform", "cpu"]
    ranks_out = str(tmp_path / "ens_ranks.npy")
    scores_out = str(tmp_path / "ens_scores.npy")
    probs = cli_predict.main(
        ["--checkpoint", path, path2, "--export_ranks", ranks_out,
         "--export_scores", scores_out, "--keep_seed_ranks",
         "--triples", "0:1:2", "--label_chunk", "4"] + data_flags)

    # per-seed tensors are genuine normalized-rank tensors
    seed_maps = [np.load(f"{ranks_out}.seed{i}.npy") for i in range(2)]
    n = 18
    tril = np.tri(n, k=-1, dtype=bool)
    for r in seed_maps:
        assert r.shape == (6, n, n)
        np.testing.assert_allclose(r, r.transpose(0, 2, 1), atol=0)
        assert (r[:, tril] > 0).all() and (r[:, tril] <= 1).all()
        assert (np.diagonal(r, axis1=1, axis2=2) == 0).all()
    assert not np.allclose(seed_maps[0], seed_maps[1])

    # ensembled output == gmean + re-rank of the per-seed tensors
    got = np.load(ranks_out)
    expect = ensemble_normalized_ranks(seed_maps, chunk=3)
    np.testing.assert_allclose(got, expect, atol=1e-6)
    assert not np.allclose(got, seed_maps[0])

    # score ensembling == sigmoid-mean of the per-seed raw score tensors
    s_seed = []
    for i, p in enumerate((path, path2)):
        sp = str(tmp_path / f"raw{i}.npy")
        cli_predict.main(["--checkpoint", p, "--export_scores", sp,
                          "--label_chunk", "4"] + data_flags)
        s_seed.append(np.load(sp))
    sig = lambda x: 1 / (1 + np.exp(-x))
    np.testing.assert_allclose(
        np.load(scores_out), (sig(s_seed[0]) + sig(s_seed[1])) / 2,
        atol=1e-5)

    # triple query: sigmoid-mean probability of the per-seed logits
    np.testing.assert_allclose(
        probs[0], (sig(s_seed[0][0, 1, 2]) + sig(s_seed[1][0, 1, 2])) / 2,
        atol=1e-4)


def test_ensemble_sigmoid_mean(rng):
    a = rng.randn(10)
    b = rng.randn(10)
    out = ensemble_sigmoid_mean([a, b])
    sig = lambda x: 1 / (1 + np.exp(-x))
    np.testing.assert_allclose(out, (sig(a) + sig(b)) / 2, atol=1e-12)
    # explicit flag: already-sigmoided inputs are averaged untouched --
    # even logits that happen to land inside [0, 1] get the sigmoid when
    # scores_are_logits=True (no value-range sniffing)
    pa, pb = sig(a), sig(b)
    np.testing.assert_allclose(
        ensemble_sigmoid_mean([pa, pb], scores_are_logits=False),
        (pa + pb) / 2, atol=1e-12,
    )
    in_unit = np.abs(a) * 0.4 + 0.1  # logits inside [0, 1]
    np.testing.assert_allclose(
        ensemble_sigmoid_mean([in_unit]), sig(in_unit), atol=1e-12,
    )
