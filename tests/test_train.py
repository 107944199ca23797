"""Training-stack tests: finetune trainer over synthetic data (loss goes
down, three-way masking modes run), optimizer grouping, evaluator sweep."""
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
    OptimizerConfig,
    ProjectorConfig,
    TrainConfig,
)
from madrigal_tpu.data.collate import DDICollator
from madrigal_tpu.data.synthetic import make_dataset
from madrigal_tpu.train.finetune import FinetuneTrainer
from madrigal_tpu.train.optim import param_labels, warmup_cosine_schedule


def tiny_cfg(finetune_mode="str_random_sample", num_labels=6):
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
    return TrainConfig(
        model=ModelConfig(encoder=enc, prediction_dim=num_labels),
        optim=OptimizerConfig(
            structure_encoder_lr=3e-3, kg_encoder_lr=3e-3,
            perturb_encoders_lr=3e-3, fusion_lr=3e-3, decoder_lr=3e-3,
        ),
        finetune_mode=finetune_mode,
        num_epochs=30,
        warmup_epochs=3,
        seed=0,
    )


@pytest.fixture(scope="module")
def data():
    ds = make_dataset(num_drugs=16, num_labels=6, num_edges=30, seed=2)
    batch, kg = DDICollator(ds, split="train")()
    return ds, batch, kg


@pytest.fixture(scope="module")
def trainer(data):
    ds, batch, kg = data
    return FinetuneTrainer(tiny_cfg(), batch, kg)


def test_finetune_loss_decreases(trainer):
    losses = [trainer.train_epoch()["total"] for _ in range(30)]
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.9, losses


def test_masking_modes(data):
    """Masking engine semantics across finetune modes (host-side, no jit)."""
    from madrigal_tpu.train.masking import FinetuneMasker

    ds, batch, kg = data
    base = np.asarray(batch.head.masks)
    non_tx = ["str", "kg", "cv"]

    m = FinetuneMasker("full_full", base, non_tx)
    h, t = m.sample_epoch()
    np.testing.assert_array_equal(h, base)
    assert m.edges_directed_only() and not m.uses_three_way_loss

    m = FinetuneMasker("str_random_sample", base, non_tx, seed=1)
    h, t = m.sample_epoch()
    # head masks = str-only; tail masks are subsets of availability
    assert (~h[:, 0]).all() and h[:, 1:].all()
    assert ((t | ~base) | True).all()
    assert (t >= base).all()  # never unmask an unavailable modality
    assert m.uses_three_way_loss

    m = FinetuneMasker("double_random", base, non_tx, seed=2)
    h, t = m.sample_epoch()
    assert (h >= base).all() and (t >= base).all()
    assert (~h).any(axis=1).all()  # every drug keeps >=1 modality

    m = FinetuneMasker("ablation_str_str", base, non_tx)
    h, _ = m.sample_epoch()
    assert (~h[:, 0]).all() and h[:, 1:].all()

    m = FinetuneMasker("ablation_tx_tx_padded", base, non_tx)
    h, _ = m.sample_epoch()
    assert h[:, :3].all() and (~h[:, 3:]).all()


@pytest.mark.parametrize("mode", __import__(
    "madrigal_tpu.config", fromlist=["FINETUNE_MODES"]).FINETUNE_MODES)
def test_all_17_modes_construct_masks(data, mode):
    """Every reference finetune mode (parse_args.py:137-155) constructs
    masks with the invariants: never unmask an unavailable modality, every
    drug keeps >=1 modality, str-containing banks keep str."""
    from madrigal_tpu.train.masking import FinetuneMasker

    ds, batch, kg = data
    base = np.asarray(batch.head.masks)
    non_tx = ["str", "kg", "cv"]
    m = FinetuneMasker(mode, base, non_tx, seed=3)
    h, t = m.sample_epoch()
    assert h.shape == base.shape and t.shape == base.shape
    if "padded" not in mode and mode != "ablation_kg_kg_subset":
        assert (h >= base).all() and (t >= base).all(), mode
    assert (~h).any(axis=1).all() and (~t).any(axis=1).all(), mode
    # two epochs re-sample without shape drift
    h2, t2 = m.sample_epoch()
    assert h2.shape == h.shape and t2.shape == t.shape


def test_full_str_random_sample_semantics(data):
    """full_str+random_sample: fixed side = full availability; sampled side
    = random str-containing subset (mode-name grammar; the reference lists
    the mode but never implements its train dispatch)."""
    from madrigal_tpu.train.masking import FinetuneMasker

    ds, batch, kg = data
    base = np.asarray(batch.head.masks)
    m = FinetuneMasker("full_str+random_sample", base, ["str", "kg", "cv"],
                       seed=4)
    h, t = m.sample_epoch()
    np.testing.assert_array_equal(h, base)  # 'full' side
    assert (~t[:, 0]).all()  # every sampled subset contains str
    assert (t >= base).all()
    assert m.uses_three_way_loss and not m.edges_directed_only()


def test_full_str_random_sample_trains(data):
    ds, batch, kg = data
    trainer = FinetuneTrainer(tiny_cfg("full_str+random_sample"), batch, kg)
    losses = trainer.train_epoch()
    assert np.isfinite(losses["total"])
    assert {"X_X", "str_X", "total"} <= set(losses)


@pytest.mark.slow
@pytest.mark.parametrize("mode", __import__(
    "madrigal_tpu.config", fromlist=["FINETUNE_MODES"]).FINETUNE_MODES)
def test_all_17_modes_train_one_epoch(data, mode):
    ds, batch, kg = data
    trainer = FinetuneTrainer(tiny_cfg(mode), batch, kg)
    losses = trainer.train_epoch()
    assert np.isfinite(losses["total"]), (mode, losses)


def test_param_grouping(trainer):
    labels = param_labels(trainer.state.params)
    flat = jax.tree_util.tree_leaves_with_path(labels)
    seen = {l for _, l in flat}
    assert "decoder" in seen and "str" in seen and "kg" in seen
    assert "perturb" in seen and "fusion" in seen
    # decoder weight labeled decoder; gin params labeled str
    for path, lab in flat:
        keys = [k.key for k in path]
        if keys[0] == "decoder":
            assert lab == "decoder"
        if "str_encoder" in keys:
            assert lab.startswith("str")
        if "kg_encoder" in keys:
            assert lab.startswith("kg")


def test_warmup_cosine_schedule():
    s = warmup_cosine_schedule(1.0, 10, 100)
    assert float(s(0)) == 0.0
    assert abs(float(s(10)) - 1.0) < 1e-6
    assert float(s(5)) == pytest.approx(0.5)
    assert float(s(100)) == pytest.approx(0.0, abs=1e-6)


def test_evaluator_sweep(data, trainer):
    from madrigal_tpu.eval.evaluate import Evaluator

    ds, batch, kg = data
    ev = Evaluator(trainer.model, "str_random_sample")
    variables = {"params": trainer.state.params,
                 "batch_stats": trainer.state.batch_stats}
    key = ev.evaluate_ft(variables, batch, kg, "train",
                         eval_types=["full_full", "str_str", "str_full"])
    assert np.isfinite(key)
    assert any(k.startswith("best_train_full_full") for k in ev.best_metrics)


def test_checkpoint_roundtrip(tmp_path, data, trainer):
    from madrigal_tpu.train.checkpoint import (
        filter_cl_params_for_finetune,
        load_checkpoint,
        merge_params,
        save_checkpoint,
    )

    ds, batch, kg = data
    cfg = tiny_cfg()
    p = str(tmp_path / "ckpt")
    save_checkpoint(p, trainer.state.params, trainer.state.batch_stats,
                    cfg, epoch=5)
    tree, meta = load_checkpoint(p)
    assert meta["epoch"] == 5
    assert meta["cfg"].finetune_mode == cfg.finetune_mode
    w0 = np.asarray(
        jax.tree_util.tree_leaves(trainer.state.params)[0]
    )
    w1 = np.asarray(jax.tree_util.tree_leaves(tree["params"])[0])
    np.testing.assert_array_equal(w0, w1)

    # CL transfer filter drops fusion modules, keeps encoders
    enc_params = tree["params"]["encoder"]
    kept = filter_cl_params_for_finetune(enc_params)
    assert "transformer" not in kept and "pos_encoder" not in kept
    assert "str_encoder" in kept and "kg_encoder" in kept
    merged = merge_params(trainer.state.params["encoder"], kept)
    assert "transformer" in merged


@pytest.mark.slow
def test_drug_embeddings_frozen_in_finetune_optimizer():
    """With chemcpa.use_drugs=True, the rdkit2D drug_embeddings table must
    stay frozen under the finetune optimizer (reference embedding.py:10-20
    loads it frozen; the adaptation trainer already excludes it)."""
    import dataclasses

    from madrigal_tpu.data.collate import DDICollator
    from madrigal_tpu.data.synthetic import make_dataset

    cfg = tiny_cfg("full_full", num_labels=4)
    enc = dataclasses.replace(
        cfg.model.encoder,
        chemcpa=dataclasses.replace(
            cfg.model.encoder.chemcpa, use_drugs=True, num_drugs=10,
            drug_embedding_dim=9, embedding_encoder_width=8,
            embedding_encoder_depth=1, dosers_width=4, dosers_depth=1,
        ),
    )
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, encoder=enc))
    ds = make_dataset(num_drugs=10, num_labels=4, num_edges=14, seed=9)
    batch, kg = DDICollator(ds, split="train")()
    trainer = FinetuneTrainer(cfg, batch, kg)
    emb = trainer.state.params["encoder"]["tx_encoder"]["drug_embeddings"]
    before = np.asarray(emb["embedding"]).copy()
    for _ in range(3):
        trainer.train_epoch()
    after = np.asarray(
        trainer.state.params["encoder"]["tx_encoder"]["drug_embeddings"]
        ["embedding"])
    np.testing.assert_array_equal(before, after)
    # the drug-embedding ENCODER (trainable) exists alongside the frozen
    # table -- label check confirms the optimizer grouping
    from madrigal_tpu.train.optim import param_labels

    labels = param_labels(trainer.state.params)
    tx_labels = labels["encoder"]["tx_encoder"]
    assert set(jax.tree_util.tree_leaves(
        tx_labels["drug_embeddings"])) == {"frozen"}
    assert "frozen" not in set(jax.tree_util.tree_leaves(
        tx_labels["drug_embedding_encoder"]))


@pytest.mark.slow
def test_remat_forwards_matches_unremat(data):
    """remat_forwards changes memory, not numerics: one epoch's losses and
    updated params agree with the default step."""
    import dataclasses

    ds, batch, kg = data
    cfg = tiny_cfg("str_random_sample")
    t1 = FinetuneTrainer(cfg, batch, kg)
    t2 = FinetuneTrainer(dataclasses.replace(cfg, remat_forwards=True),
                         batch, kg)
    l1 = t1.train_epoch()
    l2 = t2.train_epoch()
    assert abs(l1["total"] - l2["total"]) < 1e-5, (l1, l2)
    for a, b in zip(jax.tree_util.tree_leaves(t1.state.params),
                    jax.tree_util.tree_leaves(t2.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


@pytest.mark.slow
def test_frozen_encoder_trains_decoder_only(data):
    """cfg.frozen freezes every encoder group; only the decoder updates
    (reference --frozen, utils.py:329-331)."""
    import dataclasses

    ds, batch, kg = data
    cfg = dataclasses.replace(tiny_cfg("full_full"), frozen=True)
    t = FinetuneTrainer(cfg, batch, kg)
    before = jax.tree_util.tree_map(np.asarray, t.state.params)
    for _ in range(3):  # epoch 0 is inside warmup (lr == 0)
        t.train_epoch()
    after = t.state.params

    flat_b = jax.tree_util.tree_flatten_with_path(before)[0]
    flat_a = jax.tree_util.tree_leaves(after)
    decoder_changed = encoder_changed = False
    for (path, b), a in zip(flat_b, flat_a):
        keys = jax.tree_util.keystr(path)
        changed = bool(np.any(np.asarray(a) != b))
        if "decoder" in keys:
            decoder_changed |= changed
        else:
            encoder_changed |= changed
    assert decoder_changed
    assert not encoder_changed


@pytest.mark.parametrize("mode", [
    pytest.param("full_full", marks=pytest.mark.slow),
    "str_random_sample",
])
def test_label_chunked_triples_match(data, mode):
    """label_chunk_triples (label-sorted ELL training view of the triple
    list) changes decoder memory traffic, not numerics: per-epoch losses
    and post-training params match the per-triple-gather path."""
    import dataclasses

    ds, batch, kg = data
    cfg0 = tiny_cfg(finetune_mode=mode)
    cfg1 = dataclasses.replace(cfg0, label_chunk_triples=8)
    t0 = FinetuneTrainer(cfg0, batch, kg)
    t1 = FinetuneTrainer(cfg1, batch, kg)
    assert t1.chunk_labels is not None
    Tc = int(t1.train_batch.labels.shape[0])
    assert Tc % 8 == 0
    # chunk-constant labels in the training view
    lab = np.asarray(t1.train_batch.labels).reshape(-1, 8)
    assert (lab == lab[:, :1]).all()
    # same active triple multiset
    m0 = np.asarray(batch.mask)
    m1 = np.asarray(t1.train_batch.mask)
    trip0 = sorted(zip(np.asarray(batch.head_idx)[m0].tolist(),
                       np.asarray(batch.tail_idx)[m0].tolist(),
                       np.asarray(batch.labels)[m0].tolist()))
    trip1 = sorted(zip(np.asarray(t1.train_batch.head_idx)[m1].tolist(),
                       np.asarray(t1.train_batch.tail_idx)[m1].tolist(),
                       np.asarray(t1.train_batch.labels)[m1].tolist()))
    assert trip0 == trip1

    # decoder path equality at FIXED params: chunked vs per-triple scores
    # over the same logical triples (tight, deterministic)
    from madrigal_tpu.models.encoder import MadrigalMultilabel

    def scores(tr, b, **kw):
        out = tr.model.apply(
            {"params": t0.state.params,
             "batch_stats": t0.state.batch_stats},
            b.head, b.tail, kg, b.head_idx, b.tail_idx, b.labels,
            train=False, method=MadrigalMultilabel.score_triples, **kw)
        return np.asarray(out)

    s_ref = scores(t0, batch)
    s_chk = scores(t1, t1.train_batch, chunk_labels=t1.chunk_labels,
                   label_chunk=8)
    by_triple_ref = {}
    for i in np.nonzero(m0)[0]:
        k = (int(np.asarray(batch.head_idx)[i]),
             int(np.asarray(batch.tail_idx)[i]),
             int(np.asarray(batch.labels)[i]))
        by_triple_ref.setdefault(k, []).append(s_ref[i])
    for i in np.nonzero(m1)[0]:
        k = (int(np.asarray(t1.train_batch.head_idx)[i]),
             int(np.asarray(t1.train_batch.tail_idx)[i]),
             int(np.asarray(t1.train_batch.labels)[i]))
        ref_vals = by_triple_ref[k]
        assert min(abs(s_chk[i] - r) for r in ref_vals) < 1e-5, k

    # loss trajectories equal; params only loosely (Adam's 1/sqrt(v)
    # amplifies f32 reduction-order noise on near-zero-gradient params
    # up to O(lr) per step)
    for _ in range(3):
        l0 = t0.train_epoch()
        l1 = t1.train_epoch()
        assert abs(l0["total"] - l1["total"]) < 1e-4, (l0, l1)
    lr = 3e-3
    for a, b in zip(jax.tree_util.tree_leaves(t0.state.params),
                    jax.tree_util.tree_leaves(t1.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3 * lr, rtol=0)


@pytest.mark.slow
def test_split_share_kg_table_matches_unshared(data):
    """split_share_kg_table (one KG fwd + accumulated table cotangents +
    one KG bwd per epoch) is numerics-identical to the unshared split
    path that recomputes the KG pass inside every forward: the table is
    a deterministic function of params (no dropout/batch_stats in the KG
    encoders) and VJPs are linear in the cotangent."""
    import dataclasses

    ds, batch, kg = data
    cfg = dataclasses.replace(
        tiny_cfg(finetune_mode="str_random_sample"),
        split_forward_grads=True, train_with_str_str=True)
    t0 = FinetuneTrainer(cfg, batch, kg)  # share (default True)
    t1 = FinetuneTrainer(
        dataclasses.replace(cfg, split_share_kg_table=False), batch, kg)
    for _ in range(3):
        l0 = t0.train_epoch()
        l1 = t1.train_epoch()
        for k in l0:
            assert abs(l0[k] - l1[k]) < 1e-5, (k, l0, l1)
    # params only loosely: Adam's 1/sqrt(v) amplifies f32 reduction-order
    # noise (vjp of summed cotangents vs summed vjps) on near-zero-
    # gradient params up to O(lr) per step
    lr = 3e-3
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(t0.state.params),
            jax.tree_util.tree_leaves_with_path(t1.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3 * lr, rtol=0, err_msg=str(ka))


@pytest.mark.parametrize("mode,with_ss", [
    ("str_random_sample", False),
    pytest.param("str_random_sample", True, marks=pytest.mark.slow),
    ("full_full", False),
])
def test_split_forward_grads_match_fused(data, mode, with_ss):
    """split_forward_grads (per-forward value_and_grad + gradient
    accumulation) matches the fused multi-forward step: gradient-of-sum
    == sum-of-gradients, same per-forward rngs and batch_stats
    threading."""
    import dataclasses

    ds, batch, kg = data
    cfg0 = tiny_cfg(finetune_mode=mode)
    cfg0 = dataclasses.replace(cfg0, train_with_str_str=with_ss)
    cfg1 = dataclasses.replace(cfg0, split_forward_grads=True)
    t0 = FinetuneTrainer(cfg0, batch, kg)
    t1 = FinetuneTrainer(cfg1, batch, kg)
    for _ in range(2):
        l0 = t0.train_epoch()
        l1 = t1.train_epoch()
        for k in l0:
            assert abs(l0[k] - l1[k]) < 1e-4, (k, l0, l1)
    lr = 3e-3
    for a, b in zip(jax.tree_util.tree_leaves(t0.state.params),
                    jax.tree_util.tree_leaves(t1.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3 * lr, rtol=0)
