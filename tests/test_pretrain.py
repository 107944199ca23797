"""CL-pretraining tests: mask banks/sampler semantics, InfoNCE parity vs a
torch fixture of the reference loss, and a short pretraining run."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from madrigal_tpu.config import (
    ChemCPAConfig,
    EncoderConfig,
    FusionConfig,
    GINConfig,
    HGTConfig,
    MLPEncoderConfig,
    PretrainConfig,
    ProjectorConfig,
)
from madrigal_tpu.data.collate import DDICollator
from madrigal_tpu.data.synthetic import make_dataset
from madrigal_tpu.train.losses import info_nce
from madrigal_tpu.train.pretrain_masks import (
    get_pretrain_masks,
    sample_pretrain_masks,
)


def torch_simclr_loss(aug1, aug2, T, too_hard=None):
    """Reference contrastive_loss (simclr.py:74-108)."""
    import torch.nn.functional as F

    features = torch.cat([aug1, aug2], dim=0)
    labels = torch.cat([torch.arange(aug1.shape[0])] * 2, dim=0)
    labels = (labels.unsqueeze(0) == labels.unsqueeze(1)).float()
    features = F.normalize(features, dim=1)
    sim = features @ features.T
    if too_hard is not None:
        sim = sim.masked_fill(too_hard.repeat(2, 2), -1e9)
    mask = torch.eye(labels.shape[0], dtype=torch.bool)
    labels = labels[~mask].view(labels.shape[0], -1)
    sim = sim[~mask].view(sim.shape[0], -1)
    logits = sim / T
    target = labels.argmax(dim=1)
    return torch.nn.CrossEntropyLoss()(logits, target).item()


def test_info_nce_parity(rng):
    a1 = rng.randn(10, 16).astype(np.float32)
    a2 = rng.randn(10, 16).astype(np.float32)
    _, _, loss = info_nce(jnp.asarray(a1), jnp.asarray(a2), 0.1)
    ref = torch_simclr_loss(torch.from_numpy(a1), torch.from_numpy(a2), 0.1)
    assert abs(float(loss) - ref) < 1e-4

    hard = rng.rand(10, 10) < 0.1
    np.fill_diagonal(hard, False)
    _, _, loss = info_nce(jnp.asarray(a1), jnp.asarray(a2), 0.1,
                          jnp.asarray(hard))
    ref = torch_simclr_loss(torch.from_numpy(a1), torch.from_numpy(a2), 0.1,
                            torch.from_numpy(hard))
    assert abs(float(loss) - ref) < 1e-3


def test_pretrain_mask_banks():
    masks = np.array(
        [
            [0, 0, 1] + [1] * 16,
            [0, 0, 0] + [1] * 16,
            [0, 1, 0] + [0] + [1] * 15,
        ]
    )
    drugs = np.array([0, 1, 2])
    banks = get_pretrain_masks(drugs, masks, "str_center_uni", True)
    # drug 0: str+kg available, str masked out for branch-2 -> only kg
    assert banks[0].shape == (1, 19)
    assert not banks[0][0, 1]  # kg unmasked
    assert banks[0][0, 0]  # str masked
    # drug 2: str, cv, tx0 -> branch-2 options cv or tx0
    assert banks[2].shape == (2, 19)

    rng = np.random.RandomState(0)
    m1, m2 = sample_pretrain_masks(banks, drugs, "str_center_uni", True, rng,
                                   19)
    assert (~m1[:, 0]).all() and m1[:, 1:].all()
    assert (m2[:, 0]).all()  # branch 2 never includes str
    assert ((~m2).sum(axis=1) == 1).all()  # exactly one modality

    # balanced banks carry probabilities
    banks_b = get_pretrain_masks(drugs, masks, "str_center_uni", False, 0.2)
    sm, probs = banks_b[2]
    assert len(probs) == len(sm)
    assert probs.sum() == pytest.approx(1.0)
    # tx modality downweighted by the 0.2 ratio relative to cv
    assert probs[0] > probs[1]


def test_cl_metrics(rng):
    from madrigal_tpu.eval.cl_metrics import (
        alignment_loss,
        foscttm,
        knn_classifier,
        retrieval_topk_accuracy,
        uniform_loss,
    )

    a = rng.randn(20, 8).astype(np.float32)
    # perfect alignment
    assert alignment_loss(a, a) == pytest.approx(0.0)
    top1, top5, _ = retrieval_topk_accuracy(a, a, (1, 5, 20))
    assert top1 == 1.0 and top5 == 1.0
    mu, std = foscttm(a, a)
    assert mu == pytest.approx(0.0)
    assert np.isfinite(uniform_loss(a))
    labels = (rng.rand(20) < 0.5).astype(np.int64)
    acc = knn_classifier(a, labels, a, labels, k=1, num_classes=2)
    assert acc == 1.0  # 1-NN on identical sets with cosine weights


@pytest.mark.slow
def test_cl_pretrain_runs():
    from madrigal_tpu.train.pretrain_cl import CLPretrainer

    ds = make_dataset(num_drugs=14, num_labels=4, num_edges=20, seed=3)
    coll = DDICollator(ds, split="train")
    kg = coll.kg_batch()
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
    cfg = PretrainConfig(
        encoder=enc, pretrain_mode="str_center_uni",
        pretrain_unbalanced=True, raw_encoder_output=True,
        pretrain_batch_size=8, pretrain_num_epochs=20, warmup_epochs=2,
        pretrain_lr=1e-3,
    )
    tr = CLPretrainer(cfg, coll, kg)
    losses = [tr.train_step() for _ in range(6)]
    assert np.isfinite(losses).all()
    enc_vars = tr.encoder_variables()
    assert "str_encoder" in enc_vars["params"]

    # the prefetch-overlapped loop (train_steps, data/pipeline.py) draws
    # the same host-rng and dropout-rng streams -> identical losses
    tr2 = CLPretrainer(cfg, coll, kg)
    losses2 = tr2.train_steps(6)
    np.testing.assert_allclose(losses2, losses, atol=1e-6)


def test_cl_device_table_path():
    """device_table=True: the minibatch is a device gather of one
    full-table modality-token pass (models/simclr.py ids path). Checks
    (a) the train loop runs (train_step == train_steps rng streams),
    (b) at train=False the ids path's loss equals the host-collate
    path's on the same drugs (tokens are mask-independent and per-drug,
    so gather-then-fuse == collate-then-encode)."""
    import jax

    from madrigal_tpu.train.pretrain_cl import CLPretrainer

    ds = make_dataset(num_drugs=14, num_labels=4, num_edges=20, seed=3)
    coll = DDICollator(ds, split="train")
    kg = coll.kg_batch()
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
    cfg = PretrainConfig(
        encoder=enc, pretrain_mode="str_center_uni",
        pretrain_unbalanced=True, raw_encoder_output=True,
        pretrain_batch_size=8, pretrain_num_epochs=20, warmup_epochs=2,
        pretrain_lr=1e-3,
    )
    tr = CLPretrainer(cfg, coll, kg, device_table=True)
    assert tr.full_batch is not None
    losses = [tr.train_step() for _ in range(4)]
    assert np.isfinite(losses).all()
    tr2 = CLPretrainer(cfg, coll, kg, device_table=True)
    np.testing.assert_allclose(tr2.train_steps(4), losses, atol=1e-6)

    # forward parity vs the host-collate path (train=False: no dropout,
    # BN running stats -> the only difference is gather vs re-collate)
    ids = np.array([3, 0, 7, 11, 5, 2, 9, 13], np.int32)
    m1, m2 = tr._sample_masks(ids)
    variables = {"params": tr.state.params,
                 "batch_stats": tr.state.batch_stats}
    _, _, (_, _, loss_ids) = tr.model.apply(
        variables, tr.full_batch, kg, jnp.asarray(m1), jnp.asarray(m2),
        ids=jnp.asarray(ids), train=False)
    sub = coll.drug_batch(ids)
    _, _, (_, _, loss_host) = tr.model.apply(
        variables, sub, kg, jnp.asarray(m1), jnp.asarray(m2),
        train=False)
    np.testing.assert_allclose(
        np.asarray(loss_ids), np.asarray(loss_host), atol=1e-5)
