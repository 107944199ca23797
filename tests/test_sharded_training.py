"""Sharded training on the 8-virtual-device mesh: dp x label finetune step
matches the single-device step numerically."""
import dataclasses

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
from madrigal_tpu.parallel.train_step import (
    make_train_mesh,
    shard_finetune_trainer,
)
from madrigal_tpu.train.finetune import FinetuneTrainer


def tiny_cfg(num_labels):
    enc = EncoderConfig(
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
    return TrainConfig(
        model=ModelConfig(encoder=enc, prediction_dim=num_labels),
        optim=OptimizerConfig(),
        finetune_mode="full_full",  # deterministic masks -> exact compare
        num_epochs=10, warmup_epochs=2, seed=0,
    )


@pytest.mark.slow
def test_sharded_step_matches_single_device():
    ds = make_dataset(num_drugs=12, num_labels=8, num_edges=20, seed=21)
    # pair budget divisible by dp=4
    T = 6 * 20
    budget = ((T + 3) // 4) * 4
    batch, kg = DDICollator(ds, split="train", pair_budget=budget)()

    t1 = FinetuneTrainer(tiny_cfg(8), batch, kg)
    losses_single = t1.train_epoch()

    t2 = FinetuneTrainer(tiny_cfg(8), batch, kg)
    mesh = make_train_mesh(8, label_dim=2)
    assert mesh.shape == {"dp": 4, "label": 2}
    shard_finetune_trainer(t2, mesh)
    with mesh:
        losses_sharded = t2.train_epoch()

    assert abs(losses_single["total"] - losses_sharded["total"]) < 1e-4

    # params after one step agree
    p1 = jax.tree_util.tree_leaves(t1.state.params)
    p2 = jax.tree_util.tree_leaves(t2.state.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


@pytest.mark.slow
def test_sharded_split_forward_matches_single_device():
    """The flagship 3-forward production path (split_forward_grads +
    split_share_kg_table) under the dp x label mesh: per-forward grad
    programs, shared-KG-table cotangent accumulation and the apply step
    all run on sharded arrays and match single-device numerics."""
    ds = make_dataset(num_drugs=12, num_labels=8, num_edges=20, seed=23)
    T = 6 * 20
    budget = ((T + 3) // 4) * 4
    batch, kg = DDICollator(ds, split="train", pair_budget=budget)()

    def cfg():
        return dataclasses.replace(
            tiny_cfg(8), finetune_mode="str_random_sample",
            split_forward_grads=True, split_share_kg_table=True)

    t1 = FinetuneTrainer(cfg(), batch, kg)
    losses_single = t1.train_epoch()

    t2 = FinetuneTrainer(cfg(), batch, kg)
    mesh = make_train_mesh(8, label_dim=2)
    shard_finetune_trainer(t2, mesh)
    with mesh:
        losses_sharded = t2.train_epoch()

    for k in losses_single:
        assert abs(losses_single[k] - losses_sharded[k]) < 1e-4, (
            k, losses_single, losses_sharded)
    p1 = jax.tree_util.tree_leaves(t1.state.params)
    p2 = jax.tree_util.tree_leaves(t2.state.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


@pytest.mark.slow
def test_embed_all_drugs_sharded_matches_serial():
    """dp-sharded drug embedding equals the serial embed_all_drugs path."""
    from madrigal_tpu.eval.predict import embed_all_drugs
    from madrigal_tpu.parallel.allpairs import embed_all_drugs_sharded

    ds = make_dataset(num_drugs=12, num_labels=4, num_edges=16, seed=5)
    coll = DDICollator(ds, split="train")
    batch, kg = coll()
    trainer = FinetuneTrainer(tiny_cfg(4), batch, kg)
    variables = {"params": trainer.state.params,
                 "batch_stats": trainer.state.batch_stats}

    z_serial = embed_all_drugs(trainer.model, variables, coll, kg)

    table = trainer.model.apply(
        variables, kg,
        method=lambda m, k: m.encoder.kg_drug_table(k, train=False),
    )

    def encode(vs, b):
        return trainer.model.apply(
            vs, b, kg_drug_table=table, train=False,
            method=lambda m, bb, kg_drug_table, train: m.encoder.encode(
                bb, kg_drug_table=kg_drug_table, train=train
            ),
        )

    mesh = make_train_mesh(8, label_dim=2)  # dp=4
    dp = mesh.shape["dp"]
    ids = np.arange(ds.num_drugs)
    per = -(-len(ids) // dp)
    padded = np.concatenate(
        [ids, np.full(per * dp - len(ids), ids[-1], dtype=ids.dtype)]
    )
    batches = [coll.drug_batch(padded[i * per:(i + 1) * per])
               for i in range(dp)]
    z_sh = embed_all_drugs_sharded(mesh, encode, variables, batches)
    np.testing.assert_allclose(z_sh[: len(ids)], z_serial,
                               atol=1e-5, rtol=1e-5)


def test_sharded_rank_tensor_f32_default_matches_single_host():
    """The sharded rank path's default dtype now matches eval.ranks exactly."""
    from madrigal_tpu.eval.ranks import rank_tensor
    from madrigal_tpu.parallel.allpairs import sharded_rank_tensor

    rng = np.random.RandomState(1)
    z = rng.randn(20, 16).astype(np.float32)
    w = rng.randn(8, 16, 16).astype(np.float32)
    w_sym = (w + w.transpose(0, 2, 1)) / 2
    mesh = make_train_mesh(8, label_dim=2)
    ref = rank_tensor(z, w_sym, chunk=3)
    got = sharded_rank_tensor(mesh, z, w_sym, chunk_per_device=2)
    np.testing.assert_allclose(got, ref, atol=1e-6)


@pytest.mark.slow
def test_sharded_trainer_validates_divisibility():
    ds = make_dataset(num_drugs=12, num_labels=7, num_edges=21, seed=22)
    batch, kg = DDICollator(ds, split="train")()
    trainer = FinetuneTrainer(tiny_cfg(7), batch, kg)
    mesh = make_train_mesh(8, label_dim=2)
    with pytest.raises(ValueError):
        shard_finetune_trainer(trainer, mesh)


@pytest.mark.slow
@pytest.mark.parametrize("kg_shard_axis", [None, "dp"])
def test_sharded_cl_pretrain_matches_single_device(kg_shard_axis):
    from madrigal_tpu.config import PretrainConfig
    from madrigal_tpu.parallel.train_step import shard_cl_pretrainer
    from madrigal_tpu.train.pretrain_cl import CLPretrainer
    from jax.sharding import Mesh

    ds = make_dataset(num_drugs=16, num_labels=4, num_edges=16, seed=23)
    coll = DDICollator(ds, split="train")
    kg = coll.kg_batch()
    enc = tiny_cfg(4).model.encoder
    cfg = PretrainConfig(
        encoder=enc, pretrain_mode="str_center_uni",
        pretrain_unbalanced=True, raw_encoder_output=True,
        pretrain_batch_size=8, pretrain_num_epochs=10, warmup_epochs=1,
        pretrain_lr=1e-3, seed=3,
    )
    t1 = CLPretrainer(cfg, coll, kg)
    l1 = t1.train_step()

    t2 = CLPretrainer(cfg, coll, kg)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8, 1)[:, 0], ("dp",))
    shard_cl_pretrainer(t2, mesh, kg_shard_axis=kg_shard_axis)
    l2 = t2.train_step()
    # same rng stream + same data order -> identical loss
    assert abs(l1 - l2) < 1e-4, (l1, l2)
