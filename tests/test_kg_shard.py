"""Graph-parallel (edge-sharded) HGT on the 8-virtual-device mesh:
forward, gradients, and the full finetune step match single-device
numerics exactly (f32 psum merges; parallel/kg_shard.py)."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from madrigal_tpu.data.collate import DDICollator
from madrigal_tpu.data.synthetic import make_dataset
from madrigal_tpu.parallel.kg_shard import (
    device_put_kg_sharded,
    make_sharded_kg_table_fn,
    pad_kg_edges_to_multiple,
    sharded_kg_drug_table,
)
from madrigal_tpu.parallel.train_step import (
    make_train_mesh,
    shard_finetune_trainer,
)
from madrigal_tpu.train.finetune import FinetuneTrainer

from test_sharded_training import tiny_cfg


def _trainer(num_labels=4, seed=7, softmax_scope="per_edge_type"):
    ds = make_dataset(num_drugs=12, num_labels=num_labels, num_edges=20,
                      seed=seed)
    T = 6 * 20
    budget = ((T + 3) // 4) * 4
    batch, kg = DDICollator(ds, split="train", pair_budget=budget)()
    cfg = tiny_cfg(num_labels)
    if softmax_scope != "per_edge_type":
        enc = dataclasses.replace(
            cfg.model.encoder,
            hgt=dataclasses.replace(cfg.model.encoder.hgt,
                                    softmax_scope=softmax_scope),
        )
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, encoder=enc)
        )
    return FinetuneTrainer(cfg, batch, kg), kg


@pytest.mark.parametrize("scope", ["per_edge_type", "global"])
def test_sharded_kg_table_matches_unsharded(scope):
    trainer, kg = _trainer(softmax_scope=scope)
    variables = {"params": trainer.state.params}

    ref = np.asarray(trainer.model.apply(
        variables, kg,
        method=lambda m, k: m.encoder.kg_drug_table(k, train=False),
    ))

    mesh = make_train_mesh(8, label_dim=1)  # dp=8
    got = sharded_kg_drug_table(mesh, trainer.model, variables, kg,
                                axis="dp")
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_sharded_kg_gradients_match_unsharded():
    trainer, kg = _trainer()
    params = trainer.state.params
    mesh = make_train_mesh(8, label_dim=1)

    kg_pad = pad_kg_edges_to_multiple(kg, 8)
    kg_sh = device_put_kg_sharded(kg_pad, mesh, "dp")
    table_fn = make_sharded_kg_table_fn(trainer.model, mesh, axis="dp")

    def loss_sharded(p):
        return jnp.sum(jnp.tanh(table_fn(p, kg_sh)) ** 2)

    def loss_ref(p):
        t = trainer.model.apply(
            {"params": p}, kg,
            method=lambda m, k: m.encoder.kg_drug_table(k, train=False),
        )
        return jnp.sum(jnp.tanh(t) ** 2)

    g_sh = jax.jit(jax.grad(loss_sharded))(params)
    g_ref = jax.jit(jax.grad(loss_ref))(params)
    flat_sh, _ = jax.tree_util.tree_flatten_with_path(g_sh)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    assert len(flat_sh) == len(flat_ref)
    # every HGT weight must receive a nonzero gradient through the
    # shard_map, identical to the plain full-graph gradient
    any_kg_nonzero = False
    for (path, a), b in zip(flat_sh, flat_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4,
            err_msg=jax.tree_util.keystr(path),
        )
        if "kg_enc" in jax.tree_util.keystr(path) and np.any(
                np.asarray(b) != 0):
            any_kg_nonzero = True
    assert any_kg_nonzero


@pytest.mark.slow
def test_finetune_step_kg_sharded_matches_single_device():
    """Full dp x label training step with the HGT running edge-sharded:
    loss and post-step params equal the single-device step."""
    t1, _ = _trainer(num_labels=8, seed=21)
    losses_single = t1.train_epoch()

    t2, _ = _trainer(num_labels=8, seed=21)
    mesh = make_train_mesh(8, label_dim=2)
    shard_finetune_trainer(t2, mesh, kg_shard_axis="dp")
    assert t2._kg_table_fn is not None
    with mesh:
        losses_sharded = t2.train_epoch()

    assert abs(losses_single["total"] - losses_sharded["total"]) < 1e-4

    p1 = jax.tree_util.tree_leaves(t1.state.params)
    p2 = jax.tree_util.tree_leaves(t2.state.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_pad_kg_edges_preserves_mask_budget():
    _, kg = _trainer()
    padded = pad_kg_edges_to_multiple(kg, 7)
    for k, src in padded.edge_src.items():
        assert src.shape[0] % 7 == 0
        e_orig = kg.edge_src[k].shape[0]
        np.testing.assert_array_equal(
            np.asarray(padded.edge_mask[k][e_orig:]), False
        )
        np.testing.assert_array_equal(
            np.asarray(padded.edge_src[k][:e_orig]),
            np.asarray(kg.edge_src[k]),
        )


@pytest.mark.parametrize("scope", ["per_edge_type", "global"])
def test_sharded_kg_table_chunked_matches(scope):
    """Graph-parallel message passing over degree-chunked arenas
    (edge_chunk=8): chunk-aligned shard boundaries, same numerics."""
    ds = make_dataset(num_drugs=12, num_labels=4, num_edges=20, seed=7)
    coll = DDICollator(ds, split="train", pair_budget=120)
    trainer, kg = _trainer(softmax_scope=scope)
    kg_c = coll.kg_batch(edge_chunk=8)
    variables = {"params": trainer.state.params}

    ref = np.asarray(trainer.model.apply(
        variables, kg,
        method=lambda m, k: m.encoder.kg_drug_table(k, train=False),
    ))

    mesh = make_train_mesh(8, label_dim=1)
    got = sharded_kg_drug_table(mesh, trainer.model, variables, kg_c,
                                axis="dp")
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)
    # shard boundaries stayed chunk-aligned
    padded = pad_kg_edges_to_multiple(kg_c, 8)
    for k, src in padded.edge_src.items():
        assert src.shape[0] % (8 * 8) == 0
        assert padded.edge_chunk_dst[k].shape[0] == src.shape[0] // 8
