"""Sharded training utilities.

Places a FinetuneTrainer's state and batch onto a ('dp', 'label') device
mesh: DDI triple arrays shard over 'dp' (data parallel -- the reference's
scaling axis is the pair list, SURVEY.md section 5 long-context note), the
bilinear decoder weight [L, D, D] shards over 'label' (tensor parallel on
the outcome axis), encoder weights and the KG replicate. XLA/GSPMD inserts
the psum for decoder-weight gradients and the all-gathers for the
replicated encoders automatically.

Used by __graft_entry__.dryrun_multichip and by users scaling full-batch
finetuning beyond one chip.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_train_mesh(n_devices: Optional[int] = None,
                    label_dim: Optional[int] = None) -> Mesh:
    devices = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devices)
    if label_dim is None:
        label_dim = 2 if n % 2 == 0 and n > 1 else 1
    dp = n // label_dim
    return Mesh(np.asarray(devices).reshape(dp, label_dim), ("dp", "label"))


def shard_finetune_trainer(trainer, mesh: Mesh, kg_shard_axis=None):
    """Re-place an existing FinetuneTrainer onto `mesh` (in place).

    Requirements: the padded triple count must divide mesh.shape['dp'] and
    the label count must divide mesh.shape['label'] (use the collator's
    pair_budget to round up).

    kg_shard_axis: optional mesh axis name; when set, the full-KG HGT
    forward inside every training step runs GRAPH-PARALLEL -- edge arrays
    shard over that axis and segment reductions merge over ICI
    (parallel/kg_shard.py) -- instead of being recomputed identically on
    every chip. Exact numerics (f32 psum), exact gradients.
    """
    from ..train.finetune import TrainState

    rep = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("dp"))

    T = int(trainer.batch.labels.shape[0])
    if T % mesh.shape["dp"] != 0:
        raise ValueError(
            f"triple count {T} must divide dp={mesh.shape['dp']}; "
            "collate with a pair_budget rounded to a dp multiple"
        )
    lc = getattr(trainer, "label_chunk", 0)
    if lc:
        Tt = int(trainer.train_batch.labels.shape[0])
        if (Tt // lc) % mesh.shape["dp"] != 0:
            raise ValueError(
                f"label-chunked triple count {Tt} / chunk {lc} must "
                f"divide dp={mesh.shape['dp']} (chunk-aligned shards)"
            )
    L = trainer.cfg.model.prediction_dim
    if L % mesh.shape["label"] != 0:
        raise ValueError(
            f"label count {L} must divide label={mesh.shape['label']}"
        )

    def place_params(path, x):
        keys = [getattr(k, "key", None) for k in path]
        if keys[:2] == ["decoder", "weight"]:
            return jax.device_put(x, NamedSharding(mesh, P("label")))
        return jax.device_put(x, rep)

    params = jax.tree_util.tree_map_with_path(
        place_params, trainer.state.params
    )
    trainer.state = TrainState(
        params=params,
        batch_stats=jax.device_put(trainer.state.batch_stats, rep),
        opt_state=jax.device_put(trainer.state.opt_state, rep),
        epoch=trainer.state.epoch,
    )
    same_view = trainer.train_batch is trainer.batch

    def place_batch(b):
        return dataclasses.replace(
            b,
            head=jax.device_put(b.head, rep),
            tail=jax.device_put(b.tail, rep),
            head_idx=jax.device_put(b.head_idx, dp),
            tail_idx=jax.device_put(b.tail_idx, dp),
            labels=jax.device_put(b.labels, dp),
            pos_neg=jax.device_put(b.pos_neg, dp),
            mask=jax.device_put(b.mask, dp),
        )

    trainer.batch = place_batch(trainer.batch)
    if same_view:
        trainer.train_batch = trainer.batch
    else:
        trainer.train_batch = place_batch(trainer.train_batch)
        trainer.chunk_labels = jax.device_put(trainer.chunk_labels, dp)
    if kg_shard_axis is None:
        trainer.kg = jax.device_put(trainer.kg, rep)
        trainer._kg_table_fn = None
    else:
        from .kg_shard import (
            device_put_kg_sharded,
            make_sharded_kg_table_fn,
            pad_kg_edges_to_multiple,
        )

        kg = pad_kg_edges_to_multiple(
            trainer.kg, int(mesh.shape[kg_shard_axis]))
        trainer.kg = device_put_kg_sharded(kg, mesh, kg_shard_axis)
        trainer._kg_table_fn = make_sharded_kg_table_fn(
            trainer.model, mesh, axis=kg_shard_axis
        )
    trainer.w_all = jax.device_put(trainer.w_all, dp)
    trainer.w_directed = jax.device_put(trainer.w_directed, dp)
    trainer._step = jax.jit(trainer._make_step(), donate_argnums=(0,))
    trainer._split_steps = None  # rebuild lazily on the sharded arrays
    trainer.mesh = mesh
    return trainer


def shard_cl_pretrainer(trainer, mesh: Mesh, kg_shard_axis=None):
    """Data-parallel CL pretraining: replicate params, shard the drug
    batch over 'dp'. The InfoNCE similarity matrix is global over the
    batch, so XLA inserts the all-gather of projected views automatically.

    Requires pretrain_batch_size divisible by mesh.shape['dp'].

    kg_shard_axis: optional mesh axis; when set, the per-step full-KG HGT
    pass runs graph-parallel (edges sharded over that axis,
    parallel/kg_shard.py) instead of replicated per chip.
    """
    rep = NamedSharding(mesh, P())

    if trainer.batch_size % mesh.shape["dp"] != 0:
        raise ValueError(
            f"pretrain batch {trainer.batch_size} must divide "
            f"dp={mesh.shape['dp']}"
        )

    trainer.state = jax.device_put(trainer.state, rep)
    if kg_shard_axis is None:
        trainer.kg = jax.device_put(trainer.kg, rep)
        trainer._kg_table_fn = None
    else:
        from .kg_shard import (
            device_put_kg_sharded,
            make_sharded_kg_table_fn,
            pad_kg_edges_to_multiple,
        )

        kg = pad_kg_edges_to_multiple(
            trainer.kg, int(mesh.shape[kg_shard_axis]))
        trainer.kg = device_put_kg_sharded(kg, mesh, kg_shard_axis)
        trainer._kg_table_fn = make_sharded_kg_table_fn(
            trainer.model, mesh, axis=kg_shard_axis,
            encoder_attr="base_encoder",
        )

    dp = NamedSharding(mesh, P("dp"))
    orig_step = jax.jit(trainer._make_step(), donate_argnums=(0,))

    def sharded_step(state, batch, kg, m1, m2, rng, ids=None):
        m1 = jax.device_put(m1, dp)
        m2 = jax.device_put(m2, dp)
        if ids is not None:
            # device-table CL: the full drug table is replicated; the
            # per-step minibatch (ids + masks) is what shards over dp.
            # Each chip gathers its B/dp rows from its table replica and
            # the InfoNCE all-gather of projected views stays the only
            # collective, exactly as in the host-collate path.
            batch = jax.device_put(batch, rep)
            ids = jax.device_put(ids, dp)
            with mesh:
                return orig_step(state, batch, kg, m1, m2, rng, ids)
        batch = jax.device_put(batch, dp)
        with mesh:
            return orig_step(state, batch, kg, m1, m2, rng)

    trainer._step = sharded_step
    trainer.mesh = mesh
    return trainer
