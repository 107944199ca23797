"""Contrastive (SimCLR) pretraining loop -- stage 2.

TPU-native re-design of the reference's pretrain entry
(reference: pretrain.py:41-292): drugs with >=2 modalities, per-epoch
modality-subset mask sampling from precomputed banks, shared-encoder
two-view forward, InfoNCE loss, per-epoch half-cycle-cosine LR with the
batch-size/512 scaling rule (pretrain.py:173), AdamW/LARS.

The reference iterates minibatches via a DataLoader; here each jitted step
consumes a fixed-size drug batch (static shapes), with host-side mask
sampling per step.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import PretrainConfig
from ..data.collate import DDICollator
from ..data.kg import HeteroKGBatch
from ..models.simclr import SimCLRModel
from .optim import half_cycle_cosine_schedule, lars
from .pretrain_masks import get_pretrain_masks, sample_pretrain_masks


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CLTrainState:
    params: dict
    batch_stats: dict
    opt_state: object
    step: jnp.ndarray


class CLPretrainer:
    def __init__(
        self,
        cfg: PretrainConfig,
        collator: DDICollator,
        kg: HeteroKGBatch,
        drug_ids: Optional[np.ndarray] = None,
        rng: Optional[jax.Array] = None,
        device_table: bool = False,
    ):
        self.cfg = cfg
        self.collator = collator
        self.kg = kg
        ds = collator.ds
        masks = np.asarray(ds.masks)
        if drug_ids is None:
            # drugs with >= 2 modalities (reference data.py:280-284)
            drug_ids = np.where((1 - masks).sum(axis=1) >= 2)[0]
        self.drug_ids = np.asarray(drug_ids)
        self.width = masks.shape[1]

        self.mask_banks = get_pretrain_masks(
            self.drug_ids, masks[self.drug_ids], cfg.pretrain_mode,
            cfg.pretrain_unbalanced, cfg.pretrain_tx_downsample_ratio,
        )

        self.model = SimCLRModel(
            enc_cfg=cfg.encoder,
            mlp_dim=cfg.moco_mlp_dim,
            temperature=cfg.moco_t,
            shared_predictor=cfg.shared_predictor,
            raw_encoder_output=cfg.raw_encoder_output,
        )

        self.np_rng = np.random.RandomState(cfg.seed)
        rng = jax.random.PRNGKey(cfg.seed) if rng is None else rng
        self.rng, init_rng = jax.random.split(rng)

        bsz = min(cfg.pretrain_batch_size, len(self.drug_ids))
        self.batch_size = bsz
        # device-table mode: the full [0, N) drug table lives on device
        # once (the same collator-cache entry the finetune CLI pins) and
        # every step gathers its minibatch rows ON DEVICE by id; the
        # host's per-step job shrinks from pack_molecules(768) + a
        # ~50 MB tx slice to drawing ids + two [B, W] masks. On a
        # single-core host the old path is collate-bound (measured
        # 15-60 s/step at reference scale vs 0.59 s device step --
        # docs/CLI_WALL.md); this path keeps the step device-bound.
        # Numerics note: one modality-token pass serves both views, so
        # encoder dropout draws / BN batch stats are shared across views
        # and BN stats are computed over the full table, not the
        # minibatch (the views still differ by their modality masks,
        # which IS the CL augmentation -- reference simclr.py:110-140).
        self.full_batch = (
            collator.drug_batch(np.arange(ds.num_drugs))
            if device_table else None
        )
        batch = collator.drug_batch(self.drug_ids[:bsz])
        m1, m2 = self._sample_masks(self.drug_ids[:bsz])
        variables = self.model.init(
            init_rng, batch, kg, jnp.asarray(m1), jnp.asarray(m2),
            method=SimCLRModel.warmup,
        )

        # lr scaled by batch_size / 512 (pretrain.py:173)
        lr = cfg.pretrain_lr * bsz / 512.0
        sched = half_cycle_cosine_schedule(
            lr, cfg.warmup_epochs, cfg.pretrain_num_epochs
        )
        if cfg.pretrain_optimizer == "adamw":
            self.tx = optax.adamw(
                sched, b1=cfg.pretrain_beta1, b2=cfg.pretrain_beta2,
                eps=cfg.pretrain_eps, weight_decay=cfg.pretrain_wd,
            )
        elif cfg.pretrain_optimizer == "lars":
            self.tx = lars(sched, weight_decay=cfg.pretrain_wd,
                           momentum=cfg.pretrain_momentum)
        else:
            raise NotImplementedError(cfg.pretrain_optimizer)
        # the chemCPA drug_embeddings table is frozen rdkit2D descriptors
        # in the reference (chemCPA/embedding.py:10-20) -- mask it out
        self.tx = optax.multi_transform(
            {"train": self.tx, "frozen": optax.set_to_zero()},
            jax.tree_util.tree_map_with_path(
                lambda path, _: (
                    "frozen"
                    if {"drug_embeddings", "tx_encoder"} <=
                    {k.key for k in path} else "train"
                ),
                variables["params"],
            ),
        )

        self.state = CLTrainState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.tx.init(variables["params"]),
            step=jnp.zeros([], jnp.int32),
        )
        # graph-parallel KG seam (parallel/train_step.py
        # shard_cl_pretrainer(kg_shard_axis=...)): fn(params, kg) -> table
        self._kg_table_fn = None
        self._step = jax.jit(self._make_step(), donate_argnums=(0,))

    def _sample_masks(self, drugs):
        return sample_pretrain_masks(
            self.mask_banks, drugs, self.cfg.pretrain_mode,
            self.cfg.pretrain_unbalanced, self.np_rng, self.width,
        )

    def _make_step(self):
        use_ids = self.full_batch is not None

        def step(state: CLTrainState, batch, kg, m1, m2, rng, ids=None):
            def loss_fn(params):
                # kg is a step ARGUMENT (closure constants are serialized
                # into the compile payload -- see finetune._forward_loss)
                table = (None if self._kg_table_fn is None
                         else self._kg_table_fn(params, kg))
                (_, _, (_, _, loss)), updates = self.model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    batch, kg, m1, m2, kg_drug_table=table,
                    ids=(ids if use_ids else None), train=True,
                    mutable=["batch_stats"], rngs={"dropout": rng},
                )
                return loss, updates["batch_stats"]

            (loss, new_bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            updates, new_opt = self.tx.update(
                grads, state.opt_state, state.params
            )
            new_params = optax.apply_updates(state.params, updates)
            return CLTrainState(
                params=new_params, batch_stats=new_bs, opt_state=new_opt,
                step=state.step + 1,
            ), loss

        return step

    def _host_batch(self):
        """Host-side collate for one step: sample drugs, draw the two
        subset masks, and -- host-collate mode only -- pack molecules
        (numpy throughout; device transfer is the prefetcher's job).
        Device-table mode returns (ids, m1, m2): the minibatch itself is
        gathered on device from self.full_batch inside the step."""
        ids = (
            self.np_rng.choice(self.drug_ids, self.batch_size, replace=False)
            if len(self.drug_ids) > self.batch_size else self.drug_ids
        )
        m1, m2 = self._sample_masks(ids)
        if self.full_batch is not None:
            return ids.astype(np.int32), m1, m2
        batch = self.collator.drug_batch(ids)
        return batch, m1, m2

    def _dispatch_step(self, payload, key):
        batch_or_ids, m1, m2 = payload
        if self.full_batch is not None:
            return self._step(
                self.state, self.full_batch, self.kg, jnp.asarray(m1),
                jnp.asarray(m2), key, jnp.asarray(batch_or_ids),
            )
        return self._step(
            self.state, batch_or_ids, self.kg, jnp.asarray(m1),
            jnp.asarray(m2), key,
        )

    def train_step(self) -> float:
        """One step over a random drug batch (epoch for small datasets).
        Synchronous host collate + blocking loss read; the production
        loop is train_steps (prefetch-overlapped)."""
        self.rng, key = jax.random.split(self.rng)
        self.state, loss = self._dispatch_step(self._host_batch(), key)
        return float(loss)

    def train_steps(self, num_steps: int, buffer_size: int = 2):
        """`num_steps` steps with the double-buffered host->device
        prefetch (data/pipeline.py): a background thread collates batch
        t+1 (pack_molecules + mask sampling, the reference DataLoader
        workers' role, parse_args.py:109) while the device runs step t,
        and losses stay device-resident until the end instead of forcing
        a tunnel read-back every step. Same rng streams as num_steps
        train_step() calls -> identical losses (tested). In device-table
        mode the prefetched payload is just (ids, m1, m2)."""
        from ..data.pipeline import prefetch_epochs

        losses = []
        for payload in prefetch_epochs(
                lambda _s: self._host_batch(), num_steps, buffer_size):
            self.rng, key = jax.random.split(self.rng)
            self.state, loss = self._dispatch_step(payload, key)
            losses.append(loss)
        return [float(l) for l in losses]

    def encoder_variables(self) -> dict:
        """base_encoder subtree for CL->finetune transfer."""
        return {
            "params": self.state.params["base_encoder"],
            "batch_stats": self.state.batch_stats.get("base_encoder", {}),
        }
