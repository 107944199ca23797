"""DDI finetune trainer (stage 3).

TPU-native re-design of the reference's full-batch finetune loop
(reference: train_ddi_batch.py:45-418): the whole DDI table is one batch;
each epoch re-samples per-drug modality-subset masks on the host (static
shapes), then ONE jitted step computes the mode's 1-3 forwards
(str-str directed / X-X directed / str-X undirected,
train_ddi_batch.py:281-351), with triple-gather scoring instead of the
reference's dense [L, N, N] tensor + fancy indexing (SURVEY.md section 7.3),
and applies the multi-LR AdamW update with per-epoch warmup-cosine
scheduling.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TrainConfig
from ..data.collate import DDIBatch
from ..data.kg import HeteroKGBatch
from ..models.encoder import MadrigalMultilabel, init_multilabel
from .losses import masked_bce
from .masking import FinetuneMasker
from .optim import create_optimizer


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: dict
    batch_stats: dict
    opt_state: object
    epoch: jnp.ndarray


def label_chunk_view(batch: DDIBatch, chunk: int, align: int = 8192):
    """Label-chunked (ELL) TRAINING view of a DDIBatch triple list.

    Sorts the (static, full-batch) triples by label and pads each label's
    run to a multiple of `chunk` (padding rows: mask False), then pads the
    arena to a multiple of `align` (the decoder's scan super-chunk; must
    be a multiple of `chunk`). Every aligned chunk then shares ONE label,
    so the decoder gathers each [D, D] weight slice once per chunk (see
    decoder.triples). Returns (view_batch, chunk_labels[T'//chunk]).

    The loss is a masked sum over triples, so reordering + masked padding
    leaves training numerics identical (tests/test_train.py).
    """
    align = max(align, chunk)
    assert align % chunk == 0
    labels = np.asarray(batch.labels)
    arrays = {
        "head_idx": np.asarray(batch.head_idx),
        "tail_idx": np.asarray(batch.tail_idx),
        "pos_neg": np.asarray(batch.pos_neg),
        "mask": np.asarray(batch.mask),
    }
    order = np.argsort(labels, kind="stable")
    lab_s = labels[order]
    uniq, counts = np.unique(lab_s, return_counts=True)
    padded = ((counts + chunk - 1) // chunk) * chunk
    total = int(padded.sum())
    grand = ((total + align - 1) // align) * align

    run_starts = np.concatenate([[0], np.cumsum(padded)[:-1]])
    in_starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = (np.arange(len(order)) - np.repeat(in_starts, counts)
           + np.repeat(run_starts, counts))

    lab_arena = np.zeros((grand,), labels.dtype)
    lab_arena[:total] = np.repeat(uniq, padded)
    out = {}
    for name, a in arrays.items():
        arena = np.zeros((grand,) + a.shape[1:], a.dtype)
        arena[pos] = a[order]
        out[name] = jnp.asarray(arena)
    view = dataclasses.replace(
        batch,
        head_idx=out["head_idx"],
        tail_idx=out["tail_idx"],
        labels=jnp.asarray(lab_arena),
        pos_neg=out["pos_neg"],
        mask=out["mask"],
    )
    return view, jnp.asarray(lab_arena[::chunk].copy())


class FinetuneTrainer:
    def __init__(
        self,
        cfg: TrainConfig,
        batch: DDIBatch,
        kg: HeteroKGBatch,
        rng: Optional[jax.Array] = None,
        mesh=None,
    ):
        self.cfg = cfg
        self.batch = batch
        self.kg = kg
        self.model = MadrigalMultilabel(
            enc_cfg=cfg.model.encoder,
            prediction_dim=cfg.model.prediction_dim,
            decoder_normalize=cfg.model.decoder_normalize,
            prediction_dim_single_drug=(
                cfg.model.prediction_dim_single_drug
                if cfg.use_single_drug else None
            ),
        )
        rng = jax.random.PRNGKey(cfg.seed) if rng is None else rng
        self.rng, init_rng = jax.random.split(rng)
        variables = init_multilabel(
            self.model, init_rng, batch.head, batch.tail, kg
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        self.tx = create_optimizer(
            params, cfg.optim, warmup_epochs=cfg.warmup_epochs,
            total_epochs=cfg.num_epochs,
            frozen_encoder=getattr(cfg, "frozen", False),
        )
        self.state = TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=self.tx.init(params),
            epoch=jnp.zeros([], jnp.int32),
        )

        from ..constants import NON_TX_MODALITIES

        self.masker = FinetuneMasker(
            cfg.finetune_mode,
            np.asarray(batch.head.masks),
            list(NON_TX_MODALITIES),
            train_with_str_str=cfg.train_with_str_str,
            seed=cfg.seed,
        )

        # label-chunked training view (eval-facing self.batch keeps the
        # collator's triple order; see label_chunk_view)
        self.label_chunk = int(getattr(cfg, "label_chunk_triples", 0) or 0)
        if self.label_chunk:
            self.train_batch, self.chunk_labels = label_chunk_view(
                batch, self.label_chunk)
        else:
            self.train_batch, self.chunk_labels = batch, None

        # edge-side selections (computed once, host side, in the
        # TRAINING view's triple order)
        tb = self.train_batch
        head_g = np.asarray(tb.head.drugs)[np.asarray(tb.head_idx)]
        tail_g = np.asarray(tb.tail.drugs)[np.asarray(tb.tail_idx)]
        base_mask = np.asarray(tb.mask)
        directed = base_mask & (head_g < tail_g)
        if self.masker.edges_directed_only():
            self.w_all = jnp.asarray(directed)
            self.w_directed = jnp.asarray(directed)
        else:
            self.w_all = jnp.asarray(base_mask)
            self.w_directed = jnp.asarray(directed)

        # graph-parallel KG seam: when set (parallel/train_step.py
        # shard_finetune_trainer(kg_shard_axis=...)), fn(params, kg) runs
        # the HGT edge-sharded under shard_map and returns the replicated
        # drug table; gradients flow through it into the HGT weights
        self._kg_table_fn = None
        self._step = jax.jit(self._make_step(), donate_argnums=(0,))
        self._split_steps = None  # built lazily (cfg.split_forward_grads)

    # ------------------------------------------------------------------
    def _forward_loss(self, params, batch_stats, batch, kg, masks_head,
                      masks_tail, weights, dropout_rng, chunk_labels=None,
                      kg_table=None):
        # batch/kg are jit ARGUMENTS, not closure captures: closure
        # constants are serialized into the compiled program, which at
        # reference scale (6843 drugs x 16 cell lines x 978 genes + 8.3M
        # KG edges + ~1M triples) is gigabytes of baked-in literals.
        # kg_table: precomputed drug table passed as a differentiable
        # argument (the split_share_kg_table seam; see _kg_table_pure).
        head = dataclasses.replace(batch.head, masks=masks_head)
        tail = dataclasses.replace(batch.tail, masks=masks_tail)
        table = kg_table if kg_table is not None else (
            None if self._kg_table_fn is None
            else self._kg_table_fn(params, kg))
        out, updates = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            head, tail, kg,
            batch.head_idx, batch.tail_idx, batch.labels,
            kg_drug_table=table,
            train=True,
            chunk_labels=chunk_labels,
            label_chunk=self.label_chunk,
            method=MadrigalMultilabel.score_triples,
            mutable=["batch_stats"],
            rngs={"dropout": dropout_rng},
        )
        loss = masked_bce(
            out, batch.pos_neg, weights, self.cfg.loss_readout
        )
        return loss, updates["batch_stats"]

    def _make_step(self):
        three_way = self.masker.uses_three_way_loss
        with_str_str = self.cfg.train_with_str_str
        fwd = self._forward_loss
        if getattr(self.cfg, "remat_forwards", False):
            # backward recomputes each forward instead of holding all (up
            # to 3) forwards' activations -- the full-batch-at-scale
            # memory knob (cfg.remat_forwards)
            fwd = jax.checkpoint(fwd)

        def step(state: TrainState, batch, kg, w_all, w_directed,
                 masks_head, masks_tail, rng, chunk_labels=None):
            def loss_fn(params):
                bs = state.batch_stats
                rngs = jax.random.split(rng, 3)
                losses = {}
                if three_way:
                    # barrier-carry between the forwards: with remat, XLA
                    # otherwise interleaves all three recomputations and
                    # the peak memory win disappears
                    def fence(m, prev):
                        if not getattr(self.cfg, "remat_forwards", False):
                            return m
                        m, _ = jax.lax.optimization_barrier((m, prev))
                        return m

                    total = 0.0
                    prev = jnp.zeros(())
                    if with_str_str:
                        l, bs = fwd(
                            params, bs, batch, kg, masks_head, masks_head,
                            w_directed, rngs[0], chunk_labels,
                        )
                        losses["str_str"] = l
                        total = total + l
                        prev = l
                    # X-X directed
                    l, bs = fwd(
                        params, bs, batch, kg, fence(masks_tail, prev),
                        masks_tail, w_directed, rngs[1], chunk_labels,
                    )
                    losses["X_X"] = l
                    total = total + l
                    # str-X undirected
                    l, bs = fwd(
                        params, bs, batch, kg, fence(masks_head, l),
                        masks_tail, w_all, rngs[2], chunk_labels,
                    )
                    losses["str_X"] = l
                    total = total + l
                else:
                    total, bs = fwd(
                        params, bs, batch, kg, masks_head, masks_tail,
                        w_all, rngs[0], chunk_labels,
                    )
                losses["total"] = total
                return total, (losses, bs)

            (loss, (losses, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            updates, new_opt = self.tx.update(
                grads, state.opt_state, state.params
            )
            new_params = jax.tree_util.tree_map(
                lambda p, u: p + u, state.params, updates
            )
            return TrainState(
                params=new_params,
                batch_stats=new_bs,
                opt_state=new_opt,
                epoch=state.epoch + 1,
            ), losses

        return step

    # -- split-forward gradient accumulation ---------------------------
    def _kg_table_pure(self, params, kg):
        """The full-KG drug table as a pure function of params.

        Exactly the table _forward_loss computes internally: through the
        graph-parallel seam when one is installed, else a plain full-graph
        apply. The KG encoders are dropout- and batch_stats-free, so this
        needs no rngs and matches the in-forward computation bitwise.
        """
        if self._kg_table_fn is not None:
            return self._kg_table_fn(params, kg)
        return self.model.apply(
            {"params": params}, kg,
            method=lambda m, k: m.encoder.kg_drug_table(k, train=True),
        )

    def _make_split_steps(self):
        """Per-forward value_and_grad + a gradient-apply step
        (cfg.split_forward_grads): gradient-of-sum == sum-of-gradients,
        so accumulating across the (up to 3) forwards matches the fused
        3-forward step numerically while each compiled program holds only
        ONE forward (the fused program at reference scale can exhaust the
        XLA compiler's memory, not just the device's)."""
        fwd = self._forward_loss
        if getattr(self.cfg, "remat_forwards", False):
            fwd = jax.checkpoint(fwd)

        @jax.jit
        def grad_step(params, batch_stats, batch, kg, masks_head,
                      masks_tail, weights, rng, chunk_labels=None):
            (loss, new_bs), grads = jax.value_and_grad(
                fwd, has_aux=True
            )(params, batch_stats, batch, kg, masks_head, masks_tail,
              weights, rng, chunk_labels)
            return loss, grads, new_bs

        @jax.jit
        def grad_step_tab(params, batch_stats, batch, kg, kg_table,
                          masks_head, masks_tail, weights, rng,
                          chunk_labels=None):
            # table-as-argument forward: no KG message passing inside;
            # returns the cotangent wrt the table alongside the (KG-zero)
            # param gradients
            def f(p, tab):
                return fwd(p, batch_stats, batch, kg, masks_head,
                           masks_tail, weights, rng, chunk_labels, tab)

            (loss, new_bs), (g_p, g_tab) = jax.value_and_grad(
                f, argnums=(0, 1), has_aux=True
            )(params, kg_table)
            return loss, g_p, g_tab, new_bs

        @jax.jit
        def table_fwd(params, kg):
            return self._kg_table_pure(params, kg)

        @jax.jit
        def table_bwd(params, kg, table_bar):
            # one KG backward for the summed cotangents: grads of
            # <table(params), table_bar>. VJPs are linear in the
            # cotangent, so this equals the fused step's CSE-shared KG
            # backward with the accumulated per-forward cotangents.
            def dot(p):
                return jnp.vdot(self._kg_table_pure(p, kg), table_bar)

            return jax.grad(dot)(params)

        @jax.jit
        def accum(a, b):
            return jax.tree_util.tree_map(jnp.add, a, b)

        @jax.jit
        def apply_step(state: TrainState, grads, new_bs):
            updates, new_opt = self.tx.update(
                grads, state.opt_state, state.params
            )
            new_params = jax.tree_util.tree_map(
                lambda p, u: p + u, state.params, updates
            )
            return TrainState(
                params=new_params, batch_stats=new_bs, opt_state=new_opt,
                epoch=state.epoch + 1,
            )

        return {
            "grad_step": grad_step,
            "grad_step_tab": grad_step_tab,
            "table_fwd": table_fwd,
            "table_bwd": table_bwd,
            "accum": accum,
            "apply_step": apply_step,
        }

    def _split_epoch(self, mh, mt, rng) -> Dict[str, float]:
        if self._split_steps is None:
            self._split_steps = self._make_split_steps()
        steps = self._split_steps
        accum = steps["accum"]
        rngs = jax.random.split(rng, 3)
        plan = []  # (name, masks_head, masks_tail, weights, rng)
        if self.masker.uses_three_way_loss:
            if self.cfg.train_with_str_str:
                plan.append(("str_str", mh, mh, self.w_directed, rngs[0]))
            plan.append(("X_X", mt, mt, self.w_directed, rngs[1]))
            plan.append(("str_X", mh, mt, self.w_all, rngs[2]))
        else:
            plan.append(("total", mh, mt, self.w_all, rngs[0]))

        # sharing the KG pass only pays off across >1 forwards (a single
        # forward already computes the table exactly once)
        share = len(plan) > 1 and getattr(
            self.cfg, "split_share_kg_table", True)

        losses: Dict[str, float] = {}
        grads = None
        bs = self.state.batch_stats
        if share:
            table = steps["table_fwd"](self.state.params, self.kg)
            table_bar = None
            for name, h, t, w, r in plan:
                loss, g, g_tab, bs = steps["grad_step_tab"](
                    self.state.params, bs, self.train_batch, self.kg,
                    table, h, t, w, r, self.chunk_labels,
                )
                losses[name] = loss
                grads = g if grads is None else accum(grads, g)
                table_bar = (g_tab if table_bar is None
                             else steps["accum"](table_bar, g_tab))
            kg_grads = steps["table_bwd"](
                self.state.params, self.kg, table_bar)
            grads = accum(grads, kg_grads)
        else:
            for name, h, t, w, r in plan:
                loss, g, bs = steps["grad_step"](
                    self.state.params, bs, self.train_batch, self.kg,
                    h, t, w, r, self.chunk_labels,
                )
                losses[name] = loss
                grads = g if grads is None else accum(grads, g)
        self.state = steps["apply_step"](self.state, grads, bs)
        losses["total"] = sum(losses.values()) if len(plan) > 1 else (
            losses[plan[0][0]])
        return {k: float(v) for k, v in losses.items()}

    # ------------------------------------------------------------------
    def train_epoch(self) -> Dict[str, float]:
        mh, mt = self.masker.sample_epoch()
        self.rng, key = jax.random.split(self.rng)
        if getattr(self.cfg, "split_forward_grads", False):
            return self._split_epoch(
                jnp.asarray(mh), jnp.asarray(mt), key)
        self.state, losses = self._step(
            self.state, self.train_batch, self.kg, self.w_all,
            self.w_directed, jnp.asarray(mh), jnp.asarray(mt), key,
            self.chunk_labels,
        )
        return {k: float(v) for k, v in losses.items()}

    def predict_scores(self, masks_head=None, masks_tail=None):
        """Sigmoid triple scores for evaluation (eval-mode forward)."""
        head = self.batch.head
        tail = self.batch.tail
        if masks_head is not None:
            head = dataclasses.replace(head, masks=jnp.asarray(masks_head))
        if masks_tail is not None:
            tail = dataclasses.replace(tail, masks=jnp.asarray(masks_tail))
        out = self.model.apply(
            {"params": self.state.params,
             "batch_stats": self.state.batch_stats},
            head, tail, self.kg,
            self.batch.head_idx, self.batch.tail_idx, self.batch.labels,
            train=False,
            method=MadrigalMultilabel.score_triples,
        )
        return jax.nn.sigmoid(out)
