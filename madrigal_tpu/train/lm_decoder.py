"""LM-decoder training stack: zero-shot outcome generalization.

TPU-native re-design of the reference's LM_decoder pipeline
(reference: LM_decoder/train_ddi_mistral.py, LM_decoder/data.py,
LM_decoder/model.py): outcome descriptions are embedded once by a language
model (host-side, LM_decoder/embeddings.py -> models/lm_decoder.
extract_text_embeddings); the DDI table is split BY OUTCOME CLASS
('split_by_classes') so evaluation outcomes are never seen in training;
an LMDecoder head scores (frozen drug embedding, frozen drug embedding,
outcome-text embedding) triples with BCE, enabling prediction for outcomes
described only by text.

Design deltas from the reference (all TPU-motivated):
  * the Madrigal drug-embedding table is computed ONCE and frozen
    (one encoder pass over all drugs) instead of re-encoding both drugs
    through the full multimodal encoder per minibatch -- the head sees
    identical inputs, and each step is a tiny MXU-friendly gather+MLP;
  * minibatches are fixed-size index arrays into device-resident tables
    (drug table [N, D], text table [L, lm_dim]) so one jitted step serves
    every batch;
  * paraphrase augmentation (the reference samples one of 10 description
    variants per row per step, train_ddi_mistral.py:146-149) is a gather
    from a [P, L, lm_dim] bank with jax.random.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.lm_decoder import LMDecoder


def split_by_outcome_classes(
    edge_df,
    eval_frac: float = 0.2,
    seed: int = 0,
) -> Tuple["object", "object", np.ndarray, np.ndarray]:
    """Partition a long DDI table by OUTCOME class (the reference's
    'split_by_classes' split, LM_decoder/data.py:336): a random
    `eval_frac` of the label ids moves entirely to the eval table, so
    eval outcomes are zero-shot. Returns (train_df, eval_df,
    train_labels, eval_labels)."""
    rng = np.random.RandomState(seed)
    labels = np.unique(edge_df["label_indexed"].values)
    # eval_frac <= 0 means NO zero-shot holdout (every outcome trains);
    # any positive fraction holds out at least one class
    n_eval = (0 if eval_frac <= 0
              else max(1, int(round(len(labels) * eval_frac))))
    perm = rng.permutation(labels)
    eval_labels = np.sort(perm[:n_eval])
    train_labels = np.sort(perm[n_eval:])
    is_eval = edge_df["label_indexed"].isin(eval_labels).values
    train_df = edge_df[~is_eval].reset_index(drop=True)
    eval_df = edge_df[is_eval].reset_index(drop=True)
    return train_df, eval_df, train_labels, eval_labels


def build_lm_table(
    edge_df,
    num_drugs: int,
    num_neg_per_pos: int = 1,
    seed: int = 0,
) -> Dict[str, np.ndarray]:
    """Long (head, tail, label, pos_neg) arrays with tail-corruption
    negatives per positive (the reference's LM CSVs carry a precomputed
    pos_neg column; this builds the same layout from a positive-only edge
    table). Negatives keep the outcome so the head learns text-conditional
    discrimination."""
    rng = np.random.RandomState(seed)
    heads = edge_df["head"].values.astype(np.int32)
    tails = edge_df["tail"].values.astype(np.int32)
    labels = edge_df["label_indexed"].values.astype(np.int32)
    pos = {(int(h), int(t), int(l))
           for h, t, l in zip(heads, tails, labels)}

    neg_h, neg_t, neg_l = [], [], []
    for h, t, l in zip(heads, tails, labels):
        for _ in range(num_neg_per_pos):
            for _attempt in range(20):
                cand = int(rng.randint(num_drugs))
                if cand != int(h) and (int(h), cand, int(l)) not in pos:
                    neg_h.append(h)
                    neg_t.append(cand)
                    neg_l.append(l)
                    break
            # else: every draw collided (dense head under this outcome) --
            # emit NOTHING rather than a known positive labeled negative

    out_h = np.concatenate([heads, np.asarray(neg_h, np.int32)])
    out_t = np.concatenate([tails, np.asarray(neg_t, np.int32)])
    out_l = np.concatenate([labels, np.asarray(neg_l, np.int32)])
    pos_neg = np.concatenate([
        np.ones(len(heads), np.float32),
        np.zeros(len(neg_h), np.float32),
    ])
    order = rng.permutation(len(out_h))
    return {"head": out_h[order], "tail": out_t[order],
            "label": out_l[order], "pos_neg": pos_neg[order]}


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LMTrainState:
    params: dict
    opt_state: object
    step: jnp.ndarray


class LMDecoderTrainer:
    """BCE training of the LMDecoder head over (head, tail, outcome-text)
    triples with a frozen drug-embedding table.

    drug_table: [N, D] frozen Madrigal embeddings (embed_all_drugs output).
    text_table: [L, lm_dim] outcome-description embeddings, or a
        paraphrase bank [P, L, lm_dim] (one variant sampled per row per
        training step; evaluation averages metrics over all variants,
        reference train_ddi_mistral.py:196-240).
    """

    def __init__(
        self,
        drug_table: np.ndarray,
        text_table: np.ndarray,
        project_dim: int = 256,
        mlp_dim: int = 512,
        dropout: float = 0.1,
        self_att: bool = True,
        num_heads: int = 4,
        normalize: bool = False,
        lr: float = 1e-3,
        pos_weight: Optional[float] = None,
        seed: int = 0,
    ):
        self.drug_table = jnp.asarray(drug_table)
        text_table = np.asarray(text_table)
        self.paraphrase = text_table.ndim == 3
        self.text_table = jnp.asarray(text_table)
        lm_dim = text_table.shape[-1]
        self.model = LMDecoder(
            lm_emb_dim=lm_dim, drug_dim=drug_table.shape[1],
            project_dim=project_dim, mlp_dim=mlp_dim, dropout=dropout,
            self_att=self_att, num_heads=num_heads, normalize=normalize,
        )
        self.pos_weight = pos_weight
        self.rng = jax.random.PRNGKey(seed)
        self.rng, k = jax.random.split(self.rng)
        zd = self.drug_table[:1]
        zt = (self.text_table[0, :1] if self.paraphrase
              else self.text_table[:1])
        variables = self.model.init(k, zd, zd, zt, train=False)
        self.tx = optax.adam(lr)
        self.state = LMTrainState(
            params=variables["params"],
            opt_state=self.tx.init(variables["params"]),
            step=jnp.zeros([], jnp.int32),
        )
        self._step = jax.jit(self._make_step())
        self._score = jax.jit(self._make_score())

    # ------------------------------------------------------------------
    def _logits(self, params, head, tail, text, rng, train):
        zh = self.drug_table[head]
        zt = self.drug_table[tail]
        kwargs = {"rngs": {"dropout": rng}} if train else {}
        return self.model.apply(
            {"params": params}, zh, zt, text, train=train, **kwargs
        )

    def _make_step(self):
        def step(state: LMTrainState, head, tail, label, pos_neg, rng):
            r_drop, r_para = jax.random.split(rng)
            if self.paraphrase:
                P = self.text_table.shape[0]
                which = jax.random.randint(r_para, (head.shape[0],), 0, P)
                text = self.text_table[which, label]
            else:
                text = self.text_table[label]

            def loss_fn(params):
                logits = self._logits(params, head, tail, text, r_drop,
                                      True)
                if self.pos_weight is not None:
                    # BCEWithLogits + pos_weight ('bce_with_weight')
                    log_p = jax.nn.log_sigmoid(logits)
                    log_np = jax.nn.log_sigmoid(-logits)
                    losses = -(self.pos_weight * pos_neg * log_p
                               + (1.0 - pos_neg) * log_np)
                else:
                    # reference default 'bce': sigmoid + BCELoss
                    losses = optax.sigmoid_binary_cross_entropy(
                        logits, pos_neg
                    )
                return jnp.mean(losses)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.params)
            params = optax.apply_updates(state.params, updates)
            return LMTrainState(params=params, opt_state=opt_state,
                                step=state.step + 1), loss

        return step

    def _make_score(self):
        def score(params, head, tail, text):
            return jax.nn.sigmoid(
                self._logits(params, head, tail, text,
                             jax.random.PRNGKey(0), False)
            )

        return score

    # ------------------------------------------------------------------
    def _validate_table(self, table: Dict[str, np.ndarray]) -> None:
        """Reject out-of-range ids up front: jitted jnp gathers CLAMP bad
        indices to the last row, which would silently train/evaluate
        against wrong embeddings."""
        n_drugs = int(self.drug_table.shape[0])
        n_out = int(self.text_table.shape[-2])
        for name, limit in (("head", n_drugs), ("tail", n_drugs),
                            ("label", n_out)):
            arr = np.asarray(table[name])
            if len(arr) and (arr.min() < 0 or arr.max() >= limit):
                raise ValueError(
                    f"table['{name}'] ids in [{arr.min()}, {arr.max()}] "
                    f"out of range for a table of {limit} rows -- the "
                    f"{'drug' if name != 'label' else 'text'}-embedding "
                    "table does not cover this dataset"
                )

    def train_epoch(self, table: Dict[str, np.ndarray],
                    batch_size: int = 512) -> float:
        """One pass over the (shuffled) long table; returns mean loss."""
        self._validate_table(table)
        n = len(table["head"])
        self.rng, k = jax.random.split(self.rng)
        order = np.asarray(
            jax.random.permutation(k, n)
        )
        total, batches = 0.0, 0
        for s in range(0, n, batch_size):
            idx = order[s: s + batch_size]
            if len(idx) < batch_size:  # pad to the jitted shape
                idx = np.concatenate(
                    [idx, order[: batch_size - len(idx)]]
                )
            self.rng, k = jax.random.split(self.rng)
            self.state, loss = self._step(
                self.state,
                jnp.asarray(table["head"][idx]),
                jnp.asarray(table["tail"][idx]),
                jnp.asarray(table["label"][idx]),
                jnp.asarray(table["pos_neg"][idx]),
                k,
            )
            total += float(loss)
            batches += 1
        return total / max(batches, 1)

    def predict(self, table: Dict[str, np.ndarray],
                variant: Optional[int] = None,
                batch_size: int = 2048) -> np.ndarray:
        """Sigmoid scores; `variant` picks a paraphrase bank row."""
        self._validate_table(table)
        head = np.asarray(table["head"])
        tail = np.asarray(table["tail"])
        label = np.asarray(table["label"])
        texts = (self.text_table[variant or 0] if self.paraphrase
                 else self.text_table)
        out = []
        for s in range(0, len(head), batch_size):
            sl = slice(s, s + batch_size)
            out.append(np.asarray(self._score(
                self.state.params,
                jnp.asarray(head[sl]), jnp.asarray(tail[sl]),
                texts[jnp.asarray(label[sl])],
            )))
        return np.concatenate(out)

    def evaluate(self, table: Dict[str, np.ndarray], k: int = 50
                 ) -> Dict[str, float]:
        """Binary metrics on (typically zero-shot-outcome) triples; with a
        paraphrase bank, metrics average over every description variant
        (reference evaluate_paraphrased, train_ddi_mistral.py:196-253)."""
        from ..eval.metrics import get_metrics_binary

        ys = np.asarray(table["pos_neg"])
        k = min(k, len(ys))
        if not self.paraphrase:
            return get_metrics_binary(self.predict(table), ys, k)
        per = [
            get_metrics_binary(self.predict(table, variant=i), ys, k)
            for i in range(int(self.text_table.shape[0]))
        ]
        return {
            name: float(np.mean([m[name] for m in per]))
            for name in per[0]
        }
