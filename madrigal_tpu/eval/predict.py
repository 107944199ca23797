"""Prediction / serving API.

TPU-native equivalent of the reference's inference products
(reference: madrigal/evaluate/predict.py):
  * checkpoint -> model reconstruction purely from embedded configs
    (predict.py:20-23,204-209)
  * `make_predictions`: one batch of eval-type-masked pair scores
    (predict.py:173-378)
  * `embed_all_drugs`: the [N, D] embedding table export
    (generate_embeddings.ipynb cell 9)
  * `score_all_pairs`: label-chunked [L, N, N] raw-score export, streaming
    to a host buffer / np.memmap (predict.py:381-463) -- on device this is
    two MXU matmuls per chunk; the rank-normalized variant lives in
    eval/ranks.py + parallel/allpairs.py
  * `score_triples_for_pairs`: [outcome, drugA, drugB] lookups
    (quick_predictions.ipynb; predict.py:582-614)
  * multi-checkpoint sigmoid-mean ensembling (predict.py:466-499)
"""
from __future__ import annotations

import dataclasses
from typing import Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, TrainConfig
from ..data.collate import DDICollator
from ..data.kg import HeteroKGBatch
from ..models.decoder import symmetrize
from ..models.encoder import MadrigalMultilabel
from .masks import get_evaluate_masks


def model_from_checkpoint(path: str):
    """Rebuild (model, variables, cfg) from a checkpoint's embedded config
    (the reference reconstructs NovelDDIMultilabel from encoder_configs /
    model_configs, predict.py:20-23)."""
    from ..train.checkpoint import load_checkpoint

    tree, meta = load_checkpoint(path)
    cfg = meta["cfg"]
    if isinstance(cfg, TrainConfig):
        model_cfg = cfg.model
    elif isinstance(cfg, ModelConfig):
        model_cfg = cfg
    else:
        raise TypeError(type(cfg))
    model = MadrigalMultilabel(
        enc_cfg=model_cfg.encoder,
        prediction_dim=model_cfg.prediction_dim,
        decoder_normalize=model_cfg.decoder_normalize,
    )
    variables = {"params": tree["params"],
                 "batch_stats": tree.get("batch_stats", {})}
    return model, variables, cfg


def embed_all_drugs(
    model: MadrigalMultilabel,
    variables,
    collator: DDICollator,
    kg: HeteroKGBatch,
    drug_ids: Optional[np.ndarray] = None,
    eval_masks: Optional[np.ndarray] = None,
    batch_size: int = 1024,
) -> np.ndarray:
    """[N, D] fused drug embeddings under full (or given) modality masks.

    The KG message pass runs once; drug batches stream through the encoder
    (vs the reference's one giant full batch, predict.py:398-410).
    """
    ds = collator.ds
    drug_ids = (
        np.arange(ds.num_drugs) if drug_ids is None else np.asarray(drug_ids)
    )

    table = model.apply(
        variables, kg,
        method=lambda m, k: m.encoder.kg_drug_table(k, train=False),
    )

    @jax.jit
    def encode(variables, batch):
        return model.apply(
            variables, batch, kg_drug_table=table, train=False,
            method=lambda m, b, kg_drug_table, train: m.encoder.encode(
                b, kg_drug_table=kg_drug_table, train=train
            ),
        )

    outs = []
    for s in range(0, len(drug_ids), batch_size):
        ids = drug_ids[s : s + batch_size]
        batch = collator.drug_batch(ids)
        if eval_masks is not None:
            batch = dataclasses.replace(
                batch, masks=jnp.asarray(eval_masks[ids])
            )
        outs.append(np.asarray(encode(variables, batch)))
    return np.concatenate(outs, axis=0)


def decoder_weight(model, variables) -> np.ndarray:
    """Symmetrized decoder weight [L, D, D]."""
    w = variables["params"]["decoder"]["weight"]
    return np.asarray(symmetrize(jnp.asarray(w)))


def score_all_pairs(
    model: MadrigalMultilabel,
    variables,
    z_head: np.ndarray,
    z_tail: Optional[np.ndarray] = None,
    label_chunk: int = 32,
    out: Optional[np.ndarray] = None,
    compute_dtype=jnp.float32,
    use_pallas: Optional[bool] = None,
) -> np.ndarray:
    """[L, N_head, N_tail] raw scores, label-chunked into `out` (pass an
    np.memmap for reference-format artifact export, predict.py:412-436).

    compute_dtype=float32 (default) keeps per-triple scores at reference
    parity; bfloat16 + the Pallas kernel is the high-throughput export
    path (use_pallas defaults to True on TPU when compute is bf16)."""
    from ..ops.bilinear_pallas import bilinear_scores_pallas

    w_sym = decoder_weight(model, variables)
    L = w_sym.shape[0]
    z_tail = z_head if z_tail is None else z_tail
    if out is None:
        out = np.empty((L, z_head.shape[0], z_tail.shape[0]), np.float32)

    if use_pallas is None:
        use_pallas = (
            jax.default_backend() == "tpu"
            and jnp.dtype(compute_dtype) == jnp.dtype(jnp.bfloat16)
        )

    if use_pallas:
        chunk = jax.jit(lambda zh, zt, w: bilinear_scores_pallas(
            zh, zt, w, out_dtype=jnp.float32, compute_dtype=compute_dtype))
    else:
        @jax.jit
        def chunk(zh, zt, w):
            zh = zh.astype(compute_dtype)
            zt = zt.astype(compute_dtype)

            def body(_, w_l):
                zw = jnp.dot(zh, w_l.astype(compute_dtype),
                             preferred_element_type=jnp.float32)
                return None, jnp.dot(zw.astype(compute_dtype), zt.T,
                                     preferred_element_type=jnp.float32)

            _, s = jax.lax.scan(body, None, w)
            return s

    zh = jnp.asarray(z_head)
    zt = jnp.asarray(z_tail)
    for s in range(0, L, label_chunk):
        e = min(s + label_chunk, L)
        blk = np.asarray(chunk(zh, zt, jnp.asarray(w_sym[s:e])))
        out[s:e] = blk
    return out


def score_triples_for_pairs(
    model, variables, z: np.ndarray,
    triples: Sequence[Tuple[int, int, int]],
) -> np.ndarray:
    """Scores for explicit (label, drugA, drugB) triples
    (quick_predictions path, predict.py:582-614)."""
    L = variables["params"]["decoder"]["weight"].shape[0]
    n = z.shape[0]
    for t in triples:
        if not (0 <= t[0] < L):
            raise ValueError(f"outcome {t[0]} out of range [0, {L})")
        if not (0 <= t[1] < n and 0 <= t[2] < n):
            raise ValueError(f"drug index out of range [0, {n}): {t}")
    labels = jnp.asarray([t[0] for t in triples], jnp.int32)
    a = jnp.asarray(z)[jnp.asarray([t[1] for t in triples], jnp.int32)]
    b = jnp.asarray(z)[jnp.asarray([t[2] for t in triples], jnp.int32)]
    out = model.apply(
        variables, a, b, labels,
        method=lambda m, a, b, l: m.decoder.triples(a, b, l),
    )
    return np.asarray(out)


def make_predictions(
    model,
    variables,
    batch,
    kg,
    eval_type: str,
    finetune_mode: str,
) -> np.ndarray:
    """Sigmoid scores for one collated batch under an eval type's masks
    (predict.py:173-378 make_predictions)."""
    masks_head, masks_tail = get_evaluate_masks(
        np.asarray(batch.head.masks), np.asarray(batch.tail.masks),
        eval_type, finetune_mode,
    )
    head = dataclasses.replace(batch.head, masks=jnp.asarray(masks_head))
    tail = dataclasses.replace(batch.tail, masks=jnp.asarray(masks_tail))
    logits = model.apply(
        variables, head, tail, kg,
        batch.head_idx, batch.tail_idx, batch.labels,
        train=False, method=MadrigalMultilabel.score_triples,
    )
    return np.asarray(jax.nn.sigmoid(logits))


def ensemble_sigmoid_scores_all_pairs(
    seeds,
    label_chunk: int = 32,
    out: Optional[np.ndarray] = None,
    compute_dtype=jnp.float32,
) -> np.ndarray:
    """[L, N, N] sigmoid-mean ensemble of per-seed all-pairs scores
    (reference predict.py:466-499 semantics, streamed per label chunk so
    `out` may be an np.memmap).

    seeds: sequence of (model, variables, z) per checkpoint; all seeds
    must share L and N (the published 5-seed protocol retrains the same
    architecture under different seeds).
    """
    w_syms = np.stack([decoder_weight(m, v) for m, v, _ in seeds])
    zs = jnp.asarray(np.stack([np.asarray(z) for _, _, z in seeds]))
    S, L = w_syms.shape[0], w_syms.shape[1]
    n = zs.shape[1]
    if out is None:
        out = np.empty((L, n, n), np.float32)

    @jax.jit
    def chunk_mean(zs, ws):  # [S, n, d], [S, Lc, d, d] -> [Lc, n, n]
        def per_seed(z, w):
            zc = z.astype(compute_dtype)

            def body(_, w_l):
                zw = jnp.dot(zc, w_l.astype(compute_dtype),
                             preferred_element_type=jnp.float32)
                s = jnp.dot(zw.astype(compute_dtype), zc.T,
                            preferred_element_type=jnp.float32)
                return None, jax.nn.sigmoid(s)

            _, s = jax.lax.scan(body, None, w)
            return s

        return jnp.mean(jax.vmap(per_seed)(zs, ws), axis=0)

    for s in range(0, L, label_chunk):
        e = min(s + label_chunk, L)
        out[s:e] = np.asarray(chunk_mean(zs, jnp.asarray(w_syms[:, s:e])))
    return out


def ensemble_sigmoid_mean(
    score_sets: Iterable[np.ndarray], scores_are_logits: bool = True
) -> np.ndarray:
    """Multi-checkpoint ensembling: mean of sigmoid scores
    (predict.py:466-499).

    `scores_are_logits` is explicit: value-range sniffing would silently
    treat a logit set that happens to land in [0, 1] as probabilities,
    mixing spaces across ensemble members. Pass False when the inputs are
    already sigmoided (e.g. make_predictions output).
    """
    sets = [np.asarray(s) for s in score_sets]
    if scores_are_logits:
        sets = [1.0 / (1.0 + np.exp(-s)) for s in sets]
    return np.mean(sets, axis=0)
