"""Contrastive-pretraining evaluation orchestration.

Port of the reference's evaluate_pt / evaluate_pretrain_subsets /
save_embeds flow (reference: madrigal/evaluate/evaluate.py:254-504,
eval_utils.py:308-383): encode drugs under single-modality masks, compute
per-modality-pair retrieval top-k, FOSCTTM, alignment/uniformity, and
export per-modality embedding tables.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import NON_TX_MODALITIES, NUM_MODALITIES
from .cl_metrics import (
    alignment_loss,
    foscttm,
    retrieval_topk_accuracy,
    uniform_loss,
)

# modalities the reference saves/evaluates (eval_utils.py:322-329)
DEFAULT_EVAL_MODALITY_INDICES = tuple(
    list(range(len(NON_TX_MODALITIES)))
    + [len(NON_TX_MODALITIES) + i for i, c in
       enumerate(("a375", "a549", "asc", "ha1e", "hcc515", "hec108", "hela",
                   "hepg2", "ht29", "huvec", "mcf7", "npc", "pc3", "thp1",
                   "vcap", "yapc")) if c in ("mcf7", "pc3", "vcap")]
)


def encode_single_modality(
    encoder_apply,
    variables,
    collator,
    kg,
    drug_ids: np.ndarray,
    modality_index: int,
    raw_encoder_output: bool = True,
    batch_size: int = 1024,
) -> np.ndarray:
    """Embed the drugs that HAVE `modality_index`, masked to only it
    (save_embeds semantics, eval_utils.py:308-383). Returns [n_valid, D]
    aligned with `valid_drug_ids` (second return)."""
    masks = np.asarray(collator.ds.masks)
    valid = drug_ids[~masks[drug_ids, modality_index]]
    outs = []
    for s in range(0, len(valid), batch_size):
        ids = valid[s : s + batch_size]
        batch = collator.drug_batch(ids)
        m = np.ones((len(ids), NUM_MODALITIES), dtype=bool)
        m[:, modality_index] = False
        batch = dataclasses.replace(batch, masks=jnp.asarray(m))
        z = encoder_apply(variables, batch, kg, raw_encoder_output)
        outs.append(np.asarray(z))
    return (np.concatenate(outs) if outs else
            np.zeros((0, 1), np.float32)), valid


def evaluate_pt(
    encoder_apply,
    variables,
    collator,
    kg,
    drug_ids: np.ndarray,
    modality_indices: Sequence[int] = DEFAULT_EVAL_MODALITY_INDICES,
    topk=(1, 5, 20),
    raw_encoder_output: bool = True,
) -> Dict[str, float]:
    """Cross-modality retrieval metrics over all modality pairs with
    shared drugs (evaluate.py:254-400 evaluate_pt core)."""
    embeds: Dict[int, np.ndarray] = {}
    ids: Dict[int, np.ndarray] = {}
    for mi in modality_indices:
        z, valid = encode_single_modality(
            encoder_apply, variables, collator, kg, drug_ids, mi,
            raw_encoder_output,
        )
        if len(valid) > 0:
            embeds[mi] = z
            ids[mi] = valid

    metrics: Dict[str, float] = {}
    for a in embeds:
        metrics[f"uniformity_{a}"] = uniform_loss(embeds[a]) \
            if len(embeds[a]) > 2 else float("nan")
        for b in embeds:
            if b <= a:
                continue
            shared, ia, ib = np.intersect1d(
                ids[a], ids[b], return_indices=True
            )
            if len(shared) < 3:
                continue
            za, zb = embeds[a][ia], embeds[b][ib]
            accs = retrieval_topk_accuracy(za, zb, topk)
            for k, acc in zip(topk, accs):
                metrics[f"top{k}_{a}_{b}"] = acc
            mu, _ = foscttm(zb, za)
            metrics[f"foscttm_{a}_{b}"] = mu
            metrics[f"alignment_{a}_{b}"] = alignment_loss(za, zb)
    return metrics


def evaluate_final_embeds(
    outputs: Dict[str, Dict[str, dict]],
    save_dir: Optional[str] = None,
    run_geomca: bool = True,
    geomca_kwargs: Optional[dict] = None,
    logger=None,
) -> Dict[str, Dict[str, float]]:
    """End-of-pretraining alignment table over saved per-modality embeds.

    Port of the reference's `evaluate_final_embeds`/`get_alignment_metrics`
    (reference: madrigal/evaluate/evaluate.py:456-504): for every split and
    every modality pair in the `save_embeds` output, intersect the drug
    sets, align the embeddings, and compute alignment / per-side
    uniformity / FOSCTTM plus the GeomCA connected-component stats
    (precision, recall, network consistency, network quality) the
    reference logs per pair. Returns {"<split> <a> v <b>": {metric: v}}
    and writes `final_embeds_metrics.json` when `save_dir` is given.
    """
    from itertools import combinations

    from .geomca import geomca

    table: Dict[str, Dict[str, float]] = {}
    for split, per_mod in outputs.items():
        for a, b in combinations(sorted(per_mod, key=int), 2):
            da, db = per_mod[a], per_mod[b]
            shared, ia, ib = np.intersect1d(
                da["drugs"], db["drugs"], return_indices=True
            )
            if len(shared) < 3:
                continue
            za = np.asarray(da["embeds"])[ia]
            zb = np.asarray(db["embeds"])[ib]
            row = {
                "alignment": alignment_loss(za, zb),
                "uniformity_a": uniform_loss(za),
                "uniformity_b": uniform_loss(zb),
                "foscttm": foscttm(zb, za)[0],
                "sample_size": float(len(shared)),
            }
            if run_geomca:
                # reference GeomCA params: Rdist_percentile=5, gamma=1,
                # comp thresholds 0.0 (evaluate.py:478-495)
                gk = dict(percentile=5.0, gamma=1.0,
                          comp_consistency_threshold=0.0,
                          comp_quality_threshold=0.0)
                gk.update(geomca_kwargs or {})
                res = geomca(za, zb, **gk)
                row.update(
                    geomca_precision=res.precision,
                    geomca_recall=res.recall,
                    geomca_network_consistency=res.network_consistency,
                    geomca_network_quality=res.network_quality,
                )
            name = f"{split} {a} v {b}"
            table[name] = row
            if logger is not None:
                logger.info(
                    f"final embeds {name}: "
                    + ", ".join(f"{k}={v:.4f}" for k, v in row.items())
                )
    if save_dir:
        import json
        import os

        os.makedirs(save_dir, exist_ok=True)
        with open(os.path.join(save_dir, "final_embeds_metrics.json"),
                  "w") as f:
            json.dump(table, f, indent=1)
    return table


def save_embeds(
    encoder_apply, variables, collator, kg, train_drugs, val_drugs,
    save_dir: Optional[str] = None,
    modality_indices: Sequence[int] = DEFAULT_EVAL_MODALITY_INDICES,
    raw_encoder_output: bool = True,
):
    """Per-modality embedding export for train/val drug sets
    (eval_utils.py:308-383). Returns {split: {mod_idx: {embeds, drugs}}}
    and writes .npz files when save_dir is given."""
    import os

    out = {}
    for split, drugs in (("train", train_drugs), ("val", val_drugs)):
        out[split] = {}
        for mi in modality_indices:
            z, valid = encode_single_modality(
                encoder_apply, variables, collator, kg, np.asarray(drugs),
                mi, raw_encoder_output,
            )
            if not len(valid):
                continue
            out[split][str(mi)] = {"embeds": z, "drugs": valid}
            if save_dir:
                os.makedirs(save_dir, exist_ok=True)
                np.savez(
                    os.path.join(save_dir, f"{split}_embeds_{mi}.npz"),
                    embeds=z, drugs=valid,
                    masks=np.asarray(collator.ds.masks)[valid],
                )
    return out
