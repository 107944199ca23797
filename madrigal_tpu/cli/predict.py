"""Prediction / embedding-export entry point.

CLI analog of the reference's generate_embeddings / quick_predictions
notebooks + predict.py API (reference: notebooks/generate_embeddings.ipynb,
madrigal/evaluate/predict.py): load checkpoint(s), embed all drugs, export
raw score chunks and/or the normalized-rank tensor, and answer
(outcome, drugA, drugB) triple queries.

Passing MULTIPLE --checkpoint paths runs the published multi-seed
ensemble protocol end-to-end (reference: generate_embeddings.ipynb cells
18-20, predict.py:466-499,582-614 -- 5 seed checkpoints at epoch 700):
  * --export_ranks: per-seed normalized-rank tensors (label-sharded with
    --sharded), geometric mean across seeds, re-rank, memmap out
  * --export_scores: sigmoid-mean of per-seed score tensors
  * --triples: sigmoid-mean ensemble of the per-seed triple scores

Usage:
  python -m madrigal_tpu.cli.predict --checkpoint out/best_model --synthetic \
      --export_ranks ranks.npy --triples 0:1:2 3:4:5 --platform cpu
  python -m madrigal_tpu.cli.predict --checkpoint s1/best s2/best s3/best \
      --synthetic --export_ranks ensemble_ranks.npy
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from .common import add_common_args, load_data, setup_platform


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Madrigal-TPU prediction")
    add_common_args(p)
    p.add_argument("--checkpoint", type=str, required=True, nargs="+",
                   help="checkpoint path(s); >1 runs the multi-seed "
                        "ensemble protocol (gmean of normalized ranks + "
                        "re-rank; sigmoid-mean for scores/triples)")
    p.add_argument("--export_embeddings", type=str, default=None)
    p.add_argument("--export_scores", type=str, default=None,
                   help="write the [L, N, N] raw-score tensor (np.memmap);"
                        " with >1 checkpoints: the sigmoid-mean ensemble")
    p.add_argument("--export_ranks", type=str, default=None,
                   help="write the [L, N, N] normalized-rank tensor; with "
                        ">1 checkpoints: gmean-of-ranks + re-rank")
    p.add_argument("--keep_seed_ranks", action="store_true",
                   help="keep the per-seed <out>.seedK.npy rank tensors "
                        "instead of deleting them after ensembling")
    p.add_argument("--triples", type=str, nargs="*", default=[],
                   metavar="L:A:B", help="outcome:drugA:drugB queries")
    p.add_argument("--label_chunk", type=int, default=32)
    p.add_argument("--eval_type", type=str, default=None,
                   help="modality eval type for embeddings, e.g. str_full, "
                        "str+tx_full (head side applies to all drugs)")
    p.add_argument("--finetune_mode", type=str,
                   default="str_random_sample")
    p.add_argument("--sharded", action="store_true",
                   help="label-shard the rank tensor over all devices")
    p.add_argument("--ablation", type=str, default=None, metavar="OUT_JSON",
                   help="run the modality-ablation study (fig2 protocol: "
                        "force-mask modality subsets for full-modality "
                        "drugs, per-label metrics per subset) and write "
                        "the table as JSON")
    p.add_argument("--ablation_combos", type=str, default=None,
                   help="semicolon-separated '+'-joined modality subsets "
                        "for --ablation, e.g. 'str;str+kg;str+kg+cv+tx' "
                        "(default: all 15 non-empty subsets)")
    return p


def _rank_tensor_into(z, w, out, args):
    from ..eval.ranks import rank_tensor

    if args.sharded:
        from ..parallel.allpairs import sharded_rank_tensor
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(("label",))
        sharded_rank_tensor(mesh, z, w, out=out)
    else:
        rank_tensor(z, w, chunk=args.label_chunk, out=out)
    return out


def main(argv=None):
    args = build_parser().parse_args(argv)
    setup_platform(args)

    from ..eval.predict import (
        decoder_weight,
        embed_all_drugs,
        ensemble_sigmoid_mean,
        ensemble_sigmoid_scores_all_pairs,
        model_from_checkpoint,
        score_all_pairs,
        score_triples_for_pairs,
    )
    from ..eval.ranks import ensemble_normalized_ranks
    from ..utils.logging import get_root_logger

    logger = get_root_logger(file=False)

    ds, coll = load_data(args)
    seeds = []  # (model, variables, cfg) per checkpoint
    for path in args.checkpoint:
        seeds.append(model_from_checkpoint(path))
    kg = coll.kg_batch()

    eval_masks = None
    if args.eval_type:
        from ..eval.masks import get_evaluate_masks

        base = np.asarray(ds.masks)
        eval_masks, _ = get_evaluate_masks(base, base, args.eval_type,
                                           args.finetune_mode)
    zs = []
    for (model, variables, cfg), path in zip(seeds, args.checkpoint):
        z = embed_all_drugs(model, variables, coll, kg,
                            eval_masks=eval_masks)
        zs.append(z)
        logger.info(f"embedded {z.shape[0]} drugs -> {z.shape} ({path})")
    multi = len(seeds) > 1
    if args.export_embeddings:
        np.save(args.export_embeddings,
                np.stack(zs) if multi else zs[0])
        logger.info(f"wrote {args.export_embeddings}"
                    + (f" ({len(zs)} seeds stacked)" if multi else ""))

    L = decoder_weight(seeds[0][0], seeds[0][1]).shape[0]
    n = zs[0].shape[0]

    if args.export_scores:
        out = np.lib.format.open_memmap(
            args.export_scores, mode="w+", dtype=np.float32, shape=(L, n, n)
        )
        if multi:
            ensemble_sigmoid_scores_all_pairs(
                [(m, v, z) for (m, v, _), z in zip(seeds, zs)],
                label_chunk=args.label_chunk, out=out)
        else:
            score_all_pairs(seeds[0][0], seeds[0][1], zs[0],
                            label_chunk=args.label_chunk, out=out)
        out.flush()
        logger.info(f"wrote {args.export_scores}"
                    + (" (sigmoid-mean ensemble)" if multi else ""))

    if args.export_ranks:
        out = np.lib.format.open_memmap(
            args.export_ranks, mode="w+", dtype=np.float32, shape=(L, n, n)
        )
        if multi:
            seed_paths = []
            seed_maps = []
            for i, ((model, variables, _), z) in enumerate(zip(seeds, zs)):
                sp = f"{args.export_ranks}.seed{i}.npy"
                sout = np.lib.format.open_memmap(
                    sp, mode="w+", dtype=np.float32, shape=(L, n, n))
                w = decoder_weight(model, variables)
                _rank_tensor_into(z, w, sout, args)
                sout.flush()
                seed_paths.append(sp)
                seed_maps.append(np.load(sp, mmap_mode="r"))
                logger.info(f"seed {i} rank tensor -> {sp}")
            ensemble_normalized_ranks(seed_maps, out=out,
                                      chunk=args.label_chunk)
            if not args.keep_seed_ranks:
                del seed_maps
                for sp in seed_paths:
                    os.remove(sp)
        else:
            w = decoder_weight(seeds[0][0], seeds[0][1])
            _rank_tensor_into(zs[0], w, out, args)
        out.flush()
        logger.info(f"wrote {args.export_ranks}"
                    + (" (gmean-of-ranks ensemble, re-ranked)"
                       if multi else ""))

    if args.ablation:
        import json

        from ..eval.ablation import modality_ablation_study

        # the full-KG arena already exists (line above builds `kg` once);
        # a second build here is pure redundant host->device transfer
        batch, _ = coll(build_kg=False)
        combos = ([tuple(c.split("+"))
                   for c in args.ablation_combos.split(";")]
                  if args.ablation_combos else None)
        table = modality_ablation_study(
            seeds[0][0], seeds[0][1], batch, kg, args.finetune_mode,
            combos=combos)
        serializable = {
            combo: {k: np.asarray(v, np.float64).tolist()
                    for k, v in row.items()}
            for combo, row in table.items()
        }
        with open(args.ablation, "w") as f:
            json.dump(serializable, f, indent=1)
        logger.info(f"wrote modality-ablation table ({len(table)} subsets)"
                    f" -> {args.ablation}")

    if args.triples:
        triples = [tuple(int(x) for x in t.split(":")) for t in args.triples]
        per_seed = [
            score_triples_for_pairs(model, variables, z, triples)
            for (model, variables, _), z in zip(seeds, zs)
        ]
        if multi:
            scores = ensemble_sigmoid_mean(per_seed)  # probabilities
        else:
            scores = per_seed[0]  # raw logits (single-seed behavior)
        for t, s in zip(triples, scores):
            logger.info(f"outcome={t[0]} drugA={t[1]} drugB={t[2]} "
                        f"{'prob' if multi else 'score'}={float(s):.4f}")
        return scores
    return np.stack(zs) if multi else zs[0]


if __name__ == "__main__":
    main()
