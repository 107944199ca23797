"""Prediction / embedding-export entry point.

CLI analog of the reference's generate_embeddings / quick_predictions
notebooks + predict.py API (reference: notebooks/generate_embeddings.ipynb,
madrigal/evaluate/predict.py): load a checkpoint, embed all drugs, export
raw score chunks and/or the normalized-rank tensor, and answer
(outcome, drugA, drugB) triple queries.

Usage:
  python -m madrigal_tpu.cli.predict --checkpoint out/best_model --synthetic \
      --export_ranks ranks.npy --triples 0:1:2 3:4:5 --platform cpu
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from .common import add_common_args, load_data, setup_platform


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Madrigal-TPU prediction")
    add_common_args(p)
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--export_embeddings", type=str, default=None)
    p.add_argument("--export_scores", type=str, default=None,
                   help="write the [L, N, N] raw-score tensor (np.memmap)")
    p.add_argument("--export_ranks", type=str, default=None,
                   help="write the [L, N, N] normalized-rank tensor")
    p.add_argument("--triples", type=str, nargs="*", default=[],
                   metavar="L:A:B", help="outcome:drugA:drugB queries")
    p.add_argument("--label_chunk", type=int, default=32)
    p.add_argument("--eval_type", type=str, default=None,
                   help="modality eval type for embeddings, e.g. str_full, str+tx_full (head side applies to all drugs)")
    p.add_argument("--finetune_mode", type=str,
                   default="str_random_sample")
    p.add_argument("--sharded", action="store_true",
                   help="label-shard the rank tensor over all devices")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    setup_platform(args)

    import jax.numpy as jnp

    from ..eval.predict import (
        decoder_weight,
        embed_all_drugs,
        model_from_checkpoint,
        score_all_pairs,
        score_triples_for_pairs,
    )
    from ..eval.ranks import rank_tensor
    from ..utils.logging import get_root_logger

    logger = get_root_logger(file=False)

    ds, coll = load_data(args)
    model, variables, cfg = model_from_checkpoint(args.checkpoint)
    kg = coll.kg_batch()

    eval_masks = None
    if args.eval_type:
        import numpy as _np

        from ..eval.masks import get_evaluate_masks

        base = _np.asarray(ds.masks)
        eval_masks, _ = get_evaluate_masks(base, base, args.eval_type,
                                           args.finetune_mode)
    z = embed_all_drugs(model, variables, coll, kg, eval_masks=eval_masks)
    logger.info(f"embedded {z.shape[0]} drugs -> {z.shape}")
    if args.export_embeddings:
        np.save(args.export_embeddings, z)
        logger.info(f"wrote {args.export_embeddings}")

    if args.export_scores:
        w = decoder_weight(model, variables)
        out = np.lib.format.open_memmap(
            args.export_scores, mode="w+", dtype=np.float32,
            shape=(w.shape[0], z.shape[0], z.shape[0]),
        )
        score_all_pairs(model, variables, z, label_chunk=args.label_chunk,
                        out=out)
        out.flush()
        logger.info(f"wrote {args.export_scores}")

    if args.export_ranks:
        w = decoder_weight(model, variables)
        out = np.lib.format.open_memmap(
            args.export_ranks, mode="w+", dtype=np.float32,
            shape=(w.shape[0], z.shape[0], z.shape[0]),
        )
        if args.sharded:
            from ..parallel.allpairs import sharded_rank_tensor
            from ..parallel.mesh import make_mesh

            mesh = make_mesh(("label",))
            sharded_rank_tensor(mesh, z, w, out=out)
        else:
            rank_tensor(z, w, chunk=args.label_chunk, out=out)
        out.flush()
        logger.info(f"wrote {args.export_ranks}")

    if args.triples:
        triples = [tuple(int(x) for x in t.split(":")) for t in args.triples]
        scores = score_triples_for_pairs(model, variables, z, triples)
        for t, s in zip(triples, scores):
            logger.info(f"outcome={t[0]} drugA={t[1]} drugB={t[2]} "
                        f"score={float(s):.4f}")
        return scores
    return z


if __name__ == "__main__":
    main()
