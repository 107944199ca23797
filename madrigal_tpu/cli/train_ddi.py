"""DDI finetune entry point (stage 3).

CLI analog of the reference's `python train_ddi_batch.py`
(reference: train_ddi_batch.py:419-518): full-batch training with per-epoch
mask resampling, periodic eval sweeps, best-AUPRC checkpointing, final
test pass. `--all_train` reproduces train_ddi_batch_all_train.py (train on
the union of splits for final score generation).

Usage:
  python -m madrigal_tpu.cli.train_ddi --synthetic --num_epochs 50 \
      --finetune_mode str_random_sample --platform cpu
"""
from __future__ import annotations

import argparse
import dataclasses
import os

import numpy as np

from .. import config as config_lib
from ..config import TrainConfig
from .common import add_common_args, apply_overrides, load_data, setup_platform


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Madrigal-TPU DDI finetuning")
    add_common_args(p)
    p.add_argument("--finetune_mode", type=str, default="str_random_sample")
    p.add_argument("--split_method", type=str,
                   default="split_by_triplets")
    p.add_argument("--test", action="store_true",
                   help="final test-split evaluation with the best model"
                        " (reference predict.test analog)")
    p.add_argument("--num_epochs", type=int, default=None)
    p.add_argument("--warmup_epochs", type=int, default=None)
    p.add_argument("--evaluate_interval", type=int, default=None)
    p.add_argument("--checkpoint", type=str, default=None,
                   help="CL-pretrain checkpoint to warm-start encoders from")
    p.add_argument("--use_pretrained_adaptor", action="store_true")
    p.add_argument("--train_with_str_str", action="store_true")
    p.add_argument("--all_train", action="store_true",
                   help="train on the union of all splits "
                        "(train_ddi_batch_all_train.py analog)")
    p.add_argument("--resume", type=str, default=None,
                   help="finetune checkpoint to resume from (restores "
                        "params, batch stats, optimizer state, epoch)")
    p.add_argument("--patience", type=int, default=None,
                   help="early-stopping patience in eval intervals on the "
                        "val key metric (off when unset)")
    p.add_argument("--eval_types", type=str, default=None,
                   help="comma-separated eval-type override; default sweeps "
                        "the full per-split SPLIT_EVAL_TYPES lists "
                        "(reference evaluate.py:39-247)")
    p.add_argument("--frozen", action="store_true",
                   help="freeze the encoder; train the decoder only "
                        "(reference --frozen, utils.py:329-331)")
    p.add_argument("--label_chunk", type=int, default=None,
                   help="label-chunked (ELL) training-triple layout: "
                        "numerics-identical, cuts the decoder's per-epoch"
                        " weight gather/scatter by this factor on TPU "
                        "(0 = per-triple gathers; default 64 unless the "
                        "config file sets label_chunk_triples)")
    p.add_argument("--split_forwards", action="store_true",
                   help="three-way-loss modes: per-forward grad "
                        "accumulation instead of one fused 3-forward "
                        "step (numerics-identical; needed at reference "
                        "scale where the fused program exhausts the XLA "
                        "compiler)")
    p.add_argument("--no_share_kg", action="store_true",
                   help="with --split_forwards: recompute the full-KG "
                        "pass inside every forward instead of sharing "
                        "one table + accumulated cotangents (debugging "
                        "only; sharing is numerics-identical and faster)")
    p.add_argument("--fusion_chunk", type=int, default=None,
                   help="drug-axis fusion-transformer chunk (exact; "
                        "bounds the latent activation footprint for "
                        "full-batch training -- 512 at reference scale; "
                        "unset = whole batch in one fusion call)")
    p.add_argument("--fusion_remat", action="store_true",
                   help="rematerialize the fusion transformer in the "
                        "backward (with --fusion_chunk: the full-batch "
                        "memory recipe at reference scale)")
    p.add_argument("--fusion_remat_policy", type=str, default=None,
                   choices=["dots", "none", "all"],
                   help="with --fusion_remat: 'dots' (the config default) "
                        "keeps the Dense outputs (QKV/out proj, FFN "
                        "matmuls) in the layer backward and recomputes "
                        "only attention einsums/elementwise -- ~4% faster "
                        "epochs for a few [chunk, S, latent] buffers per "
                        "layer; 'none' recomputes everything (max memory "
                        "savings)")
    p.add_argument("--remat_forwards", action="store_true",
                   help="rematerialize each whole forward in the "
                        "backward. Costs ~a full forward recompute per "
                        "epoch (measured 3.00 -> 3.64 s at reference "
                        "scale); only needed when activations of ALL "
                        "forwards exceed HBM even with --fusion_remat")
    p.add_argument("--no_hgt_remat", action="store_true",
                   help="disable hgt.remat_edge_types (keeps every edge "
                        "type's [E, F] streams live through the backward "
                        "instead of recomputing them; faster when the "
                        "extra HBM fits)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    setup_platform(args)

    import jax

    from ..eval.evaluate import Evaluator
    from ..train.checkpoint import (
        filter_cl_params_for_finetune,
        load_checkpoint,
        merge_params,
        save_checkpoint,
    )
    from ..train.finetune import FinetuneTrainer, TrainState
    from ..utils.logging import MetricLogger, get_root_logger

    os.makedirs(args.save_dir, exist_ok=True)
    logger = get_root_logger(os.path.join(args.save_dir, "train_ddi.log"))
    mlog = MetricLogger(args.save_dir, run_name="train_ddi")

    ds, coll = load_data(args)
    splits = None
    if args.synthetic_scale and not args.all_train:
        # reference-scale synthetic: split_by_triplets semantics -- an
        # 80/10/10 row partition of the directed table (the reference's
        # random triplet split), so eval cadence runs on held-out rows
        import numpy as np

        from ..data.collate import DDICollator

        rng = np.random.RandomState(args.seed)
        df = ds.edge_df
        perm = rng.permutation(len(df))
        n_hold = len(df) // 10
        splits = {
            "val": df.iloc[perm[:n_hold]].reset_index(drop=True),
            "test": df.iloc[perm[n_hold:2 * n_hold]].reset_index(drop=True),
        }
        ds.edge_df = df.iloc[perm[2 * n_hold:]].reset_index(drop=True)
        # full_drug_table + one shared cache: train/val/test head AND
        # tail batches all alias ONE device copy of the modality tables
        # (per-split copies of the tx table alone OOM the production
        # finetune recipe at reference scale)
        coll = DDICollator(ds, split="train", seed=args.seed,
                           kg_edge_chunk=args.kg_chunk,
                           kg_src_sort=not args.no_src_mxu,
                           drug_table_cache={}, full_drug_table=True)
    elif (args.synthetic or not args.data_dir) and not args.all_train:
        # synthetic path: generate real train/val/test splits so model
        # selection runs on held-out data like the reference
        # (train_ddi_batch.py:376-412)
        from ..data.synthetic import make_split_dataset

        ds, splits = make_split_dataset(
            num_drugs=args.synthetic_drugs,
            num_labels=args.synthetic_labels,
            num_edges=args.synthetic_edges,
            split_method=args.split_method, seed=args.seed,
        )
        from ..data.collate import DDICollator

        coll = DDICollator(ds, split="train", seed=args.seed,
                           kg_edge_chunk=args.kg_chunk,
                           kg_src_sort=not args.no_src_mxu,
                           drug_table_cache={})
    elif args.data_dir and not args.all_train:
        from ..data.datasets import load_reference_dataset

        splits = {}
        for sp in ("val", "test", "val_between", "val_within",
                   "test_between", "test_within"):
            try:
                sds = load_reference_dataset(
                    args.data_dir, split_method=args.split_method, split=sp)
                splits[sp] = sds.edge_df
            except FileNotFoundError:
                pass
        splits = splits or None
    if args.all_train:
        if args.data_dir and not args.synthetic:
            from ..data.datasets import load_reference_all_train

            ds = load_reference_all_train(args.data_dir)
        else:
            from ..data.synthetic import make_split_dataset
            from ..data.datasets import union_edge_tables

            ds, splits = make_split_dataset(
                num_drugs=args.synthetic_drugs,
                num_labels=args.synthetic_labels,
                num_edges=args.synthetic_edges,
                split_method="split_by_pairs", seed=args.seed,
            )
            ds.edge_df = union_edge_tables(list(splits.values()))
        from ..data.collate import DDICollator

        coll = DDICollator(ds, split="train", seed=args.seed,
                           kg_edge_chunk=args.kg_chunk,
                           kg_src_sort=not args.no_src_mxu,
                           drug_table_cache={})
    cfg = TrainConfig(seed=args.seed, finetune_mode=args.finetune_mode)
    cfg = apply_overrides(cfg, args)
    for field in ("num_epochs", "warmup_epochs", "evaluate_interval"):
        v = getattr(args, field)
        if v is not None:
            cfg = dataclasses.replace(cfg, **{field: v})
    enc_over = cfg.model.encoder
    if args.fusion_chunk is not None:
        enc_over = dataclasses.replace(
            enc_over, fusion_batch_chunk=args.fusion_chunk or None)
    if args.fusion_remat:
        enc_over = dataclasses.replace(
            enc_over, transformer=dataclasses.replace(
                enc_over.transformer, remat=True))
    if args.fusion_remat_policy is not None:
        enc_over = dataclasses.replace(
            enc_over, transformer=dataclasses.replace(
                enc_over.transformer,
                remat_policy=(None if args.fusion_remat_policy == "none"
                              else args.fusion_remat_policy)))
    if args.no_hgt_remat:
        enc_over = dataclasses.replace(
            enc_over, hgt=dataclasses.replace(
                enc_over.hgt, remat_edge_types=False))
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, prediction_dim=ds.num_labels,
                                  encoder=enc_over),
        train_with_str_str=args.train_with_str_str,
        frozen=args.frozen or cfg.frozen,
        # explicit flag wins; else a config-file label_chunk_triples; else
        # the TPU default 64 (pass --label_chunk 0 to force per-triple)
        label_chunk_triples=(args.label_chunk if args.label_chunk is not None
                             else (cfg.label_chunk_triples or 64)),
        split_forward_grads=args.split_forwards or cfg.split_forward_grads,
        split_share_kg_table=(not args.no_share_kg
                              and cfg.split_share_kg_table),
        remat_forwards=args.remat_forwards or cfg.remat_forwards,
    )
    config_lib.validate(cfg)
    logger.info(f"config:\n{config_lib.dumps(cfg)}")

    batch, kg = coll()
    trainer = FinetuneTrainer(cfg, batch, kg)

    if args.checkpoint:
        tree, meta = load_checkpoint(args.checkpoint)
        enc = tree["params"].get("base_encoder", tree["params"].get("encoder"))
        kept = filter_cl_params_for_finetune(
            enc, use_pretrained_adaptor=args.use_pretrained_adaptor
        )
        merged = merge_params(trainer.state.params["encoder"], kept)
        params = dict(trainer.state.params)
        params["encoder"] = merged
        trainer.state = TrainState(
            params=params,
            batch_stats=trainer.state.batch_stats,
            opt_state=trainer.state.opt_state,
            epoch=trainer.state.epoch,
        )
        logger.info(f"warm-started encoders from {args.checkpoint} "
                    f"(epoch {meta['epoch']})")

    start_epoch = 0
    best_key = -1e8
    best_within_key = -1e8
    best_epoch = None
    best_within_epoch = None
    if args.resume:
        import jax.numpy as jnp

        from ..train.checkpoint import restore_into

        tree, meta = load_checkpoint(args.resume)
        trainer.state = TrainState(
            params=tree["params"],
            batch_stats=tree.get("batch_stats", {}),
            opt_state=(restore_into(trainer.state.opt_state,
                                    tree["opt_state"])
                       if tree.get("opt_state") is not None
                       else trainer.state.opt_state),
            epoch=jnp.asarray(meta["epoch"], jnp.int32),
        )
        start_epoch = int(meta["epoch"])
        # restore best-model tracking so the first post-resume eval can't
        # overwrite a better pre-resume best_model checkpoint
        extra = meta.get("extra") or {}
        best_key = float(extra.get("best_key", best_key))
        best_within_key = float(extra.get("best_within_key",
                                          best_within_key))
        best_epoch = extra.get("best_epoch")
        best_within_epoch = extra.get("best_within_epoch")
        logger.info(f"resumed from {args.resume} at epoch {start_epoch} "
                    f"(best so far {best_key:.4f} @ {best_epoch})")

    evaluator = Evaluator(trainer.model, cfg.finetune_mode, task=cfg.task,
                          logger=logger)
    eval_types = (
        [t for t in args.eval_types.split(",") if t]
        if args.eval_types else None
    )

    # build the VAL eval batches once (the reference builds each split's
    # full batch once up front, train_ddi_batch.py:115-117); test splits
    # collate lazily in the --test block so training runs don't pay for
    # (or pin) arenas they never read
    from ..data.collate import DDICollator as _C

    # eval/test collators share the train collator's device-table memo
    # (same ds, same budgets => identical entries) and skip the KG arena
    # build (build_kg=False): the graph is split-independent, every
    # split scores against the train `kg`, and each redundant build
    # costs minutes of host->device transfer + a transient
    # multi-hundred-MB HBM arena at reference scale
    def _eval_collator(name):
        return _C(ds, split=name, seed=args.seed,
                  drug_table_cache=coll.drug_table_cache,
                  full_drug_table=coll.full_drug_table)

    eval_batches = {}
    test_dfs = {}
    if splits is not None:
        for name, df in splits.items():
            if name == "train" or not len(df):
                continue
            if name.startswith("test"):
                test_dfs[name] = df
            else:
                eval_batches[name] = _eval_collator(name)(
                    df, build_kg=False)[0]
    # selection priority: plain 'val' wins when it coexists with
    # val_between (deterministic, not dict insertion order)
    val_splits = sorted(
        [n for n in eval_batches if n.startswith("val")],
        key=lambda n: (n != "val", n),
    )

    from ..train.checkpoint import EarlyStopping, check_finite_loss

    stopper = EarlyStopping(args.patience) if args.patience else None

    def tracking_extra():
        return {"best_key": best_key, "best_within_key": best_within_key,
                "best_epoch": best_epoch,
                "best_within_epoch": best_within_epoch}

    def run_eval_sweep(epoch):
        """Full per-split eval-type sweep (reference evaluate.py:39-247:
        every eval type in SPLIT_EVAL_TYPES per split, each
        evaluate_interval). Returns (val key, val_within key)."""
        nonlocal best_key, best_within_key, best_epoch, best_within_epoch
        variables = {"params": trainer.state.params,
                     "batch_stats": trainer.state.batch_stats}
        key = within_key = None
        if val_splits:
            for name in val_splits:
                k = evaluator.evaluate_ft(
                    variables, eval_batches[name], kg, name,
                    eval_types=eval_types)
                mlog.log({f"{name}_key_auprc": k}, step=epoch)
                if "within" in name:
                    within_key = k
                elif key is None:  # first in priority order ('val' first)
                    key = k
            if key is None:  # only within splits exist
                key = within_key
        else:
            key = evaluator.evaluate_ft(
                variables, batch, kg, "train",
                eval_types=eval_types or ["full_full", "str_str"])
            mlog.log({"train_key_auprc": key}, step=epoch)
        if key is not None and key > best_key:
            best_key, best_epoch = key, epoch
            save_checkpoint(
                os.path.join(args.save_dir, "best_model"),
                trainer.state.params, trainer.state.batch_stats, cfg,
                epoch=epoch, opt_state=trainer.state.opt_state,
                extra=tracking_extra(),
            )
            logger.info(f"new best auprc {key:.4f} @ epoch {epoch}")
        if within_key is not None and within_key > best_within_key:
            best_within_key, best_within_epoch = within_key, epoch
            save_checkpoint(
                os.path.join(args.save_dir, "best_within_model"),
                trainer.state.params, trainer.state.batch_stats, cfg,
                epoch=epoch, opt_state=trainer.state.opt_state,
            )
            logger.info(
                f"new best within auprc {within_key:.4f} @ epoch {epoch}")
        return key

    stopped = False
    for epoch in range(start_epoch, cfg.num_epochs):
        losses = check_finite_loss(trainer.train_epoch())
        mlog.log({f"train_{k}": v for k, v in losses.items()}, step=epoch)
        logger.info(f"epoch {epoch + 1}/{cfg.num_epochs}: "
                    f"loss={losses['total']:.4f}")
        # evaluate_interval <= 0 = never evaluate mid-run (the final
        # sweep below still runs); a 0 interval must not modulo-crash
        if (cfg.evaluate_interval > 0 and epoch > 0
                and epoch % cfg.evaluate_interval == 0):
            key = run_eval_sweep(epoch)
            # resumable snapshot (params + optimizer state + epoch)
            save_checkpoint(
                os.path.join(args.save_dir, "last_model"),
                trainer.state.params, trainer.state.batch_stats, cfg,
                epoch=epoch + 1, opt_state=trainer.state.opt_state,
                extra=tracking_extra(),
            )
            if stopper is not None and stopper(key):
                logger.info(
                    f"early stop @ epoch {epoch}: no val improvement in "
                    f"{args.patience} eval intervals")
                stopped = True
                break

    if not stopped:
        save_checkpoint(
            os.path.join(args.save_dir, "last_model"),
            trainer.state.params, trainer.state.batch_stats, cfg,
            epoch=cfg.num_epochs, opt_state=trainer.state.opt_state,
            extra=tracking_extra(),
        )
    logger.info(f"done; best auprc {best_key:.4f} @ epoch {best_epoch}; "
                f"best within {best_within_key:.4f} @ "
                f"epoch {best_within_epoch}")

    if args.test and test_dfs:
        # reference predict.test analog: reload the best checkpoint and run
        # the full test-split eval sweep (predict.py:15-170); test splits
        # collate here, lazily
        from ..eval.predict import model_from_checkpoint

        best_path = os.path.join(args.save_dir, "best_model")
        if os.path.exists(best_path):
            model, variables, _ = model_from_checkpoint(best_path)
            test_eval = Evaluator(model, cfg.finetune_mode, task=cfg.task,
                                  logger=logger)
            for name in sorted(test_dfs):
                test_batch = _eval_collator(name)(
                    test_dfs[name], build_kg=False)[0]
                test_key = test_eval.evaluate_ft(
                    variables, test_batch, kg, name,
                    eval_types=eval_types)
                logger.info(
                    f"{name} key auprc (best model): {test_key:.4f}")
                mlog.log({f"{name}_key_auprc_best": test_key})
    mlog.finish()
    return best_key


if __name__ == "__main__":
    main()
