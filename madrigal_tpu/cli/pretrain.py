"""Contrastive pretraining entry point (stage 2).

CLI analog of the reference's `python pretrain.py`
(reference: pretrain.py:41-292): drugs with >=2 modalities, subset-mask
sampling per step, SimCLR InfoNCE, periodic checkpointing.

Usage:
  python -m madrigal_tpu.cli.pretrain --synthetic --num_steps 100 \
      --pretrain_mode str_center_uni --platform cpu
"""
from __future__ import annotations

import argparse
import dataclasses
import os

from .. import config as config_lib
from ..config import PretrainConfig
from .common import add_common_args, apply_overrides, load_data, setup_platform


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Madrigal-TPU CL pretraining")
    add_common_args(p)
    p.add_argument("--pretrain_mode", type=str, default="str_center_uni")
    p.add_argument("--pretrain_unbalanced", action="store_true")
    p.add_argument("--raw_encoder_output", action="store_true")
    p.add_argument("--num_steps", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--save_checkpoints", type=int, default=None)
    p.add_argument("--resume", type=str, default=None,
                   help="checkpoint path to resume from (restores params,\n"
                        "batch stats, optimizer state and step count)")
    p.add_argument("--modality_ckpts", type=str, nargs="*", default=[],
                   help="stage-1 checkpoints from cli/modality_pretrain to "
                        "warm-start encoders (the reference's "
                        "use_modality_pretrain path, models.py:219-342)")
    p.add_argument("--host_collate", action="store_true",
                   help="per-step host collate (pack_molecules + tx "
                        "slice, the pre-r5 path) instead of the default "
                        "device-table gather; the device-table path "
                        "keeps the step device-bound on hosts where "
                        "collate can't hide behind the prefetch "
                        "(docs/CLI_WALL.md)")
    p.add_argument("--final_embeds_eval", action="store_true",
                   help="after training, save per-modality train/val embeds "
                        "and run the per-pair alignment/uniformity/GeomCA "
                        "table (the reference's end-of-pretraining "
                        "save_embeds + evaluate_final_embeds flow, "
                        "pretrain.py:260-265, evaluate.py:456-504)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    setup_platform(args)

    from ..train.checkpoint import (
        check_finite_loss, load_checkpoint, restore_into, save_checkpoint,
    )
    from ..train.pretrain_cl import CLPretrainer
    from ..utils.logging import MetricLogger, get_root_logger

    os.makedirs(args.save_dir, exist_ok=True)
    logger = get_root_logger(os.path.join(args.save_dir, "pretrain.log"))
    mlog = MetricLogger(args.save_dir, run_name="pretrain")

    ds, coll = load_data(args)
    cfg = PretrainConfig(
        seed=args.seed,
        pretrain_mode=args.pretrain_mode,
        pretrain_unbalanced=args.pretrain_unbalanced,
        raw_encoder_output=args.raw_encoder_output,
    )
    cfg = apply_overrides(cfg, args)
    if args.batch_size:
        cfg = dataclasses.replace(cfg, pretrain_batch_size=args.batch_size)
    if args.save_checkpoints:
        cfg = dataclasses.replace(cfg, save_checkpoints=args.save_checkpoints)
    config_lib.validate(cfg)
    logger.info(f"config:\n{config_lib.dumps(cfg)}")

    kg = coll.kg_batch()
    trainer = CLPretrainer(cfg, coll, kg,
                           device_table=not args.host_collate)
    if args.modality_ckpts:
        import dataclasses as _dc

        from ..train.transfer import overlay_stage1_checkpoint

        params = dict(trainer.state.params)
        stats = dict(trainer.state.batch_stats)
        enc_p = params["base_encoder"]
        enc_s = stats.get("base_encoder", {})
        for ck in args.modality_ckpts:
            tree, _meta = load_checkpoint(ck)
            enc_p, enc_s = overlay_stage1_checkpoint(enc_p, enc_s, tree)
            logger.info(f"warm-started encoders from {ck}")
        params["base_encoder"] = enc_p
        stats["base_encoder"] = enc_s
        trainer.state = _dc.replace(
            trainer.state, params=params, batch_stats=stats)
    start_step = 0
    if args.resume:
        import dataclasses as _dc

        tree, meta = load_checkpoint(args.resume)
        trainer.state = _dc.replace(
            trainer.state,
            params=tree["params"],
            batch_stats=tree.get("batch_stats", {}),
            opt_state=(restore_into(trainer.state.opt_state,
                                    tree["opt_state"])
                       if "opt_state" in tree and tree["opt_state"]
                       is not None else trainer.state.opt_state),
        )
        start_step = meta["epoch"]
        logger.info(f"resumed from {args.resume} at step {start_step}")
    # prefetch-overlapped segments between checkpoint boundaries: the
    # host collate (pack_molecules + mask draws) for step t+1 runs in a
    # background thread while the device computes step t
    # (CLPretrainer.train_steps / data/pipeline.py); numerics identical
    # to the per-step loop. save_checkpoints <= 0 = no periodic snapshots.
    step = start_step
    sc = cfg.save_checkpoints
    while step < args.num_steps:
        if sc > 0:
            boundary = max(step, 1) if max(step, 1) % sc == 0 else (
                (max(step, 1) // sc + 1) * sc)
            seg_end = min(args.num_steps, boundary + 1)
        else:
            boundary, seg_end = None, args.num_steps
        losses = trainer.train_steps(seg_end - step)
        for i, loss in enumerate(losses):
            s = step + i
            check_finite_loss(loss, "cl")
            mlog.log({"cl_loss": loss}, step=s)
            if s % 10 == 0:
                logger.info(f"step {s}: infonce={loss:.4f}")
        step = seg_end
        if (sc > 0 and boundary is not None and boundary > 0
                and step == boundary + 1):
            save_checkpoint(
                os.path.join(args.save_dir, f"cl_checkpoint_{boundary}"),
                trainer.state.params, trainer.state.batch_stats, cfg,
                epoch=boundary, opt_state=trainer.state.opt_state,
            )

    save_checkpoint(
        os.path.join(args.save_dir, "cl_last"),
        trainer.state.params, trainer.state.batch_stats, cfg,
        epoch=args.num_steps, opt_state=trainer.state.opt_state,
    )
    if args.final_embeds_eval:
        run_final_embeds_eval(trainer, coll, kg, args.save_dir, logger)
    logger.info("done")
    mlog.finish()


def run_final_embeds_eval(trainer, coll, kg, save_dir: str, logger):
    """End-of-pretraining save_embeds -> evaluate_final_embeds orchestration
    (reference: pretrain.py:260-265 -> evaluate.py:456-504). Pretrain drugs
    split 90/10 train/val like the reference's fallback
    (data.py:301, train_test_split(test_size=0.1))."""
    import numpy as np

    from ..eval.evaluate_pt import evaluate_final_embeds, save_embeds
    from ..models.encoder import MadrigalEncoder

    rng = np.random.RandomState(trainer.cfg.seed)
    ids = trainer.drug_ids.copy()
    rng.shuffle(ids)
    n_val = max(1, len(ids) // 10)
    val_drugs, train_drugs = np.sort(ids[:n_val]), np.sort(ids[n_val:])

    enc = MadrigalEncoder(cfg=trainer.cfg.encoder)
    variables = {
        "params": trainer.state.params["base_encoder"],
        "batch_stats": trainer.state.batch_stats.get("base_encoder", {}),
    }

    def apply_fn(vs, batch, kg, raw):
        return enc.apply(
            vs, batch, kg, train=False, raw_encoder_output=raw,
            method=lambda m, b, k, train, raw_encoder_output: m.encode(
                b, kg=k, train=train, raw_encoder_output=raw_encoder_output),
        )

    embeds_dir = os.path.join(save_dir, "final_embeds")
    outputs = save_embeds(
        apply_fn, variables, coll, kg, train_drugs, val_drugs,
        save_dir=embeds_dir,
        raw_encoder_output=trainer.cfg.raw_encoder_output,
    )
    table = evaluate_final_embeds(outputs, save_dir=save_dir, logger=logger)
    logger.info(f"final embeds eval: {len(table)} modality pairs "
                f"(embeds in {embeds_dir})")
    return table


if __name__ == "__main__":
    main()
