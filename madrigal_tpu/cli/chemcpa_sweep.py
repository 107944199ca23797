"""chemCPA tx-adaptation sweep entry.

CLI analog of the reference's modality_pretraining/tx/sweep.py: read a
seml-format sweep YAML (fixed/grid/random blocks,
configs/chemcpa/chemcpa_tx_adapting_configs_sweep.yaml layout), expand it
into concrete configs, train each with early stopping + NaN stop, write
a sweep-summary JSONL, and save the best config's encoder checkpoint
(overlayable onto a MadrigalEncoder tx_encoder subtree, like
cli/modality_pretrain.py --modality tx).

Usage:
  python -m madrigal_tpu.cli.chemcpa_sweep --sweep_yaml sweep.yaml \
      --synthetic --platform cpu --save_dir /tmp/sweep \
      [--max_configs 4] [--epoch_cap 20] [--holdout 0.2]
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from .common import add_common_args, setup_platform


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Madrigal-TPU chemCPA sweep")
    add_common_args(p)
    p.add_argument("--sweep_yaml", type=str, required=True,
                   help="seml-format sweep config "
                        "(fixed/grid/random blocks)")
    p.add_argument("--max_configs", type=int, default=None,
                   help="cap the number of expanded configs trained")
    p.add_argument("--epoch_cap", type=int, default=None,
                   help="clamp training.num_epochs (smoke tests)")
    p.add_argument("--holdout", type=float, default=0.2,
                   help="test fraction for the R2 early-stopping metric")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    setup_platform(args)

    from ..config import ChemCPAConfig
    from ..train.chemcpa_sweep import run_chemcpa_sweep
    from ..train.checkpoint import save_checkpoint
    from ..utils.config_gen import generate_configs, read_config
    from ..utils.logging import get_root_logger

    os.makedirs(args.save_dir, exist_ok=True)
    logger = get_root_logger(
        os.path.join(args.save_dir, "chemcpa_sweep.log"))

    _, _, experiment = read_config(args.sweep_yaml)
    configs = generate_configs(experiment, seed=args.seed)
    logger.info(f"expanded {len(configs)} configs from {args.sweep_yaml}")

    # tx rows: [C, N, G] signatures -> (genes, cell-line) rows, as in
    # cli/modality_pretrain.py's tx stage
    if args.synthetic or not args.data_dir:
        from ..data.synthetic import make_dataset

        ds = make_dataset(num_drugs=args.synthetic_drugs,
                          num_labels=args.synthetic_labels,
                          num_edges=args.synthetic_edges, seed=args.seed)
    else:
        from ..data.datasets import load_reference_dataset

        ds = load_reference_dataset(args.data_dir)
    C, N, G = ds.tx_table.shape
    genes = ds.tx_table.reshape(C * N, G).astype(np.float32)
    cov = np.repeat(np.arange(C, dtype=np.int32), N)
    avail = ds.mod_avail[:, -C:].T.reshape(-1) == 1
    if avail.any():
        genes, cov = genes[avail], cov[avail]
    rng = np.random.RandomState(args.seed)
    order = rng.permutation(len(genes))
    n_test = max(1, int(len(genes) * args.holdout))
    test_idx, train_idx = order[:n_test], order[n_test:]

    base = ChemCPAConfig(num_genes=G, num_covariates=C)
    out = run_chemcpa_sweep(
        configs,
        genes[train_idx], cov[train_idx], genes[test_idx], cov[test_idx],
        base_cfg=base,
        out_jsonl=os.path.join(args.save_dir, "sweep_results.jsonl"),
        max_configs=args.max_configs,
        epoch_cap=args.epoch_cap,
        logger=logger,
    )
    logger.info(f"best config {out['best_index']}: "
                f"test R2 {out['best_r2']:.4f}")
    if out["best_variables"] is not None:
        path = os.path.join(args.save_dir, "tx_pretrained_best")
        v = out["best_variables"]
        save_checkpoint(path, {"tx_encoder": v["params"]},
                        {"tx_encoder": v.get("batch_stats", {})},
                        out["best_config"], epoch=0)
        logger.info(f"saved best encoder to {path}")
    return out


if __name__ == "__main__":
    main()
