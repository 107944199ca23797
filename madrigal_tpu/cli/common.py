"""Shared CLI plumbing: argparse <-> dataclass-config bridge, data loading.

The reference's per-stage argparse surface (reference: madrigal/
parse_args.py:5-217) maps onto the dataclass configs via dotted overrides;
`--from_yaml` layers a YAML file first, then explicit flags win
(parse_args.py:361-369 ordering).
"""
from __future__ import annotations

import argparse
import json
from typing import Any, Tuple

from .. import config as config_lib
from ..data.collate import DDICollator
from ..data.synthetic import SyntheticDataset, make_dataset


def add_common_args(p: argparse.ArgumentParser):
    p.add_argument("--from_yaml", type=str, default=None,
                   help="YAML config overrides (dotted keys supported)")
    p.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                   help="dotted config override, e.g. "
                        "--set model.encoder.transformer.num_layers=2")
    p.add_argument("--synthetic", action="store_true",
                   help="run on the built-in synthetic miniature dataset")
    p.add_argument("--synthetic_drugs", type=int, default=32)
    p.add_argument("--synthetic_labels", type=int, default=12)
    p.add_argument("--synthetic_edges", type=int, default=120)
    p.add_argument("--synthetic_scale", action="store_true",
                   help="reference-scale synthetic dataset (6,843 drugs, "
                        "960 outcomes, ~1M collated train triples, the "
                        "PrimeKG-scale 8.3M-edge KG) -- end-to-end "
                        "wall-clock runs with the host collator in the "
                        "loop; ~2 min host build at startup")
    p.add_argument("--synthetic_scale_shrink", type=int, default=1,
                   help="divide every --synthetic_scale dimension (drugs, "
                        "outcomes, rows, KG edges) by this factor -- a "
                        "shrunken-but-proportional variant so the "
                        "reference-scale CLI path runs in the test suite")
    p.add_argument("--data_dir", type=str, default=None,
                   help="root of a reference-format data directory")
    p.add_argument("--save_dir", type=str, default="./madrigal_output")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--debug", action="store_true")
    p.add_argument("--platform", type=str, default=None,
                   choices=[None, "cpu", "tpu"],
                   help="force a jax platform (cpu for local debugging)")
    p.add_argument("--kg_chunk", type=int, default=8,
                   help="degree-chunked KG edge arenas (numerics-identical"
                        " layout, ~3x faster HGT on TPU; 0 = plain layout)")
    p.add_argument("--no_src_mxu", action="store_true",
                   help="drop the source-sorted KG transpose layout "
                        "(ops/segment_pallas.py MXU backward for the HGT "
                        "src gathers; on by default, numerics-identical "
                        "up to f32 re-association)")


def _parse_value(v: str):
    # Python-style bool/None spellings first: json.loads("False") fails,
    # and falling through to the raw string "False" silently reads as
    # TRUTHY wherever the config checks `if flag:` -- the opposite of
    # what the user asked for.
    low = v.strip().lower()
    if low in ("true", "false"):
        return low == "true"
    if low in ("none", "null"):
        return None
    try:
        return json.loads(v)
    except json.JSONDecodeError:
        return v


def apply_overrides(cfg: Any, args: argparse.Namespace) -> Any:
    if args.from_yaml:
        cfg = config_lib.load_yaml_overrides(cfg, args.from_yaml)
    overrides = {}
    for kv in args.set:
        k, _, v = kv.partition("=")
        overrides[k] = _parse_value(v)
    if overrides:
        cfg = config_lib.override(cfg, overrides)
    return cfg


def setup_platform(args: argparse.Namespace):
    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    from ..utils.cache import enable_compile_cache

    enable_compile_cache(root="/tmp/madrigal_jax_cache")


def load_data(args: argparse.Namespace) -> Tuple[SyntheticDataset, DDICollator]:
    if getattr(args, "synthetic_scale", False):
        from ..data.synthetic import make_reference_scale_dataset

        s = getattr(args, "synthetic_scale_shrink", 1) or 1
        if s > 1:
            ds = make_reference_scale_dataset(
                seed=args.seed,
                num_drugs=max(6843 // s, 16),
                num_labels=max(960 // s, 8),
                num_rows=max(174_763 // s, 64),
                kg_scale=s,
            )
        else:
            ds = make_reference_scale_dataset(seed=args.seed)
    elif args.synthetic or not args.data_dir:
        ds = make_dataset(
            num_drugs=args.synthetic_drugs,
            num_labels=args.synthetic_labels,
            num_edges=args.synthetic_edges,
            seed=args.seed,
        )
    else:
        from ..data.datasets import load_reference_dataset

        ds = load_reference_dataset(args.data_dir)
    # one shared device-table memo per run: every collator built from
    # this one (train/val/test, per-seed predict embeds) reuses the same
    # DrugModalityBatch entries instead of pinning per-split copies of
    # the full modality tables in HBM (the reference-scale OOM)
    coll = DDICollator(ds, split="train", seed=args.seed,
                       kg_edge_chunk=getattr(args, "kg_chunk", 0),
                       kg_src_sort=not getattr(args, "no_src_mxu", False),
                       drug_table_cache={})
    return ds, coll
