"""Flagship finetune step time at reference scale on the real chip.

Reference anchor: full-batch DDI finetuning on ONE A100 takes up to the
16 h SLURM limit for 600-800 epochs (finetune_twosides_scale.sh:6,
sweep_config_hardy_sweep_321.yaml num_epochs 800). This measures one
jitted train epoch of OUR flagship model at the same scale:

  * 6,843 drugs (data.py:708), flagship dims (128-d embeddings,
    2x(8x256) norm-first fusion with 2 tx bottlenecks, chemCPA 512-wide,
    HGT 128x4x2 over a PrimeKG-scale KG: 122.5k nodes / 8.3M edges),
  * a full-batch triple list of T pairs (triple-gather scoring instead
    of the reference's dense [L, N, N] + fancy indexing),
  * finetune_mode full_full (1 forward/epoch) and str_random_sample
    (the flagship 3-forward mode).

Usage: python scripts/train_scale_bench.py [--triples 1048576]
       [--mode str_random_sample] [--small]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

from madrigal_tpu.utils.cache import enable_compile_cache

if "--platform_cpu" in sys.argv:  # smoke-testing only; must precede any
    jax.config.update("jax_platforms", "cpu")  # backend initialization
enable_compile_cache()

import jax.numpy as jnp

from madrigal_tpu.config import (
    ChemCPAConfig,
    EncoderConfig,
    FusionConfig,
    GINConfig,
    HGTConfig,
    ModelConfig,
    OptimizerConfig,
    TrainConfig,
)
from madrigal_tpu.constants import CV_INPUT_DIM, NUM_CELL_LINES, TX_INPUT_DIM
from madrigal_tpu.data.batch import DrugModalityBatch
from madrigal_tpu.data.collate import DDIBatch
from madrigal_tpu.data.kg import build_kg_batch
from madrigal_tpu.data.molgraph import pack_molecules
from madrigal_tpu.data.synthetic import random_molecule
from madrigal_tpu.train.finetune import FinetuneTrainer

from hgt_scale_bench import EDGE_SPEC, NODE_TYPES  # noqa: E402


def build_scale_data(n_drugs, n_labels, n_triples, scale, rng,
                     kg_chunk=0, kg_src_sort=False):
    print(f"building {n_drugs} drugs / {n_triples} triples ...")
    mols = pack_molecules(
        [random_molecule(rng, int(rng.randint(8, 40)))
         for _ in range(n_drugs)]
    )
    node_feats = {
        nt: rng.randn(max(n // scale, 8), 128).astype(np.float32)
        for nt, n in NODE_TYPES.items()
    }
    edges = {}
    for src, rel, dst, e in EDGE_SPEC:
        e = max(e // scale, 16)
        edges[(src, rel, dst)] = np.stack([
            rng.randint(0, node_feats[src].shape[0], e),
            rng.randint(0, node_feats[dst].shape[0], e),
        ]).astype(np.int32)
    n_kg_drugs = node_feats["drug"].shape[0]
    kg = build_kg_batch(node_feats, edges, drug_ids=np.arange(n_kg_drugs),
                        edge_chunk=kg_chunk, src_sort=kg_src_sort)

    masks = np.zeros((n_drugs, 3 + NUM_CELL_LINES), bool)
    masks[:, 1] = rng.rand(n_drugs) > 0.7   # 70% have KG
    masks[:, 2] = rng.rand(n_drugs) > 0.5   # 50% have cv
    masks[:, 3:] = rng.rand(n_drugs, NUM_CELL_LINES) > 0.3
    kg_rows = np.where(
        masks[:, 1], -1,
        rng.randint(0, n_kg_drugs, n_drugs),
    ).astype(np.int32)

    store = DrugModalityBatch(
        drugs=jnp.arange(n_drugs, dtype=jnp.int32),
        mols=mols,
        kg_rows=jnp.asarray(kg_rows),
        cv=jnp.asarray(rng.randn(n_drugs, CV_INPUT_DIM).astype(np.float32)),
        tx_sigs=jnp.asarray(
            rng.randn(NUM_CELL_LINES, n_drugs, TX_INPUT_DIM)
            .astype(np.float32)),
        tx_dosages=jnp.asarray(
            rng.rand(NUM_CELL_LINES, n_drugs).astype(np.float32)),
        masks=jnp.asarray(masks),
    )
    batch = DDIBatch(
        head=store, tail=store,
        head_idx=jnp.asarray(rng.randint(0, n_drugs, n_triples), jnp.int32),
        tail_idx=jnp.asarray(rng.randint(0, n_drugs, n_triples), jnp.int32),
        labels=jnp.asarray(rng.randint(0, n_labels, n_triples), jnp.int32),
        pos_neg=jnp.asarray(
            (rng.rand(n_triples) < 0.5).astype(np.float32)),
        mask=jnp.ones(n_triples, bool),
    )
    return batch, kg


def flagship_cfg(n_labels, mode, bf16=False, label_chunk=0,
                 split=False, fusion_chunk=512, fusion_remat=True,
                 remat_forwards=True, share_kg=True, hgt_remat=True,
                 src_mxu=True, fusion_remat_policy=None):
    cdt = "bfloat16" if bf16 else "float32"
    enc = EncoderConfig(
        feature_dim=128,
        gin=GINConfig(hidden_dims=(128, 128, 128), num_mlp_layer=3),
        hgt=HGTConfig(hidden_dim=128, num_layers=2, att_heads=4,
                      remat_edge_types=hgt_remat, compute_dtype=cdt,
                      src_sorted_bwd=src_mxu),
        chemcpa=ChemCPAConfig(dim=128, autoencoder_width=512,
                              autoencoder_depth=2, use_drugs=False),
        transformer=FusionConfig(
            num_layers=2, att_heads=8, head_dim=256, ffn_dim=1024,
            dropout=0.2, actn="gelu", norm_first=True, agg="x-attn",
            num_tx_bottlenecks=2, remat=fusion_remat, compute_dtype=cdt,
            remat_policy=fusion_remat_policy,
        ),
        pos_emb_type="sinusoidal",
        fusion="transformer_uni_proj",
        fusion_batch_chunk=fusion_chunk,
    )
    return TrainConfig(
        model=ModelConfig(encoder=enc, prediction_dim=n_labels),
        optim=OptimizerConfig(),
        finetune_mode=mode, num_epochs=800, warmup_epochs=10, seed=0,
        remat_forwards=remat_forwards, label_chunk_triples=label_chunk,
        split_forward_grads=split, split_share_kg_table=share_kg,
    )


def run_config(cfg, batch, kg, label, reps=3):
    """Build a trainer, compile + time `reps` epochs; returns s/epoch."""
    t0 = time.perf_counter()
    trainer = FinetuneTrainer(cfg, batch, kg)
    print(f"[{label}] init: {time.perf_counter() - t0:.0f} s", flush=True)
    t0 = time.perf_counter()
    losses = trainer.train_epoch()
    print(f"[{label}] first epoch (incl. compile): "
          f"{time.perf_counter() - t0:.0f} s loss={losses['total']:.4f}",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(reps):
        losses = trainer.train_epoch()  # loss float() reads = barrier
    dt = (time.perf_counter() - t0) / reps
    print(f"[{label}] {dt:.2f} s/epoch", flush=True)
    return dt


def sweep(kind, batch, kg, n_labels, reps=3):
    """In-process config sweep (one process amortizes the ~450 s tunnel
    warmup and the compile cache across configs). Safest configs first;
    OOM/compile failures are caught and recorded."""
    import gc

    if kind == "full":
        # full_full (1 forward). Measured history: r2 baseline
        # (512, remat, rf) = 3.61; r3 sweep-1 best fc512+frm (rf off) =
        # 3.00 (fc1024/2048+frm = 3.06; fc0+frm / fc2048 / fc0 kill the
        # remote compile helper). Sweep-2 (post merged-lane + fused k|v):
        # retest the winner, then drop fusion remat at fc512 (small
        # program, never tried) and HGT remat_edge_types (post-lane
        # memory may fit) -- riskiest last.
        grid = [
            ("fc512+frm", dict(fusion_chunk=512, remat_forwards=False)),
            ("fc512", dict(fusion_chunk=512, fusion_remat=False,
                           remat_forwards=False)),
            ("fc512+frm-hrm", dict(fusion_chunk=512, remat_forwards=False,
                                   hgt_remat=False)),
            ("fc512-hrm", dict(fusion_chunk=512, fusion_remat=False,
                               remat_forwards=False, hgt_remat=False)),
        ]
        mk = lambda kw: flagship_cfg(n_labels, "full_full", bf16=True,
                                     label_chunk=64, **kw)
    elif kind == "split":
        # flagship 3-forward mode, split grads; r2 baseline (share off,
        # fc512+frm+rf) = 7.27 s/epoch
        grid = [
            ("noshare+fc512+frm+rf", dict(share_kg=False)),
            ("share+fc512+frm+rf", dict(share_kg=True)),
            ("share+fc512+frm", dict(share_kg=True,
                                     remat_forwards=False)),
            ("share+fc2048+frm", dict(share_kg=True, fusion_chunk=2048,
                                      remat_forwards=False)),
            ("share+fc0+frm", dict(share_kg=True, fusion_chunk=0,
                                   remat_forwards=False)),
        ]
        mk = lambda kw: flagship_cfg(
            n_labels, "str_random_sample", bf16=True, label_chunk=64,
            split=True, fusion_chunk=kw.pop("fusion_chunk", 512), **kw)
    elif kind == "r3fix":
        # post-SCAN_WEIGHT_ROWS-cap re-measurement (the uncapped scan
        # OOM'd every split config; see models/decoder.py). Mixed modes:
        # each entry carries (mode, split, kwargs).
        grid = [
            ("split:share+fc512+frm+rf",
             dict(mode="str_random_sample", split=True, share_kg=True)),
            ("split:share+fc512+frm",
             dict(mode="str_random_sample", split=True, share_kg=True,
                  remat_forwards=False)),
            ("split:noshare+fc512+frm+rf",
             dict(mode="str_random_sample", split=True, share_kg=False)),
            ("full:fc512+frm",
             dict(mode="full_full", split=False, remat_forwards=False)),
            ("full:fc512+frm-hrm",
             dict(mode="full_full", split=False, remat_forwards=False,
                  hgt_remat=False)),
        ]
        mk = lambda kw: flagship_cfg(
            n_labels, kw.pop("mode"), bf16=True, label_chunk=64,
            split=kw.pop("split"), **kw)
    elif kind == "mxu":
        # A/B the source-sorted MXU backward (ops/segment_pallas.py) on
        # the two production recipes; KG must be built with src_sort=True
        # (--src_mxu). Config flips HGTConfig.src_sorted_bwd over ONE
        # device-resident KG.
        grid = [
            ("full:fc512+frm-hrm+mxu",
             dict(mode="full_full", split=False, remat_forwards=False,
                  hgt_remat=False, src_mxu=True)),
            ("full:fc512+frm-hrm",
             dict(mode="full_full", split=False, remat_forwards=False,
                  hgt_remat=False, src_mxu=False)),
            ("full:fc512+frm+mxu",
             dict(mode="full_full", split=False, remat_forwards=False,
                  src_mxu=True)),
            ("split:share+fc512+frm+mxu",
             dict(mode="str_random_sample", split=True, share_kg=True,
                  remat_forwards=False, src_mxu=True)),
            ("split:share+fc512+frm",
             dict(mode="str_random_sample", split=True, share_kg=True,
                  remat_forwards=False, src_mxu=False)),
        ]
        mk = lambda kw: flagship_cfg(
            n_labels, kw.pop("mode"), bf16=True, label_chunk=64,
            split=kw.pop("split"), **kw)
    elif kind == "rp":
        # A/B the fusion remat POLICY: 'dots' keeps the Dense outputs
        # (QKV/out proj + both FFN matmuls) in the layer backward and
        # recomputes only attention einsums/elementwise; the program is
        # still a checkpointed layer (compile-helper-safe, unlike
        # dropping fusion remat entirely, which SIGKILLs it).
        grid = [
            ("full:fc512+frm-hrm+rp",
             dict(mode="full_full", split=False, remat_forwards=False,
                  hgt_remat=False, fusion_remat_policy="dots")),
            ("full:fc512+frm-hrm",
             dict(mode="full_full", split=False, remat_forwards=False,
                  hgt_remat=False)),
            ("split:share+fc512+frm+rp",
             dict(mode="str_random_sample", split=True, share_kg=True,
                  remat_forwards=False, fusion_remat_policy="dots")),
            ("split:share+fc512+frm",
             dict(mode="str_random_sample", split=True, share_kg=True,
                  remat_forwards=False)),
        ]
        mk = lambda kw: flagship_cfg(
            n_labels, kw.pop("mode"), bf16=True, label_chunk=64,
            split=kw.pop("split"), **kw)
    elif kind == "rp2":
        # follow-up to 'rp': does the 3-forward split mode tolerate (and
        # gain from) dropping HGT edge-type remat, with/without the
        # 'dots' fusion policy? (the 2x2's other half is in 'rp')
        grid = [
            ("split:share+fc512+frm-hrm+rp",
             dict(mode="str_random_sample", split=True, share_kg=True,
                  remat_forwards=False, hgt_remat=False,
                  fusion_remat_policy="dots")),
            ("split:share+fc512+frm-hrm",
             dict(mode="str_random_sample", split=True, share_kg=True,
                  remat_forwards=False, hgt_remat=False)),
        ]
        mk = lambda kw: flagship_cfg(
            n_labels, kw.pop("mode"), bf16=True, label_chunk=64,
            split=kw.pop("split"), **kw)
    elif kind == "rp3":
        # VERDICT r4 item 7: attack the ~365 ms of fusion-backward
        # recompute behind the compile-helper wall. remat_policy='all'
        # (jax.checkpoint_policies.everything_saveable) keeps the
        # checkpointed-layer program STRUCTURE the remote compile helper
        # tolerates while saving every residual -- zero recompute in the
        # backward, i.e. the remat-off FLOPs without the remat-off
        # program shape that SIGKILLs the helper. A/B vs 'dots' (the
        # current production winner) in one process, both modes.
        grid = [
            ("full:fc512+frm-hrm+rpall",
             dict(mode="full_full", split=False, remat_forwards=False,
                  hgt_remat=False, fusion_remat_policy="all")),
            ("full:fc512+frm-hrm+rpdots",
             dict(mode="full_full", split=False, remat_forwards=False,
                  hgt_remat=False, fusion_remat_policy="dots")),
            ("split:share+fc512+frm+rpall",
             dict(mode="str_random_sample", split=True, share_kg=True,
                  remat_forwards=False, fusion_remat_policy="all")),
            ("split:share+fc512+frm+rpdots",
             dict(mode="str_random_sample", split=True, share_kg=True,
                  remat_forwards=False, fusion_remat_policy="dots")),
        ]
        mk = lambda kw: flagship_cfg(
            n_labels, kw.pop("mode"), bf16=True, label_chunk=64,
            split=kw.pop("split"), **kw)
    elif kind == "full2":
        # full_full re-checks after the SCAN_WEIGHT_ROWS cap (fresh
        # process: the r3fix tail OOM'd on cross-config cache leakage)
        grid = [
            ("fc512+frm", dict(fusion_chunk=512, remat_forwards=False)),
            ("fc512+frm-hrm", dict(fusion_chunk=512, remat_forwards=False,
                                   hgt_remat=False)),
        ]
        mk = lambda kw: flagship_cfg(n_labels, "full_full", bf16=True,
                                     label_chunk=64, **kw)
    else:
        raise ValueError(kind)

    results = []
    for label, kw in grid:
        try:
            dt = run_config(mk(dict(kw)), batch, kg, label, reps=reps)
            results.append((label, dt))
        except Exception as e:  # OOM / compile failure: record, continue
            print(f"[{label}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            results.append((label, None))
        # the jit executable cache holds each config's step closures --
        # and through them the trainer (params + optimizer state + the
        # label-chunk view) -- alive for the whole process: measured
        # cumulative HBM exhaustion by config 3 of a 5-config sweep.
        # Dropping the caches frees the device arrays; the persistent
        # disk cache still serves the compiled blobs.
        jax.clear_caches()
        gc.collect()
        print("--- sweep so far:", flush=True)
        for lbl, d in results:
            print(f"    {lbl}: "
                  f"{'FAIL' if d is None else '%.2f s/epoch' % d}",
                  flush=True)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--triples", type=int, default=1 << 20)
    ap.add_argument("--labels", type=int, default=960)
    ap.add_argument("--mode", type=str, default="full_full")
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--bf16", action="store_true",
                    help="HGT + fusion compute_dtype=bfloat16")
    ap.add_argument("--kg_chunk", type=int, default=0,
                    help="degree-chunked KG arenas (8 = TPU default)")
    ap.add_argument("--label_chunk", type=int, default=0,
                    help="label-chunked triple layout (64 = CLI default)")
    ap.add_argument("--split", action="store_true",
                    help="split_forward_grads: per-forward grad steps")
    ap.add_argument("--fusion_chunk", type=int, default=512,
                    help="drug-axis fusion chunk (bigger = less scan "
                         "serialization, more activation memory)")
    ap.add_argument("--no_fusion_remat", action="store_true",
                    help="disable transformer.remat (whole-fusion "
                         "rematerialization)")
    ap.add_argument("--no_remat_forwards", action="store_true",
                    help="disable remat_forwards (per-forward "
                         "rematerialization)")
    ap.add_argument("--no_share_kg", action="store_true",
                    help="split mode: recompute the KG pass per forward")
    ap.add_argument("--no_hgt_remat", action="store_true",
                    help="disable hgt.remat_edge_types (more HBM, no "
                         "per-edge-type recompute in the backward)")
    ap.add_argument("--src_mxu", action="store_true",
                    help="build the KG with the source-sorted transpose "
                         "layout (src_sort=True; ops/segment_pallas.py)")
    ap.add_argument("--sweep", type=str, default=None,
                    choices=[None, "full", "split", "r3fix", "full2",
                             "mxu", "rp", "rp2", "rp3"],
                    help="run the built-in config sweep instead of one "
                         "config (amortizes tunnel warmup in-process)")
    ap.add_argument("--platform_cpu", action="store_true",
                    help="force the CPU backend (smoke tests; handled at "
                         "import time)")
    args = ap.parse_args()
    scale = 16 if args.small else 1
    n_drugs = 6843 // scale
    n_triples = args.triples // scale

    rng = np.random.RandomState(0)
    batch, kg = build_scale_data(n_drugs, args.labels, n_triples, scale,
                                 rng, kg_chunk=args.kg_chunk,
                                 kg_src_sort=args.src_mxu or
                                 args.sweep in ("mxu", "rp", "rp2", "rp3"))
    if args.sweep:
        sweep(args.sweep, batch, kg, args.labels)
        return
    cfg = flagship_cfg(args.labels, args.mode, bf16=args.bf16,
                       label_chunk=args.label_chunk,
                       split=args.split,
                       fusion_chunk=args.fusion_chunk,
                       fusion_remat=not args.no_fusion_remat,
                       remat_forwards=not args.no_remat_forwards,
                       share_kg=not args.no_share_kg,
                       hgt_remat=not args.no_hgt_remat)
    dt = run_config(cfg, batch, kg, args.mode, reps=5)
    print(
        f"mode={args.mode}{' bf16' if args.bf16 else ''}"
        f"{' lc%d' % args.label_chunk if args.label_chunk else ''}"
        f"{' split' if args.split else ''}: "
        f"{dt:.2f} s/epoch at N={n_drugs}, "
        f"T={n_triples}, L={args.labels} -> 800-epoch finetune ~= "
        f"{dt * 800 / 60:.0f} min on one chip (reference: <=16 h on A100,"
        " finetune_twosides_scale.sh:6)"
    )


if __name__ == "__main__":
    main()
