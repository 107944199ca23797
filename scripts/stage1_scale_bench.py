"""Stage-1 modality-pretraining step time at reference scale (VERDICT r3
item 3): the four stage-1 trainers (train/modality_pretrain.py) timed at
the reference's own training dims, with projected total wall-clock vs the
reference's stage-1 SLURM budgets.

Reference anchors (all single-GPU):
  str  GIN 256x4 property prediction on MUV: 93,087 molecules, 17 tasks,
       batch 10,000, 500 epochs, 3 h budget
       (structure_pretraining_muv.py:81-82, structure_pretraining.sbatch).
  kg   HGT(128, 2 layers, 4 heads) link prediction on the FULL KG
       (PrimeKG scale: 122.5k nodes / 8.3M directed edges / 17 types),
       full-graph step, 300 epochs, 3 h budget
       (kg_pretraining.py:101-148, kg_pretraining.sbatch).
  cv   MLP autoencoder 559 -> [512,256] -> 128, batch 128, 200 epochs,
       5 h budget (cv_pretraining.py:53-91, cv_pretraining.sbatch).
  tx   chemCPA adaptation: 978 genes, width 512 x depth 2, 16 covariate
       categories, batch 4096, <=300 epochs capped at 600 min
       (configs/chemcpa/chemcpa_tx_adapting_configs_sweep.yaml:7-8,31;
       experiments_run.py:269-360). LINCS row count is not in the repo;
       --tx_rows defaults to 100k (chemCPA's LINCS-scale subset).

The cv batch of 128 is dispatch-bound on a TPU; the bench reports the
reference-shaped loop AND the TPU-native full-batch epoch (all rows in
one step) since the AE fits trivially.

Usage: python scripts/stage1_scale_bench.py [--small] [--json out]
       [--skip str,kg,...]
"""
import argparse
import gc
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

if "--platform_cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from madrigal_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax.numpy as jnp

from madrigal_tpu.config import ChemCPAConfig, GINConfig, HGTConfig
from madrigal_tpu.data.kg import build_kg_batch
from madrigal_tpu.data.molgraph import pack_molecules
from madrigal_tpu.data.synthetic import random_molecule
from madrigal_tpu.train.modality_pretrain import (
    ChemCPAAdaptTrainer,
    GINPretrainer,
    HGTLinkPredTrainer,
    TabularAETrainer,
)

from hgt_scale_bench import EDGE_SPEC, NODE_TYPES  # noqa: E402

H = 3600.0
BUDGETS_H = {"str": 3.0, "kg": 3.0, "cv": 5.0, "tx": 10.0}


def _time_steps(step_fn, reps=3, label=""):
    """Compile (first call) + best-of-reps; step_fn must block via its
    float(loss) read (all four trainers do)."""
    step_fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        step_fn()
        best = min(best, time.perf_counter() - t0)
    print(f"  {label}: {best * 1e3:.1f} ms/step", flush=True)
    return best


def bench_str(rng, scale):
    """GIN 256x4 on MUV-scale molecule batches (bs 10,000)."""
    n_mols, bs, n_tasks = 93_087 // scale, 10_000 // scale, 17
    mols = pack_molecules(
        [random_molecule(rng, int(rng.randint(8, 40))) for _ in range(bs)]
    )
    labels = (rng.rand(bs, n_tasks) < 0.05).astype(np.float32)
    # MUV labels are sparse: ~84% measured per task
    mask = (rng.rand(bs, n_tasks) < 0.84).astype(np.float32)
    tr = GINPretrainer(GINConfig(hidden_dims=(256, 256, 256),
                                 num_mlp_layer=2),
                       feature_dim=256, num_tasks=n_tasks)
    dt = _time_steps(lambda: tr.train_step(mols, labels, mask),
                     label="str GIN step (bs 10k)")
    steps = 500 * -(-n_mols // bs)  # 500 epochs x ceil(93087/10000)
    return {"s_per_step": dt, "steps_total": steps,
            "projected_hours": dt * steps / H}


def bench_kg(rng, scale):
    """HGT link prediction: one FULL-graph step at PrimeKG scale."""
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
    num_nodes = {k: v.shape[0] for k, v in node_feats.items()}
    # TPU recipe = the stage-2/3 production KG recipe (CLAUDE.md): bf16
    # edge streams + degree-chunked arenas + sorted-src MXU backward +
    # per-edge-type remat. The all-f32 no-remat full-graph fwd+bwd needs
    # >16G HBM at this scale (the inherent [E, 2F] k|v streams and their
    # backward cotangents alone are ~1 GB per live edge type) -- it fits
    # an 80G A100 but not a 16G v5e chip; bf16 + remat_edge_types is the
    # recipe every stage-2/3 headline number in this repo uses.
    tr = HGTLinkPredTrainer(
        HGTConfig(hidden_dim=128, num_layers=2, att_heads=4,
                  compute_dtype="bfloat16", remat_edge_types=True),
        feature_dim=128,
    )
    queries, labels, message_edges = tr.make_link_split(
        edges, np.random.RandomState(0), num_nodes
    )
    kg = build_kg_batch(node_feats, message_edges,
                        drug_ids=np.arange(num_nodes["drug"]),
                        edge_chunk=8, src_sort=True)
    n_q = int(labels.shape[0])
    dt = _time_steps(lambda: tr.train_step(kg, queries, labels),
                     label=f"kg HGT full-graph step ({n_q} queries)")
    return {"s_per_step": dt, "steps_total": 300,
            "projected_hours": dt * 300 / H}


def bench_cv(rng, scale):
    """AE 559 -> [512,256] -> 128: reference bs-128 loop AND the
    TPU-native full-batch epoch."""
    n_rows, in_dim, bs = 6843 // scale, 559, 128
    x = rng.randn(n_rows, in_dim).astype(np.float32)
    tr = TabularAETrainer(input_dim=in_dim, hidden_dims=(512, 256),
                          latent_dim=128)
    dt_small = _time_steps(lambda: tr.train_step(x[:bs]),
                           label="cv AE step (bs 128)")
    steps = 200 * -(-n_rows // bs)
    # full-batch: every row in one step (static shape change -> new jit)
    tr2 = TabularAETrainer(input_dim=in_dim, hidden_dims=(512, 256),
                           latent_dim=128)
    dt_full = _time_steps(lambda: tr2.train_step(x),
                          label=f"cv AE full-batch step ({n_rows} rows)")
    return {"s_per_step": dt_small, "steps_total": steps,
            "projected_hours": dt_small * steps / H,
            "fullbatch_s_per_epoch": dt_full,
            "fullbatch_projected_hours": dt_full * 200 / H}


def bench_tx(rng, scale, tx_rows):
    """chemCPA adaptation AE step at LINCS scale (978 genes, bs 4096).
    Madrigal's adaptation runs disable_adv=True (experiments use the
    adversary-free config); the adversary step is timed too for the full
    CPA dynamics."""
    bs, genes_dim, n_cov = 4096 // scale, 978, 16
    cfg = ChemCPAConfig(num_genes=genes_dim, dim=128,
                        autoencoder_width=512, autoencoder_depth=2,
                        num_covariates=n_cov, use_drugs=False,
                        disable_adv=False)
    tr = ChemCPAAdaptTrainer(cfg, adversary_steps=2)
    genes = rng.randn(bs, genes_dim).astype(np.float32)
    cov = rng.randint(0, n_cov, bs)

    # iteration parity decides ae vs adv (adv runs when
    # iteration % adversary_steps == 0); pin each explicitly
    def ae_step():
        tr.iteration = 1
        out = tr.train_step(genes, cov)
        assert "loss_reconstruction" in out, out
        return out

    def adv_step():
        tr.iteration = 0
        out = tr.train_step(genes, cov)
        assert "loss_adv" in out, out
        return out

    dt_ae = _time_steps(ae_step, label="tx chemCPA AE step (bs 4096)")
    dt_adv = _time_steps(adv_step, label="tx chemCPA adversary step")
    steps = 300 * -(-tx_rows // max(bs, 1))
    # reference cadence: 1 adversary step per adversary_steps iterations
    mix = (dt_ae * (tr.adversary_steps - 1) + dt_adv) / tr.adversary_steps
    return {"s_per_step_ae": dt_ae, "s_per_step_adv": dt_adv,
            "steps_total": steps, "tx_rows_assumed": tx_rows,
            "projected_hours": mix * steps / H}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--platform_cpu", action="store_true")
    ap.add_argument("--tx_rows", type=int, default=100_000)
    ap.add_argument("--skip", type=str, default="",
                    help="comma-separated subset of str,kg,cv,tx to skip")
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args()
    scale = 64 if args.small else 1
    skip = set(filter(None, args.skip.split(",")))

    rng = np.random.RandomState(0)
    results = {}
    benches = {
        "str": lambda: bench_str(rng, scale),
        "kg": lambda: bench_kg(rng, scale),
        "cv": lambda: bench_cv(rng, scale),
        "tx": lambda: bench_tx(rng, scale, args.tx_rows // scale),
    }
    for name, fn in benches.items():
        if name in skip:
            continue
        print(f"[{name}]", flush=True)
        t0 = time.perf_counter()
        results[name] = fn()
        results[name]["budget_hours"] = BUDGETS_H[name]
        print(f"[{name}] done in {time.perf_counter() - t0:.0f} s "
              f"(incl. compile)", flush=True)
        # executables pin trainer state on device across benches
        jax.clear_caches()
        gc.collect()

    print("\n| stage-1 | s/step | steps | projected total | reference "
          "budget | speedup |", flush=True)
    print("|---|---|---|---|---|---|", flush=True)
    for name, r in results.items():
        sps = r.get("s_per_step", r.get("s_per_step_ae"))
        ph, bh = r["projected_hours"], r["budget_hours"]
        total = (f"{ph * 60:.1f} min" if ph < 1 else f"{ph:.2f} h")
        print(f"| {name} | {sps:.4f} | {r['steps_total']} | {total} "
              f"| <= {bh:.0f} h | {bh / ph:.0f}x |", flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {args.json}", flush=True)


if __name__ == "__main__":
    main()
