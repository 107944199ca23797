"""CL-pretraining (SimCLR) step time at reference scale on the real chip.

Reference anchor: stage-2 contrastive pretraining runs batch 768 for
1500-5000 epochs under a 2-day SLURM limit on one GPU
(configs/cl_pretrain/pretrain_twosides.yaml, run_pretrain_twosides.sh:6,
parse_args.py:186,201). This measures OUR flagship CL step at that scale:

  * batch 768 drugs out of 6,843, flagship encoder dims,
  * two masked encoder views + InfoNCE (SimCLR, simclr.py:74-108),
  * full PrimeKG-scale KG message pass shared per step.

The drug batch is prebuilt and timing covers the jitted step only (the
production input pipeline double-buffers host work; benchmarking through
the axon tunnel's 31 MB/s host link would measure the tunnel, not the
chip -- CLAUDE.md).

Usage: python scripts/pretrain_scale_bench.py [--small] [--bf16]
       [--kg_chunk 8] [--batch 768]
"""
import argparse
import os
import sys
import time

import numpy as np
import pandas as pd

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
    PretrainConfig,
)
from madrigal_tpu.constants import (
    CV_INPUT_DIM,
    NUM_CELL_LINES,
    TX_INPUT_DIM,
)
from madrigal_tpu.data.collate import DDICollator
from madrigal_tpu.data.kg import build_kg_batch
from madrigal_tpu.data.synthetic import SyntheticDataset, random_molecule
from madrigal_tpu.train.pretrain_cl import CLPretrainer

from hgt_scale_bench import EDGE_SPEC, NODE_TYPES  # noqa: E402


def build_ds(n_drugs, scale, rng):
    node_feats = {
        nt: rng.randn(max(n // scale, 8), 128).astype(np.float32)
        for nt, n in NODE_TYPES.items()
    }
    # the drug node table maps 1:1 onto the first drugs
    n_kg = min(n_drugs, node_feats["drug"].shape[0])
    node_feats["drug"] = node_feats["drug"][:n_kg]
    edges = {}
    for src, rel, dst, e in EDGE_SPEC:
        e = max(e // scale, 16)
        edges[(src, rel, dst)] = np.stack([
            rng.randint(0, node_feats[src].shape[0], e),
            rng.randint(0, node_feats[dst].shape[0], e),
        ]).astype(np.int32)

    mod_avail = np.zeros((n_drugs, 3 + NUM_CELL_LINES), np.int64)
    mod_avail[:, 0] = 1                                  # str for all
    mod_avail[:n_kg, 1] = rng.rand(n_kg) > 0.3           # 70% have KG
    mod_avail[:, 2] = rng.rand(n_drugs) > 0.5
    mod_avail[:, 3:] = rng.rand(n_drugs, NUM_CELL_LINES) > 0.3

    df = pd.DataFrame({"head": [0, 1], "tail": [1, 2],
                       "label_indexed": [0, 0]})
    ds = SyntheticDataset(
        num_drugs=n_drugs,
        num_labels=4,
        molecules=[random_molecule(rng, int(rng.randint(8, 40)))
                   for _ in range(n_drugs)],
        mod_avail=mod_avail,
        cv_table=rng.randn(n_drugs, CV_INPUT_DIM).astype(np.float32),
        tx_table=rng.randn(NUM_CELL_LINES, n_drugs, TX_INPUT_DIM)
        .astype(np.float32),
        tx_dosages=rng.rand(NUM_CELL_LINES, n_drugs)
        .astype(np.float32),
        kg_node_feats=node_feats,
        kg_edge_indices=edges,
        kg_drug_ids=np.arange(n_kg),
        edge_df=df,
    )
    return ds


def run_one(coll, kg, bsz, n_drugs, bf16, hgt_remat, reps=5,
            src_mxu=True):
    """Build a CLPretrainer for one config and time the jitted step."""
    cdt = "bfloat16" if bf16 else "float32"
    enc = EncoderConfig(
        feature_dim=128,
        gin=GINConfig(hidden_dims=(128, 128, 128), num_mlp_layer=3),
        hgt=HGTConfig(hidden_dim=128, num_layers=2, att_heads=4,
                      remat_edge_types=hgt_remat,
                      compute_dtype=cdt, src_sorted_bwd=src_mxu),
        chemcpa=ChemCPAConfig(dim=128, autoencoder_width=512,
                              autoencoder_depth=2, use_drugs=False),
        transformer=FusionConfig(
            num_layers=2, att_heads=8, head_dim=256, ffn_dim=1024,
            dropout=0.2, actn="gelu", norm_first=True, agg="x-attn",
            num_tx_bottlenecks=2, compute_dtype=cdt,
        ),
        pos_emb_type="sinusoidal",
        fusion="transformer_uni_proj",
    )
    cfg = PretrainConfig(
        encoder=enc, pretrain_batch_size=bsz, pretrain_num_epochs=1500,
        warmup_epochs=10, seed=0,
    )

    t0 = time.perf_counter()
    trainer = CLPretrainer(cfg, coll, kg)
    print(f"init: {time.perf_counter() - t0:.0f} s")

    # prebuilt batch + fixed masks: time the jitted step only
    ids = trainer.drug_ids[:bsz]
    batch = coll.drug_batch(ids)
    m1, m2 = trainer._sample_masks(ids)
    m1, m2 = jnp.asarray(m1), jnp.asarray(m2)
    key = jax.random.PRNGKey(1)

    t0 = time.perf_counter()
    state, loss = trainer._step(trainer.state, batch, kg, m1, m2, key)
    print(f"first step (incl. compile): {time.perf_counter() - t0:.0f} s "
          f"loss={float(loss):.4f}", flush=True)

    t0 = time.perf_counter()
    for _ in range(reps):
        state, loss = trainer._step(state, batch, kg, m1, m2, key)
    loss_v = float(loss)  # device->host read = completion barrier
    dt = (time.perf_counter() - t0) / reps
    tag = ["bf16" if bf16 else "f32"]
    if not hgt_remat:
        tag.append("no-hgt-remat")
    if src_mxu and (kg.edge_src_order or {}):
        tag.append("src-mxu")
    steps_per_epoch = -(-len(trainer.drug_ids) // bsz)
    total_min = dt * 1500 * steps_per_epoch / 60
    print(
        f"CL step {'+'.join(tag)}: {dt:.2f} s/step at "
        f"bs={bsz}, N={n_drugs} ({len(trainer.drug_ids)} pretrain-eligible"
        f" -> {steps_per_epoch} steps/epoch), full KG -> 1500-epoch "
        f"pretrain ~= {total_min:.0f} min on one chip (reference: <=2 days"
        f" on one GPU, run_pretrain_twosides.sh:6); loss={loss_v:.4f}",
        flush=True,
    )
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--batch", type=int, default=768)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--kg_chunk", type=int, default=0)
    ap.add_argument("--src_mxu", action="store_true",
                    help="source-sorted MXU backward for the HGT src "
                         "gathers (ops/segment_pallas.py)")
    ap.add_argument("--no_hgt_remat", action="store_true",
                    help="disable hgt.remat_edge_types (more HBM, no "
                         "per-edge-type recompute in the backward)")
    ap.add_argument("--sweep", action="store_true",
                    help="A/B the production configs incl. the MXU src backward "
                         "process (one data build, shared tunnel warmup)")
    ap.add_argument("--platform_cpu", action="store_true",
                    help="smoke-testing only (handled at import time)")
    args = ap.parse_args()
    scale = 16 if args.small else 1
    n_drugs = 6843 // scale
    bsz = min(args.batch, n_drugs)

    rng = np.random.RandomState(0)
    print(f"building {n_drugs} drugs + PrimeKG/{scale} ...", flush=True)
    ds = build_ds(n_drugs, scale, rng)
    coll = DDICollator(ds, split="train", kg_edge_chunk=args.kg_chunk,
                       kg_src_sort=args.src_mxu or args.sweep)
    kg = coll.kg_batch()

    if args.sweep:
        # sweep: A/B the MXU backward on the two production configs
        results = []
        for bf16, hrm, mxu in ((True, False, False), (True, False, True),
                               (True, True, True), (False, True, True)):
            try:
                dt = run_one(coll, kg, bsz, n_drugs, bf16, hrm,
                             src_mxu=mxu)
            except Exception as e:  # OOM / compile failure: record, go on
                print(f"[bf16={bf16} hgt_remat={hrm} src_mxu={mxu}] "
                      f"FAILED: {type(e).__name__}: {str(e)[:200]}",
                      flush=True)
                dt = None
            results.append((bf16, hrm, mxu, dt))
            # drop each config's jit closures (trainer params/opt state)
            # -- the cross-config leak that OOM'd the finetune sweeps
            import gc
            jax.clear_caches()
            gc.collect()
        print("--- sweep:", flush=True)
        for bf16, hrm, mxu, dt in results:
            print(f"    bf16={int(bf16)} hgt_remat={int(hrm)} "
                  f"src_mxu={int(mxu)}: "
                  f"{'FAIL' if dt is None else '%.2f s/step' % dt}",
                  flush=True)
        return
    run_one(coll, kg, bsz, n_drugs, args.bf16, not args.no_hgt_remat,
            src_mxu=args.src_mxu)


if __name__ == "__main__":
    main()
