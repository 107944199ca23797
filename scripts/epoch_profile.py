"""Per-phase cost breakdown of the flagship finetune epoch on the real chip.

Replaces the round-2 "HGT fwd+bwd ~0.9 s est." with measurements: each
phase of the full_full epoch (SURVEY.md section 3.1 hot path) is timed as
its own jitted program at reference scale (N=6843 drugs, T=1M triples,
L=960, full PrimeKG-scale KG), best-of-3 with completion-forcing reads:

  hgt_fwd        full-KG HGT message passing -> drug table
  hgt_fwd_bwd    + backward (vjp of <table, cot> wrt params)
  gin_fwd        GIN over all drug molecules
  chemcpa_fwd    chemCPA over the [C*B, G] signature rows
  tokens_fwd     full modality token stack (table precomputed)
  encode_fwd     tokens + fusion transformer (chunked/remat as configured)
  encode_fwd_bwd + backward
  loss_fwd       the whole forward loss (encode head+tail + decoder)
  loss_fwd_bwd   value_and_grad of the loss (= the epoch minus optimizer)
  optimizer      multi-group AdamW update
  epoch          trainer.train_epoch() (cross-check: ~ loss_fwd_bwd +
                 optimizer + host overhead)

Writes docs-ready markdown to stdout and a JSON artifact.

Usage: python scripts/epoch_profile.py [--fusion_chunk 512]
       [--no_fusion_remat] [--no_remat_forwards] [--small] [--json out]
"""
import argparse
import dataclasses
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

from madrigal_tpu.train.finetune import FinetuneTrainer
from train_scale_bench import build_scale_data, flagship_cfg


def timed(fn, *args, reps=3, label=""):
    """Compile + best-of-reps wall time, ending in a device->host read
    (the axon tunnel's block_until_ready can return early).

    A phase that exhausts HBM records None instead of killing the run:
    the standalone (non-donated) fwd+bwd programs hold params + grads +
    opt state simultaneously, which the donated production step does
    not, so a phase can OOM even when the epoch itself fits (e.g.
    loss_fwd_bwd under the 'dots' fusion remat policy)."""
    try:
        return _timed(fn, *args, reps=reps, label=label)
    except Exception as e:  # RESOURCE_EXHAUSTED etc.
        if "RESOURCE_EXHAUSTED" not in str(e) and \
                "Ran out of memory" not in str(e):
            raise
        print(f"  {label}: OOM (standalone phase; see docstring)",
              flush=True)
        import gc

        jax.clear_caches()
        gc.collect()
        return None


def _timed(fn, *args, reps=3, label=""):
    out = fn(*args)
    first = jax.tree_util.tree_leaves(out)[0]
    float(jnp.max(jnp.ravel(first)[:8]))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        first = jax.tree_util.tree_leaves(out)[0]
        float(jnp.max(jnp.ravel(first)[:8]))
        best = min(best, time.perf_counter() - t0)
    print(f"  {label}: {best * 1e3:.0f} ms", flush=True)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--triples", type=int, default=1 << 20)
    ap.add_argument("--labels", type=int, default=960)
    ap.add_argument("--fusion_chunk", type=int, default=512)
    ap.add_argument("--no_fusion_remat", action="store_true")
    ap.add_argument("--no_remat_forwards", action="store_true")
    ap.add_argument("--no_hgt_remat", action="store_true")
    ap.add_argument("--no_src_mxu", action="store_true",
                    help="disable the source-sorted MXU backward "
                         "(ops/segment_pallas.py)")
    ap.add_argument("--fusion_remat_policy", type=str, default="dots",
                    choices=["dots", "none"],
                    help="remat policy for the fusion layers (save Dense "
                         "outputs; recompute only attention/elementwise)")
    ap.add_argument("--decoder_only", action="store_true",
                    help="run just the KG-table + decoder/BCE phases")
    ap.add_argument("--kg_chunk", type=int, default=8)
    ap.add_argument("--label_chunk", type=int, default=64)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--platform_cpu", action="store_true")
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args()

    scale = 16 if args.small else 1
    n_drugs = 6843 // scale
    rng = np.random.RandomState(0)
    batch, kg = build_scale_data(n_drugs, args.labels,
                                 args.triples // scale, scale, rng,
                                 kg_chunk=args.kg_chunk,
                                 kg_src_sort=not args.no_src_mxu)
    cfg = flagship_cfg(args.labels, "full_full", bf16=True,
                       label_chunk=args.label_chunk,
                       fusion_chunk=args.fusion_chunk,
                       fusion_remat=not args.no_fusion_remat,
                       remat_forwards=not args.no_remat_forwards,
                       hgt_remat=not args.no_hgt_remat,
                       src_mxu=not args.no_src_mxu,
                       fusion_remat_policy=(
                           None if args.fusion_remat_policy == "none"
                           else args.fusion_remat_policy))
    t0 = time.perf_counter()
    trainer = FinetuneTrainer(cfg, batch, kg)
    print(f"init: {time.perf_counter() - t0:.0f} s", flush=True)
    params = trainer.state.params
    bstats = trainer.state.batch_stats
    model = trainer.model
    tb = trainer.train_batch
    key = jax.random.PRNGKey(0)
    d = cfg.model.encoder.feature_dim

    times = {}

    # -- KG -----------------------------------------------------------
    table_fn = jax.jit(trainer._kg_table_pure)
    times["hgt_fwd"] = timed(table_fn, params, kg, label="hgt_fwd")
    table = table_fn(params, kg)
    cot_tab = jnp.asarray(
        rng.randn(*table.shape).astype(np.float32))

    @jax.jit
    def hgt_fwd_bwd(p, kg, cot):
        return jax.grad(
            lambda pp: jnp.vdot(trainer._kg_table_pure(pp, kg), cot))(p)

    times["hgt_fwd_bwd"] = timed(hgt_fwd_bwd, params, kg, cot_tab,
                                 label="hgt_fwd_bwd")

    # -- per-modality encoders (train-mode, batch_stats discarded) ----
    @jax.jit
    def gin_fwd(p, bs, mols, rng):
        out, _ = model.apply(
            {"params": p, "batch_stats": bs}, mols,
            method=lambda m, mm: m.encoder.str_enc(mm, train=True),
            mutable=["batch_stats"], rngs={"dropout": rng})
        return out[0]

    times["gin_fwd"] = timed(gin_fwd, params, bstats, tb.head.mols, key,
                             label="gin_fwd")

    C, B = tb.head.tx_sigs.shape[0], tb.head.batch_size
    genes = tb.head.tx_sigs.reshape(C * B, -1)
    cov_idx = jnp.repeat(jnp.arange(C, dtype=jnp.int32), B)

    @jax.jit
    def chemcpa_fwd(p, bs, genes, cov, rng):
        out, _ = model.apply(
            {"params": p, "batch_stats": bs}, genes, cov, None, None,
            method=lambda m, g, c, di, do: m.encoder.tx_enc(
                g, c, di, do, train=True),
            mutable=["batch_stats"], rngs={"dropout": rng})
        return out

    times["chemcpa_fwd"] = timed(chemcpa_fwd, params, bstats, genes,
                                 cov_idx, key, label="chemcpa_fwd")

    # -- token stack + fusion ----------------------------------------
    @jax.jit
    def tokens_fwd(p, bs, b, tab, rng):
        out, _ = model.apply(
            {"params": p, "batch_stats": bs}, b,
            method=lambda m, bb: m.encoder.modality_tokens(
                bb, kg_drug_table=tab, train=True),
            mutable=["batch_stats"], rngs={"dropout": rng})
        return out

    times["tokens_fwd"] = timed(tokens_fwd, params, bstats, tb.head,
                                table, key, label="tokens_fwd")

    @jax.jit
    def encode_fwd(p, bs, b, tab, rng):
        out, _ = model.apply(
            {"params": p, "batch_stats": bs}, b,
            method=lambda m, bb: m.encoder.encode(
                bb, kg_drug_table=tab, train=True),
            mutable=["batch_stats"], rngs={"dropout": rng})
        return out

    times["encode_fwd"] = timed(encode_fwd, params, bstats, tb.head,
                                table, key, label="encode_fwd")
    cot_z = jnp.asarray(rng.randn(B, d).astype(np.float32))

    @jax.jit
    def encode_fwd_bwd(p, bs, b, tab, rng, cot):
        def f(pp):
            out, _ = model.apply(
                {"params": pp, "batch_stats": bs}, b,
                method=lambda m, bb: m.encoder.encode(
                    bb, kg_drug_table=tab, train=True),
                mutable=["batch_stats"], rngs={"dropout": rng})
            return jnp.vdot(out, cot)

        return jax.grad(f)(p)

    times["encode_fwd_bwd"] = timed(encode_fwd_bwd, params, bstats,
                                    tb.head, table, key, cot_z,
                                    label="encode_fwd_bwd")

    # -- decoder + BCE only (label-chunked triples path) --------------
    from madrigal_tpu.train.losses import masked_bce

    z_all = jnp.asarray(rng.randn(B, d).astype(np.float32))

    def _dec_loss(p, z, b, w, cl):
        zh, zt = z[b.head_idx], z[b.tail_idx]
        out = model.apply(
            {"params": p}, zh, zt, b.labels, cl,
            method=lambda m, a, c, l, chunk: m.decoder.triples(
                a, c, l, chunk_labels=chunk,
                label_chunk=trainer.label_chunk))
        return masked_bce(out, b.pos_neg, w, cfg.loss_readout)

    dec_loss_fwd = jax.jit(_dec_loss)
    dargs = (params, z_all, tb, trainer.w_all, trainer.chunk_labels)
    times["dec_loss_fwd"] = timed(dec_loss_fwd, *dargs,
                                  label="dec_loss_fwd")

    @jax.jit
    def dec_loss_fwd_bwd(p, z, b, w, cl):
        # grads wrt BOTH the decoder weights and the [N, d] embedding
        # table (the cotangent the encoder backward consumes)
        (_, (gp, gz)) = jax.value_and_grad(
            _dec_loss, argnums=(0, 1))(p, z, b, w, cl)
        return gz

    times["dec_loss_fwd_bwd"] = timed(dec_loss_fwd_bwd, *dargs,
                                      label="dec_loss_fwd_bwd")

    if args.decoder_only:
        for k, v in times.items():
            print(f"| {k} | {v * 1e3:.0f} |")
        return

    # -- whole loss ---------------------------------------------------
    # The per-phase executables accumulated above stay pinned on device
    # (the in-process sweep leak, train_scale_bench.sweep); with the
    # 'dots' fusion policy the full fwd+bwd program no longer fits next
    # to them. Drop them -- only the phases below recompile.
    import gc

    jax.clear_caches()
    gc.collect()

    mh, mt = trainer.masker.sample_epoch()
    mh, mt = jnp.asarray(mh), jnp.asarray(mt)

    @jax.jit
    def loss_fwd(p, bs, b, kg, mh, mt, w, rng, cl):
        loss, _ = trainer._forward_loss(p, bs, b, kg, mh, mt, w, rng, cl)
        return loss

    fargs = (params, bstats, tb, kg, mh, mt, trainer.w_all, key,
             trainer.chunk_labels)
    times["loss_fwd"] = timed(loss_fwd, *fargs, label="loss_fwd")

    # the epoch (the headline, a donated fused step) is measured BEFORE
    # the standalone fwd+bwd phase: the non-donated loss_fwd_bwd can
    # exhaust HBM under the 'dots' policy, and on the axon backend a
    # failed allocation leaves the device exhausted for the rest of the
    # process -- order so that only attribution rows are at risk.
    jax.clear_caches()
    gc.collect()
    trainer.train_epoch()  # compile the real step
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        trainer.train_epoch()
        best = min(best, time.perf_counter() - t0)
    times["epoch"] = best
    print(f"  epoch: {best * 1e3:.0f} ms", flush=True)
    jax.clear_caches()
    gc.collect()
    # the step donates the state, invalidating the originally captured
    # params/batch_stats buffers -- re-capture for the remaining phases
    params = trainer.state.params
    bstats = trainer.state.batch_stats
    fargs = (params, bstats, tb, kg, mh, mt, trainer.w_all, key,
             trainer.chunk_labels)

    @jax.jit
    def loss_fwd_bwd(p, bs, b, kg, mh, mt, w, rng, cl):
        def f(pp):
            loss, _ = trainer._forward_loss(pp, bs, b, kg, mh, mt, w,
                                            rng, cl)
            return loss

        return jax.value_and_grad(f)(p)

    times["loss_fwd_bwd"] = timed(loss_fwd_bwd, *fargs,
                                  label="loss_fwd_bwd")
    if times["loss_fwd_bwd"] is not None:
        _, grads = loss_fwd_bwd(*fargs)

        @jax.jit
        def opt_update(g, o, p):
            return trainer.tx.update(g, o, p)

        times["optimizer"] = timed(opt_update, grads,
                                   trainer.state.opt_state,
                                   params, label="optimizer")
        del grads
    else:
        times["optimizer"] = None  # needs the grads pytree

    # -- report -------------------------------------------------------
    def _diff(*keys):
        vals = [times[k] for k in keys]
        if any(v is None for v in vals):
            return None
        return vals[0] - sum(vals[1:])

    derived = {
        "fusion_fwd (encode - tokens)": _diff("encode_fwd", "tokens_fwd"),
        "hgt_bwd_only": _diff("hgt_fwd_bwd", "hgt_fwd"),
        "host+dispatch (epoch - loss_fwd_bwd - optimizer)":
            _diff("epoch", "loss_fwd_bwd", "optimizer"),
    }
    ep = times["epoch"]
    print("\nNOTE: phases are standalone jitted programs; they need not "
          "sum to the epoch -- inside the fused loss XLA CSEs the "
          "head/tail encodes (identical masks in full_full) and "
          "schedules/remats differently.", flush=True)
    print("\n| phase | ms | % of epoch |", flush=True)
    print("|---|---|---|", flush=True)
    for k, v in {**times, **derived}.items():
        if v is None:
            print(f"| {k} | OOM (standalone; the donated step fits) "
                  f"| - |", flush=True)
        else:
            print(f"| {k} | {v * 1e3:.0f} | {100 * v / ep:.0f}% |",
                  flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"times_s": times, "derived_s": derived,
                       "config": {"fusion_chunk": args.fusion_chunk,
                                  "fusion_remat": not args.no_fusion_remat,
                                  "remat_forwards":
                                      not args.no_remat_forwards,
                                  "n_drugs": n_drugs,
                                  "triples": args.triples // scale,
                                  "labels": args.labels}}, f, indent=1)
        print(f"wrote {args.json}", flush=True)


if __name__ == "__main__":
    main()
