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

Each phase also gets ROOFLINE columns (VERDICT r3 item 1): XLA's own
cost model (compiled.cost_analysis(): flops + bytes accessed of the
optimized HLO) divided by the measured wall time, against ceilings
measured on the same chip in the same process (8192^3 bf16 matmul for
the MXU, a 1 GiB read+write stream for HBM) -- so every row answers
"is this fast, or merely faster than last round" with a bound
classification (MXU / HBM / neither=latency+gaps).

loss_fwd_bwd no longer OOMs: the optimizer state (2x params of AdamW
mu/nu) is offloaded to host around the standalone fwd+bwd phase and
pulled back for the optimizer row.

Writes docs-ready markdown to stdout and a JSON artifact.

Usage: python scripts/epoch_profile.py [--fusion_chunk 512]
       [--no_fusion_remat] [--no_remat_forwards] [--small] [--json out]
       [--prng rbg] [--no_rooflines]
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


def measure_ceilings():
    """Measured chip ceilings for the roofline columns (best-of-3 each):
    MXU bf16 matmul TFLOP/s (8192^3, f32 accumulation) and HBM copy GB/s
    (read+write of a 1 GiB stream). These are ACHIEVED ceilings on this
    chip through this runtime, not datasheet numbers -- the same
    completion-forcing read discipline as every phase."""
    on_cpu = jax.default_backend() == "cpu"
    n = 1024 if on_cpu else 8192  # smoke-test size on the 1-core host
    a = jnp.zeros((n, n), jnp.bfloat16)
    b = jnp.zeros((n, n), jnp.bfloat16)

    @jax.jit
    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    out = mm(a, b)
    float(jnp.max(out[0, :8]))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = mm(a, b)
        float(jnp.max(out[0, :8]))
        best = min(best, time.perf_counter() - t0)
    mxu_tflops = 2 * n**3 / best / 1e12

    m = 1 << 22 if on_cpu else 1 << 28  # 1 GiB f32 (16 MiB on cpu smoke)
    x = jnp.zeros((m,), jnp.float32)

    @jax.jit
    def cp(x):
        return x + 1.0

    out = cp(x)
    float(out[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = cp(x)
        float(out[0])
        best = min(best, time.perf_counter() - t0)
    hbm_gbps = 2 * 4 * m / best / 1e9  # read + write
    print(f"ceilings: MXU bf16 {mxu_tflops:.1f} TFLOP/s, "
          f"HBM copy {hbm_gbps:.1f} GB/s", flush=True)
    return {"mxu_bf16_tflops": mxu_tflops, "hbm_copy_gbps": hbm_gbps}


def cost_of(jitted, *args):
    """(flops, bytes_accessed) from XLA's own cost model for the optimized
    HLO of `jitted(*args)` -- the numerator of the roofline columns.
    Returns (None, None) when the backend can't report it."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(
            ca.get("bytes accessed", 0.0))
    except Exception as e:
        print(f"  (cost_analysis unavailable: {type(e).__name__})",
              flush=True)
        return None, None


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
    ap.add_argument("--encoder_only", action="store_true",
                    help="stop after encode_fwd_bwd (cheap A/Bs, e.g. "
                         "--prng sweeps over the dropout-heavy phases)")
    ap.add_argument("--kg_chunk", type=int, default=8)
    ap.add_argument("--label_chunk", type=int, default=64)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--platform_cpu", action="store_true")
    ap.add_argument("--json", type=str, default=None)
    ap.add_argument("--no_rooflines", action="store_true",
                    help="skip ceiling measurement + cost_analysis columns")
    ap.add_argument("--prng", type=str, default=None,
                    choices=["threefry2x32", "rbg", "unsafe_rbg"],
                    help="PRNG impl for dropout streams (rbg = the TPU's "
                         "native RngBitGenerator; threefry is the JAX "
                         "default and is pure vector-ALU work)")
    args = ap.parse_args()

    if args.prng:
        jax.config.update("jax_default_prng_impl", args.prng)

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
    costs = {}
    ceilings = None if args.no_rooflines else measure_ceilings()

    def phase(name, fn, *fn_args, reps=3):
        times[name] = timed(fn, *fn_args, reps=reps, label=name)
        if times[name] is not None and not args.no_rooflines:
            costs[name] = cost_of(fn, *fn_args)

    # -- KG -----------------------------------------------------------
    table_fn = jax.jit(trainer._kg_table_pure)
    phase("hgt_fwd", table_fn, params, kg)
    table = table_fn(params, kg)
    cot_tab = jnp.asarray(
        rng.randn(*table.shape).astype(np.float32))

    @jax.jit
    def hgt_fwd_bwd(p, kg, cot):
        return jax.grad(
            lambda pp: jnp.vdot(trainer._kg_table_pure(pp, kg), cot))(p)

    phase("hgt_fwd_bwd", hgt_fwd_bwd, params, kg, cot_tab)

    # -- per-modality encoders (train-mode, batch_stats discarded) ----
    @jax.jit
    def gin_fwd(p, bs, mols, rng):
        out, _ = model.apply(
            {"params": p, "batch_stats": bs}, mols,
            method=lambda m, mm: m.encoder.str_enc(mm, train=True),
            mutable=["batch_stats"], rngs={"dropout": rng})
        return out[0]

    phase("gin_fwd", gin_fwd, params, bstats, tb.head.mols, key)

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

    phase("chemcpa_fwd", chemcpa_fwd, params, bstats, genes, cov_idx, key)

    # -- token stack + fusion ----------------------------------------
    @jax.jit
    def tokens_fwd(p, bs, b, tab, rng):
        out, _ = model.apply(
            {"params": p, "batch_stats": bs}, b,
            method=lambda m, bb: m.encoder.modality_tokens(
                bb, kg_drug_table=tab, train=True),
            mutable=["batch_stats"], rngs={"dropout": rng})
        return out

    phase("tokens_fwd", tokens_fwd, params, bstats, tb.head, table, key)

    @jax.jit
    def encode_fwd(p, bs, b, tab, rng):
        out, _ = model.apply(
            {"params": p, "batch_stats": bs}, b,
            method=lambda m, bb: m.encoder.encode(
                bb, kg_drug_table=tab, train=True),
            mutable=["batch_stats"], rngs={"dropout": rng})
        return out

    phase("encode_fwd", encode_fwd, params, bstats, tb.head, table, key)
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

    phase("encode_fwd_bwd", encode_fwd_bwd, params, bstats,
          tb.head, table, key, cot_z)

    if args.encoder_only:
        for k, v in times.items():
            print(f"| {k} | {v * 1e3:.0f} |")
        return

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
    phase("dec_loss_fwd", dec_loss_fwd, *dargs)

    @jax.jit
    def dec_loss_fwd_bwd(p, z, b, w, cl):
        # grads wrt BOTH the decoder weights and the [N, d] embedding
        # table (the cotangent the encoder backward consumes)
        (_, (gp, gz)) = jax.value_and_grad(
            _dec_loss, argnums=(0, 1))(p, z, b, w, cl)
        return gz

    phase("dec_loss_fwd_bwd", dec_loss_fwd_bwd, *dargs)

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
    phase("loss_fwd", loss_fwd, *fargs)

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

    # Offload the optimizer state to host for the standalone fwd+bwd
    # phase: the non-donated program must hold params + grads +
    # activations, and AdamW's mu/nu (2x params) parked on device was
    # what OOM'd this phase in r3 (EPOCH_PROFILE.md footnote). Pulled
    # back right after for the optimizer phase.
    opt_host = jax.tree_util.tree_map(np.asarray, trainer.state.opt_state)
    trainer.state = dataclasses.replace(trainer.state, opt_state=None)
    jax.clear_caches()
    gc.collect()

    @jax.jit
    def loss_fwd_bwd(p, bs, b, kg, mh, mt, w, rng, cl):
        def f(pp):
            loss, _ = trainer._forward_loss(pp, bs, b, kg, mh, mt, w,
                                            rng, cl)
            return loss

        return jax.value_and_grad(f)(p)

    phase("loss_fwd_bwd", loss_fwd_bwd, *fargs)
    if times["loss_fwd_bwd"] is not None:
        _, grads = loss_fwd_bwd(*fargs)
        jax.clear_caches()
        gc.collect()
        opt_dev = jax.tree_util.tree_map(jnp.asarray, opt_host)

        @jax.jit
        def opt_update(g, o, p):
            return trainer.tx.update(g, o, p)

        phase("optimizer", opt_update, grads, opt_dev, params)
        del grads, opt_dev
    else:
        times["optimizer"] = None  # needs the grads pytree

    # -- report -------------------------------------------------------
    def _diff(*keys):
        vals = [times[k] for k in keys]
        if any(v is None for v in vals):
            return None
        return vals[0] - sum(vals[1:])

    def _cse_saving():
        parts = (times["hgt_fwd"], times["encode_fwd"],
                 times["encode_fwd"], times["dec_loss_fwd"])
        if times["loss_fwd"] is None or any(v is None for v in parts):
            return None
        return sum(parts) - times["loss_fwd"]

    derived = {
        "fusion_fwd (encode - tokens)": _diff("encode_fwd", "tokens_fwd"),
        "fusion_bwd_only (encode_fwd_bwd - encode_fwd)":
            _diff("encode_fwd_bwd", "encode_fwd"),
        "hgt_bwd_only": _diff("hgt_fwd_bwd", "hgt_fwd"),
        # loss_fwd interior: hgt table + TWO encodes (head/tail draw
        # different flax dropout keys, so they cannot fully CSE; the
        # mask-independent token compute does) + the chunked decoder.
        # Positive = what fusing into one program saved vs the parts.
        "loss_cse_saving (hgt + 2*encode + dec - loss_fwd)": _cse_saving(),
        "loss_bwd_only (loss_fwd_bwd - loss_fwd)":
            _diff("loss_fwd_bwd", "loss_fwd"),
        "host+dispatch (epoch - loss_fwd_bwd - optimizer)":
            _diff("epoch", "loss_fwd_bwd", "optimizer"),
    }
    ep = times["epoch"]
    print("\nNOTE: phases are standalone jitted programs; they need not "
          "sum to the epoch -- inside the fused loss XLA CSEs the "
          "mask-independent token compute of the head/tail encodes "
          "(identical masks in full_full) and schedules/remats "
          "differently.", flush=True)
    if ceilings:
        print(f"\nceilings (measured this chip/run): "
              f"MXU bf16 {ceilings['mxu_bf16_tflops']:.1f} TFLOP/s, "
              f"HBM copy {ceilings['hbm_copy_gbps']:.1f} GB/s",
              flush=True)
        print("\n| phase | ms | % of epoch | GFLOP | TFLOP/s | %MXU | GB "
              "| GB/s | %HBM | bound |", flush=True)
        print("|---|---|---|---|---|---|---|---|---|---|", flush=True)
    else:
        print("\n| phase | ms | % of epoch |", flush=True)
        print("|---|---|---|", flush=True)
    for k, v in {**times, **derived}.items():
        if v is None:
            print(f"| {k} | OOM (standalone; the donated step fits) "
                  f"| - |", flush=True)
            continue
        row = f"| {k} | {v * 1e3:.0f} | {100 * v / ep:.0f}% |"
        if ceilings:
            fl, by = costs.get(k, (None, None))
            if fl is not None:
                tfs = fl / v / 1e12
                gbs = by / v / 1e9
                pm = 100 * tfs / ceilings["mxu_bf16_tflops"]
                ph = 100 * gbs / ceilings["hbm_copy_gbps"]
                bound = ("MXU" if pm >= 50 else
                         "HBM" if ph >= 50 else
                         "neither (latency/gaps)")
                row += (f" {fl / 1e9:.0f} | {tfs:.1f} | {pm:.0f}% |"
                        f" {by / 1e9:.1f} | {gbs:.0f} | {ph:.0f}% |"
                        f" {bound} |")
            else:
                row += " - | - | - | - | - | - | (derived) |"
        print(row, flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"times_s": times, "derived_s": derived,
                       "ceilings": ceilings,
                       "xla_costs_flops_bytes": {
                           k: list(v) for k, v in costs.items()},
                       "config": {"fusion_chunk": args.fusion_chunk,
                                  "fusion_remat": not args.no_fusion_remat,
                                  "remat_forwards":
                                      not args.no_remat_forwards,
                                  "prng": args.prng or "threefry2x32",
                                  "n_drugs": n_drugs,
                                  "triples": args.triples // scale,
                                  "labels": args.labels}}, f, indent=1)
        print(f"wrote {args.json}", flush=True)


if __name__ == "__main__":
    main()
