"""End-to-end CLI wall-clock at reference scale (VERDICT r3 item 2).

The headline epoch numbers (train_scale_bench / pretrain_scale_bench)
time jitted device steps in-process; this runs the REAL entry points --
`python -m madrigal_tpu.cli.train_ddi` / `cli.pretrain` -- end-to-end at
reference scale (--synthetic_scale: 6,843 drugs, 960 outcomes, the
8.3M-edge PrimeKG-scale KG) with the host in the loop: dataset build,
collation, per-epoch mask resampling, the CL prefetch pipeline,
checkpointing, and (optionally) the eval-sweep cadence.

Method (--single, the production mode): ONE subprocess per config, and
steady state comes from the `_time` stamps the CLIs already write to
*_metrics.jsonl. train_ddi logs a train record after every epoch, so
consecutive-record deltas ARE the end-to-end per-epoch wall (host mask
resampling + device step + the eval sweep/checkpoint on eval-cadence
epochs); pretrain flushes its per-step records once per checkpoint
segment, so segment-boundary deltas / segment length give s/step
including the prefetch pipeline AND the periodic checkpoint save.
Compile handling: plain train_ddi epoch deltas are compile-free by
construction (the train-step compile lands before the epoch-0 record)
and only the FIRST EVAL delta absorbs the eval-program compile, so that
one is dropped; pretrain's segment 1 absorbs its compile before the
first boundary stamp. This costs one process setup per config (dataset
build + tunnel warmup) instead of two.

Method (default, pair mode): each config runs as a subprocess TWICE with
different work amounts; steady-state rate = d(work)/d(wall), which
cancels the one-time setup (dataset build + trainer init + compile; the
compile cache under /tmp/madrigal_jax_cache is shared across the pair,
so the second run's compile is a cache hit). Twice the process setups
of --single; kept for cross-checking the jsonl-delta numbers.

Reference anchors: run_pretrain_twosides.sh:6,9-10 and
finetune_twosides_scale.sh:6 (the <=2-day / <=16-h single-GPU budgets);
data.py:1409-1501 (the collator work the device-step timings exclude).

Usage:
  python scripts/cli_wall_bench.py --single [--json out] [--skip ft,cl]
  python scripts/cli_wall_bench.py [--json out] [--skip ft,ft_eval,cl]
  python scripts/cli_wall_bench.py --analyze_ft DIR --analyze_cl DIR \
      [--json out]   # re-analyze existing run dirs (no new runs)
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FLAGSHIP_SETS = [
    "--set", "model.encoder.feature_dim=128",
    "--set", "model.encoder.gin.hidden_dims=[128,128,128]",
    "--set", "model.encoder.gin.num_mlp_layer=3",
    "--set", "model.encoder.hgt.hidden_dim=128",
    "--set", "model.encoder.hgt.num_layers=2",
    "--set", "model.encoder.hgt.att_heads=4",
    "--set", "model.encoder.hgt.compute_dtype=bfloat16",
    "--set", "model.encoder.chemcpa.dim=128",
    "--set", "model.encoder.chemcpa.autoencoder_width=512",
    "--set", "model.encoder.chemcpa.autoencoder_depth=2",
    "--set", "model.encoder.chemcpa.use_drugs=False",
    "--set", "model.encoder.transformer.num_layers=2",
    "--set", "model.encoder.transformer.att_heads=8",
    "--set", "model.encoder.transformer.head_dim=256",
    "--set", "model.encoder.transformer.ffn_dim=1024",
    "--set", "model.encoder.transformer.norm_first=True",
    "--set", "model.encoder.transformer.num_tx_bottlenecks=2",
    "--set", "model.encoder.transformer.compute_dtype=bfloat16",
    "--set", "model.encoder.pos_emb_type=sinusoidal",
]
# PretrainConfig nests the encoder at 'encoder.' (no 'model.' prefix)
FLAGSHIP_SETS_CL = [
    a.replace("model.encoder.", "encoder.") for a in FLAGSHIP_SETS
] + [
    "--set", "encoder.fusion_batch_chunk=512",
    "--set", "encoder.transformer.remat=True",
    "--set", "encoder.hgt.remat_edge_types=False",
]


def _records(save_dir, run_name):
    path = os.path.join(save_dir, f"{run_name}_metrics.jsonl")
    with open(path) as f:
        return [json.loads(line) for line in f]


def _median(xs, what="deltas"):
    xs = sorted(xs)
    n = len(xs)
    if n == 0:
        # fail loudly BEFORE silently poisoning a multi-minute run's
        # analysis: e.g. eval_interval=1 makes every ft delta an eval
        # delta (empty `plain`), or a <2-segment pretrain run
        raise ValueError(
            f"no {what} to analyze -- run more epochs/steps or adjust "
            "the eval/checkpoint interval so non-degenerate deltas exist")
    return (xs[n // 2] if n % 2 else 0.5 * (xs[n // 2 - 1] + xs[n // 2]))


def analyze_ft(save_dir, eval_interval):
    """Steady-state per-epoch wall from a single train_ddi run's jsonl.

    train_ddi writes one train record after every epoch and runs the
    eval sweep + checkpoint AFTER the train record on eval-cadence
    epochs, so the delta from train record e to e+1 is train(e+1) plus
    (eval+ckpt)(e) iff e was an eval epoch. The first eval delta
    absorbs the eval-program compile and is dropped.
    """
    recs = _records(save_dir, "train_ddi")
    train = [r for r in recs if "train_total" in r]
    plain, with_eval = [], []
    for a, b in zip(train, train[1:]):
        e = a["_step"]
        d = b["_time"] - a["_time"]
        is_eval = eval_interval > 0 and e > 0 and e % eval_interval == 0
        (with_eval if is_eval else plain).append((e, d))
    steady = _median([d for _, d in plain], "plain epoch deltas")
    eval_deltas = [d for _, d in with_eval[1:]]  # [0] = eval compile
    out = {
        "epoch_deltas_s": [round(d, 3) for _, d in plain],
        "steady_s_per_epoch": steady,
        "projected_800_epoch_min": steady * 800 / 60,
        # quality trajectory (VERDICT r4 item 5): the reference's
        # acceptance signal is AUPRC (eval_utils.py:11-12,145) -- tie
        # the wall-clock run to loss falling / val AUPRC rising
        "train_loss_trajectory": [
            [r["_step"], round(r["train_total"], 4)] for r in train
        ],
        "val_auprc_trajectory": [
            [r["_step"], k, round(r[k], 4)]
            for r in recs for k in sorted(r)
            if k.endswith("_key_auprc")
        ],
    }
    if eval_deltas:
        ev = _median(eval_deltas)
        out.update({
            "eval_epoch_deltas_s": [round(d, 3) for _, d in with_eval],
            "steady_s_per_eval_epoch": ev,
            "eval_sweep_overhead_s": ev - steady,
            "projected_800_epoch_eval_every_4_min":
                (steady + (ev - steady) / eval_interval) * 800 / 60,
        })
    return out


def analyze_cl(save_dir, sc):
    """Steady-state per-step wall from a single pretrain run's jsonl.

    pretrain flushes each prefetch segment's per-step records at the
    checkpoint boundary, so all records in a segment share one stamp;
    boundary-to-boundary deltas / sc give s/step INCLUDING the periodic
    checkpoint save. Segment 1 absorbs the compile (before the first
    boundary stamp), so every delta is steady state.
    """
    recs = _records(save_dir, "pretrain")
    marks = [r["_time"] for r in recs
             if "cl_loss" in r and r["_step"] > 0 and r["_step"] % sc == 0]
    deltas = [(b - a) / sc for a, b in zip(marks, marks[1:])]
    steady = _median(deltas, "checkpoint-segment deltas")
    return {
        "segment_s_per_step": [round(d, 3) for d in deltas],
        "steady_s_per_step": steady,
        "projected_1500_epoch_hours": steady * 1500 * 9 / 3600,
        "cl_loss_trajectory": [
            [r["_step"], round(r["cl_loss"], 4)]
            for r in recs if "cl_loss" in r
        ],
    }


def ft_cmd(save_dir, epochs, eval_interval):
    return [
        sys.executable, "-m", "madrigal_tpu.cli.train_ddi",
        "--synthetic_scale", "--finetune_mode", "full_full",
        "--num_epochs", str(epochs), "--warmup_epochs", "2",
        "--evaluate_interval", str(eval_interval),
        "--label_chunk", "64", "--fusion_chunk", "512", "--fusion_remat",
        "--no_hgt_remat", "--save_dir", save_dir,
    ] + FLAGSHIP_SETS


def cl_cmd(save_dir, steps):
    return [
        sys.executable, "-m", "madrigal_tpu.cli.pretrain",
        "--synthetic_scale", "--pretrain_mode", "str_center_uni",
        "--pretrain_unbalanced", "--raw_encoder_output",
        "--num_steps", str(steps), "--batch_size", "768",
        "--save_checkpoints", "0", "--save_dir", save_dir,
    ] + FLAGSHIP_SETS_CL


def run(cmd, label):
    print(f"[{label}] {' '.join(cmd[2:6])} ...", flush=True)
    t0 = time.perf_counter()
    r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    wall = time.perf_counter() - t0
    if r.returncode != 0:
        print(r.stdout[-2000:])
        print(r.stderr[-4000:])
        raise RuntimeError(f"{label} failed rc={r.returncode}")
    print(f"[{label}] wall {wall:.0f} s", flush=True)
    return wall


def epoch_times(save_dir, run_name="train_ddi"):
    """Per-record _time stamps from the CLI's metric jsonl."""
    path = os.path.join(save_dir, f"{run_name}_metrics.jsonl")
    out = []
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if "train_total" in rec or "cl_loss" in rec:
                out.append(rec["_time"])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", type=str, default=None)
    ap.add_argument("--skip", type=str, default="")
    ap.add_argument("--ft_epochs", type=int, nargs=2, default=(4, 24))
    ap.add_argument("--cl_steps", type=int, nargs=2, default=(10, 40))
    ap.add_argument("--single", action="store_true",
                    help="one process per config; steady state from the "
                         "metrics-jsonl _time deltas (see module doc)")
    ap.add_argument("--analyze_ft", type=str, default=None,
                    help="existing train_ddi save_dir to analyze "
                         "(assumes --evaluate_interval 4)")
    ap.add_argument("--analyze_cl", type=str, default=None,
                    help="existing pretrain save_dir to analyze "
                         "(assumes --save_checkpoints 10)")
    args = ap.parse_args()
    skip = set(filter(None, args.skip.split(",")))
    results = {}
    tmp = tempfile.mkdtemp(prefix="cli_wall_")

    if args.analyze_ft or args.analyze_cl:
        if args.analyze_ft:
            results["finetune_single"] = analyze_ft(args.analyze_ft, 4)
        if args.analyze_cl:
            results["cl_pretrain_single"] = analyze_cl(args.analyze_cl, 10)
        print(json.dumps(results, indent=1))
        if args.json:
            with open(args.json, "w") as f:
                json.dump(results, f, indent=1)
        return

    if args.single:
        if "ft" not in skip:
            d = os.path.join(tmp, "ft_single")
            run(ft_cmd(d, 14, 4), "ft single 14ep/eval4")
            results["finetune_single"] = analyze_ft(d, 4)
            r = results["finetune_single"]
            print(f"finetune end-to-end: {r['steady_s_per_epoch']:.2f} "
                  f"s/epoch (train), "
                  f"{r.get('steady_s_per_eval_epoch', float('nan')):.2f} "
                  f"s on eval-cadence epochs -> 800 epochs ~= "
                  f"{r['projected_800_epoch_min']:.0f} min", flush=True)
        if "cl" not in skip:
            d = os.path.join(tmp, "cl_single")
            cmd = cl_cmd(d, 41)
            cmd[cmd.index("--save_checkpoints") + 1] = "10"
            run(cmd, "cl single 41st/ckpt10")
            results["cl_pretrain_single"] = analyze_cl(d, 10)
            r = results["cl_pretrain_single"]
            print(f"cl pretrain end-to-end: {r['steady_s_per_step']:.2f} "
                  f"s/step (prefetch + periodic ckpt) -> 1500-epoch "
                  f"pretrain ~= {r['projected_1500_epoch_hours']:.1f} h",
                  flush=True)
        if args.json:
            with open(args.json, "w") as f:
                json.dump(results, f, indent=1)
            print(f"wrote {args.json}", flush=True)
        return

    if "ft" not in skip:
        e0, e1 = args.ft_epochs
        w0 = run(ft_cmd(os.path.join(tmp, "ft0"), e0, 0), f"ft {e0}ep")
        w1 = run(ft_cmd(os.path.join(tmp, "ft1"), e1, 0), f"ft {e1}ep")
        sec_per_epoch = (w1 - w0) / (e1 - e0)
        ts = epoch_times(os.path.join(tmp, "ft1"))
        per_epoch = [b - a for a, b in zip(ts, ts[1:])]
        results["finetune_no_eval"] = {
            "walls_s": [w0, w1], "epochs": [e0, e1],
            "steady_s_per_epoch": sec_per_epoch,
            "jsonl_epoch_deltas_s": per_epoch,
            "projected_800_epoch_min": sec_per_epoch * 800 / 60,
        }
        print(f"finetune steady state: {sec_per_epoch:.2f} s/epoch "
              f"end-to-end -> 800 epochs ~= "
              f"{sec_per_epoch * 800 / 60:.0f} min", flush=True)

    if "ft_eval" not in skip:
        e0, e1 = args.ft_epochs
        w0 = run(ft_cmd(os.path.join(tmp, "fte0"), e0, 2),
                 f"ft+eval {e0}ep")
        w1 = run(ft_cmd(os.path.join(tmp, "fte1"), e1, 2),
                 f"ft+eval {e1}ep")
        # evals at epochs 2,4,... -> (e1-e0)/2 extra sweeps in the pair
        sec_per_epoch = (w1 - w0) / (e1 - e0)
        results["finetune_eval_every_2"] = {
            "walls_s": [w0, w1], "epochs": [e0, e1],
            "steady_s_per_epoch_incl_eval": sec_per_epoch,
        }
        print(f"finetune + eval-every-2: {sec_per_epoch:.2f} s/epoch "
              "(incl. the val sweep share)", flush=True)

    if "cl" not in skip:
        s0, s1 = args.cl_steps
        w0 = run(cl_cmd(os.path.join(tmp, "cl0"), s0), f"cl {s0}st")
        w1 = run(cl_cmd(os.path.join(tmp, "cl1"), s1), f"cl {s1}st")
        sec_per_step = (w1 - w0) / (s1 - s0)
        # 1500 epochs x 9 steps/epoch at N=6843, bs 768
        results["cl_pretrain"] = {
            "walls_s": [w0, w1], "steps": [s0, s1],
            "steady_s_per_step": sec_per_step,
            "projected_1500_epoch_hours": sec_per_step * 1500 * 9 / 3600,
        }
        print(f"cl pretrain steady state: {sec_per_step:.2f} s/step "
              f"end-to-end (prefetch on) -> 1500-epoch pretrain ~= "
              f"{sec_per_step * 1500 * 9 / 3600:.1f} h", flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {args.json}", flush=True)


if __name__ == "__main__":
    main()
