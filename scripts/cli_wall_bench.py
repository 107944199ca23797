"""End-to-end CLI wall-clock at reference scale (VERDICT r3 item 2).

The headline epoch numbers (train_scale_bench / pretrain_scale_bench)
time jitted device steps in-process; this runs the REAL entry points --
`python -m madrigal_tpu.cli.train_ddi` / `cli.pretrain` -- end-to-end at
reference scale (--synthetic_scale: 6,843 drugs, 960 outcomes, the
8.3M-edge PrimeKG-scale KG) with the host in the loop: dataset build,
collation, per-epoch mask resampling, the CL prefetch pipeline,
checkpointing, and (optionally) the eval-sweep cadence.

Method: each config runs as a subprocess TWICE with different work
amounts; steady-state rate = d(work)/d(wall), which cancels the one-time
setup (dataset build + trainer init + compile; the compile cache under
/tmp/madrigal_jax_cache is shared across the pair, so the second run's
compile is a cache hit). Per-epoch wall deltas are also read from the
CLIs' *_metrics.jsonl `_time` stamps for the finetune runs.

Reference anchors: run_pretrain_twosides.sh:6,9-10 and
finetune_twosides_scale.sh:6 (the <=2-day / <=16-h single-GPU budgets);
data.py:1409-1501 (the collator work the device-step timings exclude).

Usage: python scripts/cli_wall_bench.py [--json out] [--skip ft,ft_eval,cl]
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
    args = ap.parse_args()
    skip = set(filter(None, args.skip.split(",")))
    results = {}
    tmp = tempfile.mkdtemp(prefix="cli_wall_")

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
