"""Headline benchmark: pair x outcome bilinear scoring throughput per chip.

The reference's north-star serving workload (BASELINE.md): score the full
drug x drug x outcome tensor (reference: madrigal/evaluate/predict.py:
419-429 chunked `model.decoder(z, z, label_range)` on one GPU). Here the
same symmetric-bilinear contraction runs as bf16 MXU matmuls with f32
accumulation, label-chunked to bound memory.

Baseline comparison: the identical computation in torch on CPU (the
reference's decoder math, float32) -- BASELINE.json targets >= 10x
PyTorch-CPU throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def pinned_baselines() -> dict:
    """Vetted best-ever CPU baseline rates (BASELINE_PINNED.json).

    The vs_baseline denominators are PINNED: the driver host's single core
    is load-contended, and a live re-measure made the r2->r3 ratio swing
    813.8->702.0 while the TPU rate moved only -1.6%. Live rates are still
    measured and reported alongside (``*_live`` keys) as a drift check.
    """
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_PINNED.json")
    with open(path) as f:
        return json.load(f)

N_DRUGS = 6843  # reference all-drugs scale (data.py:708)
N_PAD = 6912  # padded to the 128-wide MXU tile (scores sliced back)
FEAT = 128
L_TOTAL = 960  # outcome count scale (DrugBank-like, hundreds of outcomes)
L_CHUNK = 64  # 6.1 GB bf16 score blocks; per-call overhead amortizes
L_MEASURE = 256  # outcomes actually timed on TPU (rate extrapolates)
L_TORCH = 8  # outcomes timed on the torch-CPU baseline
L_RANK_MEASURE = 8  # outcomes timed for the rank-normalization pipeline


def _enable_compile_cache():
    from madrigal_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()  # per-backend subdir of /root/repo/.jax_cache


def tpu_rate() -> float:
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from madrigal_tpu.models.decoder import symmetrize
    from madrigal_tpu.ops.bilinear_pallas import bilinear_scores_pallas

    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randn(N_PAD, FEAT).astype(np.float32)).astype(
        jnp.bfloat16)
    w = jnp.asarray(rng.randn(L_CHUNK, FEAT, FEAT).astype(np.float32))
    w_sym = np.asarray(symmetrize(w)).astype(np.float32)
    w = jnp.asarray(w_sym).astype(jnp.bfloat16)

    @jax.jit
    def score_chunk(z, w):
        """Materializes the [L_CHUNK, N, N] bf16 score block in HBM -- the
        real serving workload (chunked score export; predict.py:419-429)
        via the label-blocked Pallas kernel (177 G scores/s vs 162 for the
        XLA einsum at these shapes, full coverage). A reduce-only variant lets XLA
        collapse the contraction through the 128x128 Gram matrix and
        reports fantasy numbers."""
        return bilinear_scores_pallas(z, z, w)

    # warmup / compile (including the completion-forcing read: the axon
    # backend's block_until_ready can return before execution finishes, so
    # timing must end with a device->host read)
    out = score_chunk(z, w)
    float(jnp.max(out[0, 0, :8]))
    n_chunks = L_MEASURE // L_CHUNK
    best = float("inf")
    for _ in range(2):  # best-of-2: tunnel dispatch jitter
        t0 = time.perf_counter()
        for _ in range(n_chunks):
            # reassignment refcount-frees the previous block asynchronously
            # (an explicit .delete() synchronizes through the tunnel and
            # serializes chunks; reassignment keeps the device pipeline full)
            out = score_chunk(z, w)
        float(jnp.max(out[0, 0, :8]))
        best = min(best, time.perf_counter() - t0)
    scores = n_chunks * L_CHUNK * N_DRUGS * N_DRUGS
    return scores / best


def torch_cpu_rate() -> float:
    import torch

    torch.manual_seed(0)
    z = torch.randn(N_DRUGS, FEAT)
    w = torch.randn(L_TORCH, FEAT, FEAT)
    w_sym = w.triu() + w.triu(1).transpose(-1, -2)

    def run():
        # reference BilinearDDIScorer.bilinear (models.py:537-539)
        return torch.matmul(torch.matmul(z, w_sym), z.T)

    run()  # warmup
    best = float("inf")
    for _ in range(3):  # best-of-3: the CPU baseline is load-sensitive
        t0 = time.perf_counter()
        out = run()
        float(out.sum())  # force materialization
        best = min(best, time.perf_counter() - t0)
    return L_TORCH * N_DRUGS * N_DRUGS / best


def rank_rate() -> float:
    """Outcomes/s for the FULL rank-normalization pipeline on device:
    score one outcome's [N, N] bilinear matrix + double-argsort rank +
    normalize + symmetrize (eval/ranks.normalized_ranks_for_outcomes) --
    the on-device replacement for the reference's 2-day/160 GB offline
    normalize_scores.py pipeline (README.md:43, run_normalize_scores.sh)."""
    import jax.numpy as jnp

    from madrigal_tpu.eval.ranks import normalized_ranks_for_outcomes
    from madrigal_tpu.models.decoder import symmetrize

    _enable_compile_cache()
    rng = np.random.RandomState(1)
    z = jnp.asarray(rng.randn(N_DRUGS, FEAT).astype(np.float32))
    w = symmetrize(
        jnp.asarray(rng.randn(L_RANK_MEASURE, FEAT, FEAT).astype(np.float32))
    )
    # stable=False: ~12% faster and tie-order-equivalent to the reference's
    # own unstable numpy quicksort (identical ranks for distinct scores)
    out = normalized_ranks_for_outcomes(z, w, stable=False)
    float(jnp.max(out[0, 0, :8]))  # compile + completion-forcing read
    best = float("inf")
    for _ in range(3):  # best-of-3: tunnel dispatch jitter
        t0 = time.perf_counter()
        out = normalized_ranks_for_outcomes(z, w, stable=False)
        float(jnp.max(out[0, 0, :8]))
        best = min(best, time.perf_counter() - t0)
    return L_RANK_MEASURE / best


def numpy_rank_rate() -> float:
    """Outcomes/s for the reference's offline CPU rank normalization
    (notebooks/normalize_scores.py:36-74 math, one outcome)."""
    rng = np.random.RandomState(1)
    s = rng.randn(N_DRUGS, N_DRUGS).astype(np.float32)
    n = N_DRUGS
    best = float("inf")
    for _ in range(3):  # best-of-3: load-sensitive
        t0 = time.perf_counter()
        iu = np.triu_indices(n, k=0)
        sc = s.astype(np.float64)
        sc[iu] = np.inf
        flat = sc.reshape(-1)
        rank = flat.argsort().argsort() + 1
        norm = (rank / (n * (n - 1) / 2)).reshape(n, n).astype(np.float32)
        norm[iu] = 0.0
        _ = norm + norm.T
        best = min(best, time.perf_counter() - t0)
    return 1.0 / best


def main(mode: str = "score"):
    pins = pinned_baselines()
    torch_pin = pins["torch_cpu_pair_scores_per_sec"]
    rank_pin = pins["numpy_rank_outcomes_per_sec"]
    if mode == "rank":
        rate = rank_rate()
        base_live = numpy_rank_rate()
        print(json.dumps({
            "metric": "rank_normalized_outcomes_per_sec_per_chip",
            "value": round(rate, 4),
            "unit": "outcomes/s",
            "vs_baseline": round(rate / rank_pin, 2),
            "vs_baseline_live": round(rate / base_live, 2),
            "full_960_outcome_tensor_seconds_per_chip": round(960 / rate, 1),
        }))
        return
    rate = tpu_rate()
    base_live = torch_cpu_rate()
    rrate = rank_rate()
    rbase_live = numpy_rank_rate()
    print(json.dumps({
        "metric": "pair_outcome_scores_per_sec_per_chip",
        "value": round(rate, 1),
        "unit": "scores/s",
        "vs_baseline": round(rate / torch_pin, 2),
        "vs_baseline_live": round(rate / base_live, 2),
        "torch_cpu_live_scores_per_sec": round(base_live, 1),
        "rank_normalized_outcomes_per_sec_per_chip": round(rrate, 4),
        "rank_vs_numpy_baseline": round(rrate / rank_pin, 2),
        "rank_vs_numpy_baseline_live": round(rrate / rbase_live, 2),
        "rank_full_960_outcome_tensor_seconds_per_chip":
            round(960 / rrate, 1),
    }))


if __name__ == "__main__":
    main("rank" if "--rank" in sys.argv else "score")
