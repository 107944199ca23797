"""Micro-benchmark: rank-normalization kernel variants on the real chip.

Variants of the per-outcome [N, N] double-argsort (eval/ranks.py):
  A. current: jnp.argsort twice (stable)
  B. lax.sort unstable, explicit iota payloads (first sort f32 keys,
     second sort int32 keys) -- ranks identical for distinct scores
  C. B but second inversion via one sort with (order, iota) payload

A Pallas radix/histogram rank (the r3-verdict stretch) is a measured
REJECTION, not an unexplored branch: its final pass must place each of
the ~24.4M packed elements at a data-dependent address, and this chip's
width-1 gather/scatter row rate (~80M rows/s, scripts/segment_bench.py)
prices that single pass at >= 305 ms -- 2.3x the whole shipped tri-tile
kernel (130.3 ms/outcome). The `scatter` variant below IS that
structure measured end-to-end (one sort + one permutation-scatter
placement: 552 ms). See eval/ranks.py normalized_rank_matrix docstring
for the full argument.

Usage: python scripts/rank_variants_bench.py
"""
import os
import sys
import time

import numpy as np

import jax

if "--platform_cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from madrigal_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax.numpy as jnp
from jax import lax

N = 6843
REPS = 3


def lower_tri_vals(scores):
    n = scores.shape[0]
    rows = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    tril = rows > cols
    return tril, jnp.where(tril, scores, jnp.inf).reshape(-1)


@jax.jit
def variant_a(scores):
    n = scores.shape[0]
    m = n * (n - 1) // 2
    tril, vals = lower_tri_vals(scores)
    order = jnp.argsort(vals)
    ranks = jnp.argsort(order).astype(jnp.float32) + 1.0
    out = jnp.where(tril, ranks.reshape(n, n) / m, 0.0)
    return out + out.T


@jax.jit
def variant_b(scores):
    n = scores.shape[0]
    m = n * (n - 1) // 2
    tril, vals = lower_tri_vals(scores)
    iota = lax.iota(jnp.int32, vals.shape[0])
    _, order = lax.sort((vals, iota), is_stable=False, num_keys=1)
    _, inv = lax.sort((order, iota), is_stable=False, num_keys=1)
    ranks = inv.astype(jnp.float32) + 1.0
    out = jnp.where(tril, ranks.reshape(n, n) / m, 0.0)
    return out + out.T


@jax.jit
def variant_c(scores):
    # one combined sort carrying both payloads through the first pass
    n = scores.shape[0]
    m = n * (n - 1) // 2
    tril, vals = lower_tri_vals(scores)
    iota = lax.iota(jnp.int32, vals.shape[0])
    _, order = lax.sort((vals, iota), is_stable=False, num_keys=1)
    # invert: scatter-free via sort of (order, iota)
    _, inv = lax.sort((order, iota), is_stable=True, num_keys=1)
    ranks = inv.astype(jnp.float32) + 1.0
    out = jnp.where(tril, ranks.reshape(n, n) / m, 0.0)
    return out + out.T


def _f32_to_sortable_u32(x):
    """Monotone bijection f32 -> u32 (IEEE total order for finite + inf):
    flip all bits of negatives, flip the sign bit of non-negatives."""
    u = lax.bitcast_convert_type(x, jnp.uint32)
    neg = u >> 31 == 1
    return jnp.where(neg, ~u, u | jnp.uint32(0x80000000))


@jax.jit
def variant_d_u32(scores):
    # u32-key sorts: integer compare, same ranks as f32 for distinct scores
    n = scores.shape[0]
    m = n * (n - 1) // 2
    tril, vals = lower_tri_vals(scores)
    keys = _f32_to_sortable_u32(vals)
    iota = lax.iota(jnp.int32, vals.shape[0])
    _, order = lax.sort((keys, iota), is_stable=False, num_keys=1)
    _, inv = lax.sort((order, iota), is_stable=False, num_keys=1)
    ranks = inv.astype(jnp.float32) + 1.0
    out = jnp.where(tril, ranks.reshape(n, n) / m, 0.0)
    return out + out.T


@jax.jit
def variant_f_searchsorted(scores):
    # ONE value-only sort + binary-search gathers instead of two
    # key+payload sorts: rank(v) = #(elements < v) + 1. Tie semantics:
    # min-rank (competition ranking) instead of arbitrary positional --
    # identical for distinct scores; the inf-padded upper triangle ties
    # are masked out either way.
    n = scores.shape[0]
    m = n * (n - 1) // 2
    tril, vals = lower_tri_vals(scores)
    svals = lax.sort(vals, is_stable=False)
    ranks = jnp.searchsorted(
        svals, vals, side="left", method="scan_unrolled"
    ).astype(jnp.float32) + 1.0
    out = jnp.where(tril, ranks.reshape(n, n) / m, 0.0)
    return out + out.T


@jax.jit
def variant_g_searchsorted_u32(scores):
    # f variant with u32 keys (integer compares in both sort and search)
    n = scores.shape[0]
    m = n * (n - 1) // 2
    tril, vals = lower_tri_vals(scores)
    keys = _f32_to_sortable_u32(vals)
    skeys = lax.sort(keys, is_stable=False)
    ranks = jnp.searchsorted(
        skeys, keys, side="left", method="scan_unrolled"
    ).astype(jnp.float32) + 1.0
    out = jnp.where(tril, ranks.reshape(n, n) / m, 0.0)
    return out + out.T


@jax.jit
def variant_h_scatter_unique(scores):
    # one key+payload sort, then invert the permutation with a scatter
    # declared unique + in-bounds (round-2 measured the GENERIC scatter
    # at 614 ms total; the unique/in-bounds promise may unlock a faster
    # XLA lowering)
    n = scores.shape[0]
    m = n * (n - 1) // 2
    tril, vals = lower_tri_vals(scores)
    keys = _f32_to_sortable_u32(vals)
    iota = lax.iota(jnp.int32, vals.shape[0])
    _, order = lax.sort((keys, iota), is_stable=False, num_keys=1)
    inv = jnp.zeros_like(iota).at[order].set(
        iota, unique_indices=True, mode="promise_in_bounds")
    ranks = inv.astype(jnp.float32) + 1.0
    out = jnp.where(tril, ranks.reshape(n, n) / m, 0.0)
    return out + out.T


def _tri_row_of(k):
    """Row index i of the k-th strict-lower-triangle element (row-major
    enumeration: (1,0),(2,0),(2,1),(3,0)...). i = max i s.t. i(i-1)/2 <= k,
    via f32 sqrt + exact int32 correction (f32 can't hold k>2^24 exactly;
    the +-2 correction window absorbs that)."""
    kf = k.astype(jnp.float32)
    i = ((1.0 + jnp.sqrt(1.0 + 8.0 * kf)) * 0.5).astype(jnp.int32)
    for _ in range(2):
        tri = i * (i - 1) // 2
        i = jnp.where(tri > k, i - 1, i)
        tri_up = (i + 1) * i // 2
        i = jnp.where(tri_up <= k, i + 1, i)
    return i


@jax.jit
def variant_i_compact(scores):
    # sort ONLY the m = n(n-1)/2 strict-lower-triangle entries (the
    # current kernel sorts all n^2 with the upper triangle inf-padded):
    # compaction and expansion are analytic gathers (no scatters, no big
    # index constants), each sort shrinks 2x.
    n = scores.shape[0]
    m = n * (n - 1) // 2
    k = lax.iota(jnp.int32, m)
    i = _tri_row_of(k)
    j = k - i * (i - 1) // 2
    vals = scores.reshape(-1)[i * n + j]  # [m]
    keys = _f32_to_sortable_u32(vals)
    iota = lax.iota(jnp.int32, m)
    _, order = lax.sort((keys, iota), is_stable=False, num_keys=1)
    _, inv = lax.sort((order, iota), is_stable=False, num_keys=1)
    ranks = jnp.concatenate(
        [inv.astype(jnp.float32) + 1.0, jnp.zeros((1,), jnp.float32)])
    rows = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    tril = rows > cols
    back = jnp.where(tril, rows * (rows - 1) // 2 + cols, m)
    out = ranks[back.reshape(-1)].reshape(n, n) / m
    return out + out.T


@jax.jit
def probe_compact_gathers_only(scores):
    # decomposition probe: the two analytic gathers of variant_i without
    # the sorts (their overhead vs the saved half-size sorts)
    n = scores.shape[0]
    m = n * (n - 1) // 2
    k = lax.iota(jnp.int32, m)
    i = _tri_row_of(k)
    j = k - i * (i - 1) // 2
    vals = scores.reshape(-1)[i * n + j]
    padded = jnp.concatenate([vals, jnp.zeros((1,), jnp.float32)])
    rows = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    tril = rows > cols
    back = jnp.where(tril, rows * (rows - 1) // 2 + cols, m)
    return padded[back.reshape(-1)].reshape(n, n)


@jax.jit
def probe_sort_compact_only(scores):
    # decomposition probe: one (u32, i32) sort at compacted size m
    n = scores.shape[0]
    m = n * (n - 1) // 2
    k = lax.iota(jnp.int32, m)
    i = _tri_row_of(k)
    j = k - i * (i - 1) // 2
    vals = scores.reshape(-1)[i * n + j]
    keys = _f32_to_sortable_u32(vals)
    iota = lax.iota(jnp.int32, m)
    return lax.sort((keys, iota), is_stable=False, num_keys=1)[1]


@jax.jit
def sort_values_only(scores):
    # decomposition probe: a payload-free u32 sort (lower bound for any
    # sort-based scheme's first pass)
    _, vals = lower_tri_vals(scores)
    return lax.sort(_f32_to_sortable_u32(vals), is_stable=False)


@jax.jit
def sort_key_payload_only(scores):
    # decomposition probe: one (u32 key, i32 payload) sort
    _, vals = lower_tri_vals(scores)
    keys = _f32_to_sortable_u32(vals)
    iota = lax.iota(jnp.int32, vals.shape[0])
    return lax.sort((keys, iota), is_stable=False, num_keys=1)[1]


@jax.jit
def variant_j_tri_tiles(scores):
    # round-4: the shipped compact path (eval/ranks.py _pack_tri_tiles) --
    # STATIC 128x128 tile selection keeps 52% of n^2, so both sorts skip
    # ~23.4M +inf sentinels. Unlike variant_i (per-element compaction,
    # 982 ms: width-1 gathers), tile pack/unpack is contiguous-row
    # gather/scatter with static indices.
    from madrigal_tpu.eval.ranks import normalized_rank_matrix

    return normalized_rank_matrix(scores, stable=False, compact=True)


@jax.jit
def probe_tri_tile_pack_only(scores):
    # decomposition probe: pad + tile pack + unpack round-trip without
    # the sorts
    from madrigal_tpu.eval.ranks import (
        _pack_tri_tiles,
        _unpack_tri_tiles,
        lower_tri_mask,
    )

    n = scores.shape[0]
    masked = jnp.where(lower_tri_mask(n), scores, jnp.inf)
    flat, idx, T = _pack_tri_tiles(masked)
    return _unpack_tri_tiles(flat, idx, T, n)


def make_batched(k, u32=False):
    @jax.jit
    def variant_batched(scores_k):  # [K, N, N]
        n = scores_k.shape[1]
        m = n * (n - 1) // 2
        rows = lax.broadcasted_iota(jnp.int32, (n, n), 0)
        cols = lax.broadcasted_iota(jnp.int32, (n, n), 1)
        tril = rows > cols
        vals = jnp.where(tril[None], scores_k, jnp.inf).reshape(k, -1)
        keys = _f32_to_sortable_u32(vals) if u32 else vals
        iota = jnp.broadcast_to(
            lax.iota(jnp.int32, vals.shape[1])[None], vals.shape
        )
        _, order = lax.sort((keys, iota), dimension=1, is_stable=False,
                            num_keys=1)
        _, inv = lax.sort((order, iota), dimension=1, is_stable=False,
                          num_keys=1)
        ranks = inv.astype(jnp.float32) + 1.0
        out = jnp.where(tril[None], ranks.reshape(k, n, n) / m, 0.0)
        return out + out.transpose(0, 2, 1)

    return variant_batched


def timeit(fn, x):
    out = fn(x)
    float(jnp.max(out.reshape(-1)[:8]))  # compile + completion read
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(x)
    float(jnp.max(out.reshape(-1)[:8]))
    return (time.perf_counter() - t0) / REPS


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N, N).astype(np.float32))

    # correctness cross-check on a small case. Distinct values only:
    # 256^2 = 65536 < 2^24 f32-representable integers, permuted -- with
    # random floats ~0.02% of entries tie in f32 and stable/unstable/
    # min-rank variants legitimately order ties differently.
    xs = jnp.asarray(
        rng.permutation(256 * 256).astype(np.float32).reshape(256, 256)
        - 32768.0)
    a = np.asarray(variant_a(xs))
    for name, fn in (("b", variant_b), ("c", variant_c),
                     ("d_u32", variant_d_u32)):
        np.testing.assert_allclose(np.asarray(fn(xs)), a, atol=1e-6,
                                   err_msg=name)
    bfn = make_batched(2)
    np.testing.assert_allclose(
        np.asarray(bfn(jnp.stack([xs, xs * 2.0]))),
        np.stack([a, np.asarray(variant_a(xs * 2.0))]), atol=1e-6,
    )
    print("variants agree on 256x256")

    # searchsorted variants: identical ranks whenever scores are distinct
    # (min-rank on ties, vs the double-argsort's arbitrary positional tie
    # order)
    for name, fn in (("f", variant_f_searchsorted),
                     ("g", variant_g_searchsorted_u32),
                     ("h", variant_h_scatter_unique),
                     ("i", variant_i_compact),
                     ("j", variant_j_tri_tiles)):
        np.testing.assert_allclose(np.asarray(fn(xs)), a, atol=1e-6,
                                   err_msg=name)
    # the analytic row-index inversion must be exact at FULL scale (f32
    # sqrt rounding is corrected in int32; verify against numpy)
    mfull = N * (N - 1) // 2
    kk = np.arange(mfull, dtype=np.int64)
    i_np = np.floor((1.0 + np.sqrt(1.0 + 8.0 * kk.astype(np.float64)))
                    / 2.0).astype(np.int64)
    i_dev = np.asarray(
        jax.jit(_tri_row_of)(jnp.arange(mfull, dtype=jnp.int32)))
    np.testing.assert_array_equal(i_dev.astype(np.int64), i_np)
    print("tri-row inversion exact at full scale")

    if "--check_only" in sys.argv:
        print("correctness checks passed; skipping timing")
        return

    slow = () if "--include_searchsorted" in sys.argv else (
        "f_searchsorted", "g_searchsorted_u32")
    for name, fn in (("a_stable_argsort", variant_a),
                     ("b_unstable_laxsort", variant_b),
                     ("c_mixed", variant_c),
                     ("d_u32_keys", variant_d_u32),
                     ("f_searchsorted", variant_f_searchsorted),
                     ("g_searchsorted_u32", variant_g_searchsorted_u32),
                     ("h_scatter_unique", variant_h_scatter_unique),
                     ("i_compact_halfsort", variant_i_compact),
                     ("j_tri_tiles", variant_j_tri_tiles),
                     ("probe_tri_tile_pack", probe_tri_tile_pack_only),
                     ("probe_sort_values_only", sort_values_only),
                     ("probe_sort_key_payload", sort_key_payload_only),
                     ("probe_compact_gathers", probe_compact_gathers_only),
                     ("probe_sort_compact", probe_sort_compact_only)):
        if name in slow:
            print(f"{name}: skipped (measured 70x slower in r2; "
                  "--include_searchsorted to re-measure)")
            continue
        dt = timeit(fn, x)
        print(f"{name}: {dt * 1e3:.1f} ms/outcome")

    for k in (2, 4):
        for u32 in (False, True):
            fn = make_batched(k, u32=u32)
            xk = jnp.asarray(rng.randn(k, N, N).astype(np.float32))
            dt = timeit(fn, xk)
            print(f"e_batched_k{k}{'_u32' if u32 else ''}: "
                  f"{dt * 1e3 / k:.1f} ms/outcome")


if __name__ == "__main__":
    main()
