"""All-pairs normalized-rank computation, on device.

TPU-native replacement for the reference's offline 80 GB memmap pipeline
(reference: notebooks/normalize_scores.py:36-90): per outcome, the NxN score
matrix's strict lower triangle is ranked (double-argsort semantics -> rank
via one key+payload sort and a scatter), normalized by N(N-1)/2, zeroed on
the upper triangle + diagonal, and symmetrized by adding the transpose.

Equivalence note: numpy's double argsort assigns arbitrary tie order
(unstable quicksort). `stable=True` (default) gives deterministic
ascending-position tie ranks; `stable=False` is ~12% faster and matches
the reference's arbitrary tie order. For distinct float scores the
outputs are identical either way.

The multi-chip strategy (parallel/allpairs.py) shards the OUTCOME axis:
each outcome's rank job is independent, so the fleet is communication-free
after a single replicated-Z broadcast -- no cross-chip sort merge needed
(SURVEY.md section 2.2 north star).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def lower_tri_mask(n: int) -> jnp.ndarray:
    """Strict lower-triangle mask [n, n] (True below the diagonal)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return rows > cols


def _f32_to_sortable_u32(x: jnp.ndarray) -> jnp.ndarray:
    """Monotone bijection f32 -> u32 (IEEE total order over finite + inf):
    flip all bits of negatives, set the sign bit of non-negatives.
    Integer-key sorts run ~7% faster than f32-key sorts on TPU
    (scripts/rank_variants_bench.py: 276 vs 296 ms/outcome at N=6843)."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    neg = (u >> 31) == 1
    return jnp.where(neg, ~u, u | jnp.uint32(0x80000000))


def _pack_tri_tiles(x: jnp.ndarray, tile: int = 128):
    """[n, n] -> flat [K*tile*tile] keeping only the (tile x tile) blocks
    that intersect the lower triangle (block (I, J) kept iff J <= I).

    The round-3 per-ELEMENT lower-tri compaction lost (982 ms/outcome:
    width-1 gathers run at ~80M rows/s) -- but tile selection is STATIC,
    so this is one contiguous-row gather of K = T(T+1)/2 blocks at byte
    rate, and the subsequent sorts see 52% of n^2 elements instead of
    sorting ~23.4M +inf sentinels. Dropped (upper) tiles and the padded
    tail are never materialized; within-kept-tile upper entries must
    already be +inf in `x` (the caller's tril mask handles it).
    """
    n = x.shape[0]
    T = -(-n // tile)
    npad = T * tile - n
    if npad:
        x = jnp.pad(x, ((0, npad), (0, npad)),
                    constant_values=jnp.array(jnp.inf, x.dtype))
    tiles = x.reshape(T, tile, T, tile).transpose(0, 2, 1, 3)
    idx = np.asarray(
        [i * T + j for i in range(T) for j in range(i + 1)], np.int32
    )
    packed = tiles.reshape(T * T, tile, tile)[jnp.asarray(idx)]
    return packed.reshape(-1), idx, T


def _unpack_tri_tiles(flat: jnp.ndarray, idx: np.ndarray, T: int, n: int,
                      tile: int = 128) -> jnp.ndarray:
    """Inverse of _pack_tri_tiles (static-index tile scatter); dropped
    tiles come back as zeros, which the caller's tril mask overwrites."""
    K = idx.shape[0]
    tiles = jnp.zeros((T * T, tile, tile), flat.dtype)
    tiles = tiles.at[jnp.asarray(idx)].set(flat.reshape(K, tile, tile))
    full = tiles.reshape(T, T, tile, tile).transpose(0, 2, 1, 3)
    return full.reshape(T * tile, T * tile)[:n, :n]


def normalized_rank_matrix(scores: jnp.ndarray,
                           stable: bool = True,
                           compact: Optional[bool] = None) -> jnp.ndarray:
    """Rank-normalize one outcome's [N, N] score matrix.

    Returns the symmetrized normalized-rank matrix: entry (i, j), i != j,
    holds rank(score[max(i,j), min(i,j)]) / (N(N-1)/2); diagonal is 0.

    Uses the double-sort formulation (the reference's exact formula,
    normalize_scores.py:46). Every "avoid the second sort" alternative
    has been measured SLOWER on a v5e chip at N=6843
    (scripts/rank_variants_bench.py, round-3 sweep; double sort u32 =
    276 ms/outcome):
      * key+payload sort + permutation scatter: 614 ms generic, still
        552 ms with unique_indices + promise_in_bounds;
      * searchsorted of the sorted keys: ~70x slower (XLA lowers the
        binary search to a serial scan);
      * strict-lower-triangle compaction (sort m = n(n-1)/2 instead of
        n^2, analytic index gathers both ways): 982 ms -- the
        single-element gathers alone cost 882 ms (TPU gathers are
        ROW-rate-bound, ~80M rows/s at width 1);
      * batching outcomes into one dimension-1 sort: 529-986 ms/outcome.
    Decomposition probes pin the floor: one u32 values-only sort is
    91.5 ms, one (u32 key, i32 payload) sort 143 ms -- so any
    two-key+payload-sort scheme over the FULL n^2 pays ~286 ms. The
    round-4 tri-tile compaction (`compact=True`) beats that wall from
    the side: it shrinks the sort DOMAIN to 52% of n^2 (130.3
    ms/outcome), not the sort itself. The lever for the full tensor is
    the label axis (parallel/allpairs.py), not the per-outcome kernel.

    A Pallas radix/histogram rank (per-block bucket histograms in VMEM +
    prefix sum, no lax.sort) was evaluated and REJECTED on measured
    rates rather than implemented: exact ranking is a permutation, so
    any radix scheme's final pass must place each of the ~24.4M packed
    elements at a data-dependent address -- either a scatter of rank to
    original position or a per-element gather of base[bucket(key)].
    Both run at this chip's width-1 row rate, ~80M rows/s
    (scripts/segment_bench.py; the same wall behind the 982 ms
    per-element compaction and the 552 ms scatter-invert variant, which
    IS one sort + exactly such a placement pass): >= 305 ms for the
    placement alone, 2.3x the entire shipped kernel before any
    histogram work. Histogram builds fare no better: bucket counting
    without scatter needs one-hot compares (M x B VPU ops -- ~1 s at
    B=65536), and B <= 256 leaves ~95k-element bins whose interior
    ranking recurses into the same data-dependent partition. Radix
    ranking is scatter-rate-bound on TPU; the sort-domain shrink is the
    winning family here (static tile moves at byte rate).

    stable=True gives deterministic ascending-position tie ranks;
    stable=False is faster (276 vs 334 ms/outcome at N=6843: unstable
    sort + u32 sort keys via the monotone IEEE bijection) and matches the
    reference's OWN tie behavior (numpy's default argsort is unstable
    quicksort, i.e. arbitrary tie order). Outputs are identical for
    distinct scores.

    compact (default: on exactly when stable=False) routes both sorts
    through the static tri-tile packing (_pack_tri_tiles): the flat
    formulation above sorts ~23.4M +inf upper-triangle sentinels along
    with the 23.4M real keys, so halving the sort domain beats the
    "two-sort wall" the r3 variant sweep established for the FULL-n^2
    decomposition (round-4 measurement in rank_variants_bench). Under
    ties, compact changes which equal element gets which rank (packed
    order, not row-major order) -- arbitrary-but-different, which is why
    stable=True keeps the flat layout unless compact is forced.
    """
    n = scores.shape[0]
    m = n * (n - 1) // 2
    tril = lower_tri_mask(n)
    masked = jnp.where(tril, scores, jnp.inf)
    if compact is None:
        compact = not stable
    if compact:
        vals, idx, T = _pack_tri_tiles(masked)
    else:
        vals = masked.reshape(-1)
    iota = jax.lax.iota(jnp.int32, vals.shape[0])
    keys = (_f32_to_sortable_u32(vals)
            if not stable and vals.dtype == jnp.float32 else vals)
    _, order = jax.lax.sort((keys, iota), is_stable=stable, num_keys=1)
    _, inv = jax.lax.sort((order, iota), is_stable=stable, num_keys=1)
    ranks = inv.astype(jnp.float32) + 1.0
    rmat = (_unpack_tri_tiles(ranks, idx, T, n) if compact
            else ranks.reshape(n, n))
    out = jnp.where(tril, rmat / m, 0.0)
    return out + out.T


def score_outcome(z: jnp.ndarray, w_sym_l: jnp.ndarray,
                  dtype=jnp.float32) -> jnp.ndarray:
    """[N, N] bilinear scores for one outcome: z @ W_l @ z.T.

    Two MXU matmuls; compute dtype selectable (bf16 inputs keep the MXU at
    full rate; accumulation stays f32 via preferred_element_type).
    """
    zc = z.astype(dtype)
    zw = jnp.dot(zc, w_sym_l.astype(dtype),
                 preferred_element_type=jnp.float32)
    return jnp.dot(zw.astype(dtype), zc.T,
                   preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("compute_dtype", "stable"))
def normalized_ranks_for_outcomes(
    z: jnp.ndarray, w_sym: jnp.ndarray, compute_dtype=jnp.float32,
    stable: bool = True,
) -> jnp.ndarray:
    """[Lc, N, N] normalized ranks for a chunk of outcomes (scan over the
    chunk to bound peak memory at one [N, N] score matrix + rank buffers)."""

    def body(_, w_l):
        s = score_outcome(z, w_l, compute_dtype)
        return None, normalized_rank_matrix(s, stable=stable)

    _, out = jax.lax.scan(body, None, w_sym)
    return out


def rank_tensor(
    z: np.ndarray,
    w_sym: np.ndarray,
    chunk: int = 8,
    compute_dtype=jnp.float32,
    out: Optional[np.ndarray] = None,
    stable: bool = True,
) -> np.ndarray:
    """Full [L, N, N] normalized-rank tensor, streamed to host per chunk
    (the memmap-compatible single-host driver; pass a np.memmap as `out`
    for reference-format artifact export)."""
    L, n = w_sym.shape[0], z.shape[0]
    if out is None:
        out = np.empty((L, n, n), dtype=np.float32)
    zd = jnp.asarray(z)
    for s in range(0, L, chunk):
        e = min(s + chunk, L)
        block = normalized_ranks_for_outcomes(
            zd, jnp.asarray(w_sym[s:e]), compute_dtype, stable=stable
        )
        out[s:e] = np.asarray(block)
    return out


@partial(jax.jit, static_argnames=("stable",))
def normalized_rank_matrices(mats: jnp.ndarray,
                             stable: bool = True) -> jnp.ndarray:
    """Re-rank a chunk of [Lc, N, N] matrices (scan bounds peak memory at
    one matrix's rank buffers); only the strict lower triangle is read."""

    def body(_, m):
        return None, normalized_rank_matrix(m, stable=stable)

    _, out = jax.lax.scan(body, None, mats)
    return out


def ensemble_normalized_ranks(rank_tensors, out: Optional[np.ndarray] = None,
                              chunk: int = 8,
                              stable: bool = True) -> np.ndarray:
    """Multi-seed ensembling (reference generate_embeddings.ipynb cells
    18-20, predict.py:466-499): geometric mean of normalized ranks across
    seed checkpoints, then re-rank.

    Streams outcome chunks so `rank_tensors` may be np.memmaps of the
    reference's 80 GB [L, N, N] artifacts (and `out` a w+ memmap); the
    re-rank runs on device. Upper-triangle/diagonal entries are 0 in every
    seed, so their gmean is 0 and the re-rank's lower-triangle read plus
    symmetrization reproduces the reference layout exactly.
    """
    from scipy.stats import gmean

    L, n, _ = rank_tensors[0].shape
    if out is None:
        out = np.empty((L, n, n), dtype=np.float32)
    for s in range(0, L, chunk):
        e = min(s + chunk, L)
        stacked = np.stack([np.asarray(r[s:e]) for r in rank_tensors])
        g = gmean(stacked, axis=0)
        out[s:e] = np.asarray(
            normalized_rank_matrices(jnp.asarray(g), stable=stable))
    return out


def normalize_scores_offline(
    raw_scores_path: str,
    out_path: str,
    num_workers: Optional[int] = None,
):
    """Reference-compatible offline CPU rank normalization over an
    [L, N, N] raw-score .npy: multiprocessing over outcome slices into a
    memmap (reference: notebooks/normalize_scores.py:29-90). Provided for
    artifact-format parity on CPU-only machines; the on-device path
    (rank_tensor / parallel.allpairs) is orders of magnitude faster.
    """
    import multiprocessing as mp

    raw = np.load(raw_scores_path, mmap_mode="r")
    L, n, _ = raw.shape
    out = np.lib.format.open_memmap(
        out_path, mode="w+", dtype=np.float32, shape=(L, n, n)
    )
    del out  # workers re-open

    args = [(raw_scores_path, out_path, l) for l in range(L)]
    with mp.Pool(num_workers) as pool:
        pool.map(_offline_slice, args)
    return np.load(out_path, mmap_mode="r")


def _offline_slice(arg):
    raw_path, out_path, l = arg
    raw = np.load(raw_path, mmap_mode="r")
    out = np.lib.format.open_memmap(out_path, mode="r+")
    n = raw.shape[1]
    m = n * (n - 1) / 2
    s = np.array(raw[l], dtype=np.float64)
    iu = np.triu_indices(n, k=0)
    s[iu] = np.inf
    flat = s.reshape(-1)
    rank = flat.argsort(kind="stable").argsort(kind="stable") + 1
    norm = (rank / m).reshape(n, n).astype(np.float32)
    norm[iu] = 0.0
    out[l] = norm + norm.T
