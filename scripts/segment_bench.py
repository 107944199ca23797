"""Micro-benchmark: segment-sum strategies for HGT-scale message
aggregation on the real chip.

The full-KG HGT forward (~750 ms, hgt_scale_bench.py) is dominated by
per-edge gathers + the segment reductions. Variants for
segment_sum([E, 128] -> [N, 128], E=8.3M, N=122.5k):

  a. jax.ops.segment_sum, unsorted ids (the production path)
  b. same with indices_are_sorted=True over dst-sorted ids
  c. dst-sorted + cumsum + boundary gather (scatter-free: the segment sum
     becomes diff-of-prefix-sums at host-precomputed segment boundaries)
  d. pure gather of [E, 128] rows (lower bound: the read traffic alone)

Usage: python scripts/segment_bench.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

from madrigal_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax.numpy as jnp

E = 8_300_000
N = 122_500
F = 128
REPS = 3


def timeit(fn, *args):
    out = fn(*args)
    float(jnp.max(out.reshape(-1)[:8]))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    float(jnp.max(out.reshape(-1)[:8]))
    return (time.perf_counter() - t0) / REPS


@jax.jit
def seg_unsorted(data, ids):
    return jax.ops.segment_sum(data, ids, num_segments=N)


@jax.jit
def seg_sorted(data, ids):
    return jax.ops.segment_sum(data, ids, num_segments=N,
                               indices_are_sorted=True)


@jax.jit
def seg_cumsum(data, ends):
    # ends[t] = index AFTER segment t's last element (host-precomputed)
    csum = jnp.cumsum(data, axis=0)
    padded = jnp.concatenate([jnp.zeros((1, data.shape[1]), data.dtype),
                              csum], axis=0)
    return padded[ends] - padded[jnp.concatenate(
        [jnp.zeros((1,), ends.dtype), ends[:-1]])]


@jax.jit
def gather_only(table, ids):
    return table[ids].sum(axis=0)


def seg_pallas(data, starts):
    # ops/segment_pallas.py: sorted rows -> per-segment-block one-hot
    # matmuls on the MXU, double-buffered HBM->VMEM DMA, no scatter
    from madrigal_tpu.ops.segment_pallas import sorted_segment_sum_mxu
    return sorted_segment_sum_mxu(data, starts, N)


@jax.jit
def seg_chunked(data, chunk_dst):
    # degree-chunked layout (ops/segment.chunked_segment_sum): streaming
    # intra-chunk reduction + 8x-fewer-row scatter
    partial = data.reshape(-1, 8, data.shape[1]).sum(axis=1)
    return jax.ops.segment_sum(partial, chunk_dst, num_segments=N,
                               indices_are_sorted=True)


def width_sweep():
    """Row-rate vs byte-rate probe: scatter/gather at widths 64..512 with
    TOTAL BYTES held constant (E scales inversely). Row-rate-bound ops
    (hypothesis for TPU scatters) finish ~Wx faster at width W*128; byte-
    bound ops stay flat. Motivates the fused k|v gather in models/hgt.py
    (one [E, 2F] stream instead of two [E, F] streams)."""
    rng = np.random.RandomState(0)
    base_bytes = E * F * 4
    for width in (64, 128, 256, 512):
        e = base_bytes // (width * 4)
        data = jnp.asarray(rng.randn(e, width).astype(np.float32))
        ids_u = rng.randint(0, N, e).astype(np.int32)
        ids_s = np.sort(ids_u)
        ends = np.searchsorted(ids_s, np.arange(N) + 1).astype(np.int32)
        table = jnp.asarray(rng.randn(N, width).astype(np.float32))
        for name, fn, args in (
            ("scatter_unsorted", seg_unsorted, (data, jnp.asarray(ids_u))),
            ("scatter_sorted", seg_sorted, (data, jnp.asarray(ids_s))),
            ("cumsum_boundaries", seg_cumsum, (data, jnp.asarray(ends))),
            ("gather", gather_only, (table, jnp.asarray(ids_u))),
        ):
            dt = timeit(fn, *args)
            print(f"w={width:4d} E={e:>9d} {name}: {dt * 1e3:7.1f} ms "
                  f"({base_bytes / dt / 1e9:.0f} GB/s effective)",
                  flush=True)


def main():
    if "--widths" in sys.argv:
        return width_sweep()
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randn(E, F).astype(np.float32))
    ids_u = rng.randint(0, N, E).astype(np.int32)
    ids_s = np.sort(ids_u)
    ends = np.searchsorted(ids_s, np.arange(N) + 1).astype(np.int32)
    ids_u = jnp.asarray(ids_u)
    ids_sj = jnp.asarray(ids_s)
    ends_j = jnp.asarray(ends)

    starts_j = jnp.asarray(np.concatenate([[0], ends]).astype(np.int32))

    ref = np.asarray(seg_unsorted(data, ids_sj))
    got = np.asarray(seg_cumsum(data, ends_j))
    err = np.max(np.abs(ref - got)) / max(np.max(np.abs(ref)), 1e-9)
    print(f"cumsum vs scatter rel err: {err:.2e}")
    got_p = np.asarray(seg_pallas(data, starts_j))
    err_p = np.max(np.abs(ref - got_p)) / max(np.max(np.abs(ref)), 1e-9)
    print(f"pallas vs scatter rel err: {err_p:.2e}")

    # chunked layout: every 8 consecutive (sorted) slots share one dst.
    # Using sorted ids rounded down to chunk boundaries approximates the
    # real padded layout's chunk_dst (exactness is tested elsewhere;
    # here only the memory-access pattern matters).
    chunk_dst_j = jnp.asarray(ids_s[::8].astype(np.int32))

    table = jnp.asarray(rng.randn(N, F).astype(np.float32))
    for name, fn, args in (
        ("a_scatter_unsorted", seg_unsorted, (data, ids_u)),
        ("b_scatter_sorted", seg_sorted, (data, ids_sj)),
        ("c_cumsum_boundaries", seg_cumsum, (data, ends_j)),
        ("d_gather_lower_bound", gather_only, (table, ids_u)),
        ("e_chunked8_reduce_scatter", seg_chunked, (data, chunk_dst_j)),
        ("f_pallas_mxu_sorted", seg_pallas, (data, starts_j)),
    ):
        dt = timeit(fn, *args)
        print(f"{name}: {dt * 1e3:.1f} ms  "
              f"({E * F * 4 / dt / 1e9:.0f} GB/s effective)")


if __name__ == "__main__":
    main()
