"""Pallas TPU kernel for the pair x outcome bilinear scorer.

The framework's hot serving op (SURVEY.md section 7.1 item 3: "the batched
pairxoutcome bilinear contraction z W z^T -> [L, N, N] tile is the definite
Pallas target"). Computes score[l, i, j] = z_head[i] . W_l . z_tail[j] as a
tiled kernel:

  grid (L, N_head/TM, N_tail/TN); per program:
    ZW   = z_head_tile[TM, D] @ W_l[D, D]      (MXU, f32 accum)
    out  = ZW @ z_tail_tile[TN, D]^T           (MXU, f32 accum)
    write out tile in bf16 (fused epilogue -- no f32 intermediate in HBM)

D = 128 matches the MXU systolic width exactly. The f32->bf16 conversion
happens in VMEM, so HBM traffic is 2 bytes/score (the XLA path materializes
an f32 accumulator block first on some shapes).

Falls back to the XLA einsum path on non-TPU backends.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False


def _make_kernel(tile_l: int):
    def _kernel(z_row_ref, w_ref, z_col_ref, out_ref):
        # label blocking: reuse the z row/col tiles across tile_l outcomes
        # (measured-optimal on v5e with full coverage: tile_l=4,
        # tile_m=768, tile_n=1152 -> 177 G scores/s vs 162 for the XLA
        # einsum path at L=64, N=6912)
        for li in range(tile_l):
            zw = jnp.dot(
                z_row_ref[:], w_ref[li], preferred_element_type=jnp.float32
            )
            scores = jnp.dot(
                zw.astype(z_col_ref.dtype), z_col_ref[:].T,
                preferred_element_type=jnp.float32,
            )
            out_ref[li, :, :] = scores.astype(out_ref.dtype)

    return _kernel


def _round_up(x, m):
    return ((x + m - 1) // m) * m


# NOTE: deliberately NOT @jax.jit -- a nested jit under a caller's jit
# turns the multi-GB pallas output into an extra copy at the call boundary
# (observed OOM at L_CHUNK=64 on v5e); callers jit the enclosing function.
def _pallas_scores(z_head, z_tail, w_sym, tile_l, tile_m, tile_n,
                   out_dtype_name, interpret):
    L, D, _ = w_sym.shape
    M, N = z_head.shape[0], z_tail.shape[0]
    out_dtype = jnp.dtype(out_dtype_name)
    grid = (L // tile_l, M // tile_m, N // tile_n)

    return pl.pallas_call(
        _make_kernel(tile_l),
        out_shape=jax.ShapeDtypeStruct((L, M, N), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, D), lambda l, i, j: (i, 0),
                         memory_space=pltpu.VMEM if not interpret else None),
            pl.BlockSpec((tile_l, D, D), lambda l, i, j: (l, 0, 0),
                         memory_space=pltpu.VMEM if not interpret else None),
            pl.BlockSpec((tile_n, D), lambda l, i, j: (j, 0),
                         memory_space=pltpu.VMEM if not interpret else None),
        ],
        out_specs=pl.BlockSpec(
            (tile_l, tile_m, tile_n), lambda l, i, j: (l, i, j),
            memory_space=pltpu.VMEM if not interpret else None,
        ),
        interpret=interpret,
    )(z_head, w_sym, z_tail)


def bilinear_scores_pallas(
    z_head,
    z_tail,
    w_sym,
    tile_l: int = 4,
    tile_m: int = 768,
    tile_n: int = 1152,
    out_dtype=jnp.bfloat16,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """[L, N_head, N_tail] scores via the Pallas kernel.

    Pads N_head/N_tail up to tile multiples and L to a tile_l multiple
    (callers get the sliced-back view). Inputs cast to `compute_dtype`
    (bf16 keeps the MXU at full rate; accumulation is always f32 inside
    the kernel).
    """
    z_head = jnp.asarray(z_head).astype(compute_dtype)
    z_tail = jnp.asarray(z_tail).astype(compute_dtype)
    w_sym = jnp.asarray(w_sym).astype(compute_dtype)
    L = w_sym.shape[0]
    M, N = z_head.shape[0], z_tail.shape[0]
    tile_l = min(tile_l, L)
    Mp, Np = _round_up(M, tile_m), _round_up(N, tile_n)
    Lp = _round_up(L, tile_l)
    if Mp != M:
        z_head = jnp.pad(z_head, ((0, Mp - M), (0, 0)))
    if Np != N:
        z_tail = jnp.pad(z_tail, ((0, Np - N), (0, 0)))
    if Lp != L:
        w_sym = jnp.pad(w_sym, ((0, Lp - L), (0, 0), (0, 0)))
    out = _pallas_scores(
        z_head, z_tail, w_sym, tile_l, tile_m, tile_n,
        jnp.dtype(out_dtype).name, interpret,
    )
    if (L, M, N) != (Lp, Mp, Np):
        # only slice when padding happened: an unconditional identity slice
        # can materialize a second multi-GB copy of the score block
        out = out[:L, :M, :N]
    return out


def bilinear_scores_xla(z_head, z_tail, w_sym, out_dtype=jnp.bfloat16,
                        compute_dtype=jnp.bfloat16):
    """XLA reference path (same math, einsum batched matmuls)."""
    zh = jnp.asarray(z_head).astype(compute_dtype)
    zt = jnp.asarray(z_tail).astype(compute_dtype)
    w = jnp.asarray(w_sym).astype(compute_dtype)
    zw = jnp.einsum("nd,lde->lne", zh, w,
                    preferred_element_type=jnp.float32)
    s = jnp.einsum("lne,me->lnm", zw.astype(compute_dtype), zt,
                   preferred_element_type=jnp.float32)
    return s.astype(out_dtype)


def bilinear_scores(z_head, z_tail, w_sym, **kw):
    """Dispatch: Pallas on TPU, XLA elsewhere."""
    if _HAS_PALLAS and jax.default_backend() == "tpu":
        return bilinear_scores_pallas(z_head, z_tail, w_sym, **kw)
    kw.pop("tile_l", None)
    kw.pop("tile_m", None)
    kw.pop("tile_n", None)
    kw.pop("interpret", None)
    return bilinear_scores_xla(z_head, z_tail, w_sym, **kw)
