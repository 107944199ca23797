"""Sharded all-pairs scoring + rank normalization over a device mesh.

The TPU-native replacement for the reference's serve/analysis path
(reference: madrigal/evaluate/predict.py:381-463 chunked scoring into
np.memmap + notebooks/normalize_scores.py multiprocessing rank pass; see
SURVEY.md sections 2.2/3.4).

Decomposition: the OUTCOME (label) axis shards across chips -- every
outcome's [N, N] score+rank job is independent, so after one replicated
broadcast of the [N, D] embedding table the fleet runs with zero cross-chip
communication; ICI is only touched by the initial Z broadcast and the final
(optional) gather. Row-sharding the pair grid (with psum-merged ranks) is
only needed for N >> 40k and is intentionally not the default.

Embedding the drugs (encoder forward over all N) shards the DRUG axis via
'dp' instead -- see `embed_all_drugs_sharded`.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..eval.ranks import normalized_rank_matrix, score_outcome
from .mesh import pad_to_multiple


def _rank_block(z, w_block, compute_dtype):
    """[Lb, N, N] ranks for the local block of outcomes (scan bounds peak
    memory at one score matrix)."""

    def body(_, w_l):
        s = score_outcome(z, w_l, compute_dtype)
        return None, normalized_rank_matrix(s)

    _, out = jax.lax.scan(body, None, w_block)
    return out


def sharded_rank_tensor(
    mesh: Mesh,
    z: np.ndarray,
    w_sym: np.ndarray,
    chunk_per_device: int = 4,
    compute_dtype=jnp.float32,
    out: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Full [L, N, N] normalized-rank tensor computed label-sharded.

    Streams device-sharded chunks (d * chunk_per_device outcomes at a time)
    back to the host buffer (np.memmap-compatible `out`).

    compute_dtype defaults to float32 so the sharded path's ranks match the
    single-host `eval.ranks.rank_tensor` exactly; pass bfloat16 explicitly
    as the high-throughput opt-in (bf16 rounding can reorder near-tie
    scores, perturbing ranks).
    """
    axis = mesh.axis_names[-1]
    d = mesh.shape[axis]
    L, n = w_sym.shape[0], z.shape[0]
    if out is None:
        out = np.empty((L, n, n), dtype=np.float32)

    z_sh = jax.device_put(jnp.asarray(z), NamedSharding(mesh, P()))
    block = d * chunk_per_device

    fn = jax.jit(
        partial(_rank_block, compute_dtype=compute_dtype),
        in_shardings=(NamedSharding(mesh, P()),
                      NamedSharding(mesh, P(axis))),
        out_shardings=NamedSharding(mesh, P(axis)),
    )

    for s in range(0, L, block):
        e = min(s + block, L)
        w_blk, pad = pad_to_multiple(w_sym[s:e], d, axis=0)
        ranks = fn(z_sh, jnp.asarray(w_blk))
        out[s:e] = np.asarray(ranks)[: e - s]
    return out


def sharded_score_chunk(
    mesh: Mesh,
    z_head: jnp.ndarray,
    z_tail: jnp.ndarray,
    w_sym_chunk: jnp.ndarray,
    compute_dtype=jnp.float32,
):
    """[Lc, N_head, N_tail] raw scores, label-sharded (the
    `get_*_scores_for_all_pairs` analog, predict.py:419-429)."""
    axis = mesh.axis_names[-1]

    def score_all(zh, zt, w):
        def body(_, w_l):
            zw = jnp.dot(zh.astype(compute_dtype), w_l.astype(compute_dtype),
                         preferred_element_type=jnp.float32)
            s = jnp.dot(zw.astype(compute_dtype), zt.T.astype(compute_dtype),
                        preferred_element_type=jnp.float32)
            return None, s

        _, out = jax.lax.scan(body, None, w)
        return out

    fn = jax.jit(
        score_all,
        in_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P()),
                      NamedSharding(mesh, P(axis))),
        out_shardings=NamedSharding(mesh, P(axis)),
    )
    return fn(z_head, z_tail, w_sym_chunk)


def embed_all_drugs_sharded(mesh: Mesh, encoder_apply, variables, batches):
    """Embed drug batches data-parallel over the mesh's 'dp' axis.

    `batches` yields DrugModalityBatch pytrees already padded to EQUAL
    shapes (fixed node/edge budgets). Groups of `dp` consecutive batches
    are stacked along a new leading axis, placed with `P('dp')`, and run
    through `jax.vmap(encoder_apply)` -- GSPMD partitions the vmapped axis
    over the devices so each chip embeds its own drug shard with zero
    cross-chip communication (weights replicated). A trailing group
    shorter than `dp` is padded by repeating its last batch and the extra
    rows are dropped on the host.
    """
    dp_axis = "dp" if "dp" in mesh.axis_names else mesh.axis_names[0]
    dp = mesh.shape[dp_axis]
    rep = NamedSharding(mesh, P())
    sh = NamedSharding(mesh, P(dp_axis))
    variables = jax.device_put(variables, rep)

    fn = jax.jit(
        jax.vmap(encoder_apply, in_axes=(None, 0)),
        in_shardings=(rep, sh),
        out_shardings=sh,
    )

    batches = list(batches)
    outs = []
    for s in range(0, len(batches), dp):
        group = batches[s : s + dp]
        n_real = len(group)
        sizes = [int(b.drugs.shape[0]) for b in group]
        group = group + [group[-1]] * (dp - n_real)
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *group
        )
        stacked = jax.device_put(stacked, sh)
        z = np.asarray(fn(variables, stacked))  # [dp, B, D]
        outs.extend(z[i, : sizes[i]] for i in range(n_real))
    return np.concatenate(outs, axis=0)
