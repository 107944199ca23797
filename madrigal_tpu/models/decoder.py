"""Symmetric bilinear DDI decoder.

Reference: madrigal/models/models.py:522-547 (BilinearDDIScorer + Symmetric
parametrization) and models.py:914-953 (NovelDDIMultilabel wiring).

score[l, i, j] = z_head[i] @ W_sym[l] @ z_tail[j]
with W_sym = triu(W) + triu(W, 1)^T per outcome label (no bias).

Two scoring paths:
  * `all_pairs`: [L_chunk, N_head, N_tail] dense block -- the serving /
    all-pairs workload (maps onto two MXU batched matmuls; the sharded
    streaming version lives in parallel/allpairs.py).
  * `triples`: gathers only the (label, head, tail) entries a loss needs
    (SURVEY.md section 7.3: replaces the reference's full [L,N,N] tensor +
    fancy-indexing during training, which is both faster and memory-safe).
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp


def symmetrize(w):
    """triu(W) + triu(W,1)^T over the last two dims (models.py:522-524)."""
    upper = jnp.triu(w)
    strict = jnp.triu(w, 1)
    return upper + jnp.swapaxes(strict, -1, -2)


class BilinearDDIScorer(nn.Module):
    """Per-outcome symmetric bilinear scorer, weight [L, D1, D2]."""

    num_labels: int
    input_dim1: int
    input_dim2: int

    def setup(self):
        # torch nn.Bilinear init: U(-1/sqrt(in1), 1/sqrt(in1))
        bound = 1.0 / (self.input_dim1 ** 0.5)

        def init(key, shape):
            import jax
            return jax.random.uniform(key, shape, minval=-bound, maxval=bound)

        self.weight = self.param(
            "weight", init,
            (self.num_labels, self.input_dim1, self.input_dim2),
        )

    def _w(self, label_range: Optional[Tuple[int, int]] = None):
        w = self.weight
        if label_range is not None:
            w = w[label_range[0] : label_range[1]]
        return symmetrize(w)

    def __call__(self, z_head, z_tail, label_range=None):
        return self.all_pairs(z_head, z_tail, label_range)

    def all_pairs(self, z_head, z_tail, label_range=None):
        """[L, N_head, N_tail] scores (models.py:537-547)."""
        w = self._w(label_range)
        zw = jnp.einsum("nd,lde->lne", z_head, w)
        return jnp.einsum("lne,me->lnm", zw, z_tail)

    # one chunk's gathered [C, D, D] weights: 8192 * 128 * 128 * 4B = 512MB
    TRIPLE_CHUNK = 8192
    # label-chunked scan path: max [D, D] weight slices gathered per scan
    # step (1024 rows = 64 MB at D=128 f32). Bounds the step's transient
    # (gather + its backward cotangent) independently of label_chunk: an
    # uncapped TRIPLE_CHUNK * label_chunk step (512 MB slices at lc=64)
    # OOMs the 3-forward split mode at reference scale, while 16 steps of
    # 64 MB cost only ~60 ms of serialized backward per epoch
    # (scripts/decoder_bench.py).
    SCAN_WEIGHT_ROWS = 1024

    def triples(self, z_head, z_tail, labels, chunk_labels=None,
                label_chunk: int = 0):
        """Scores for aligned (head, tail, label) triples.

        z_head/z_tail: [T, D]; labels: [T] int -> [T] scores.
        Per-triple weight gathers + two small contractions; avoids the
        [L, N, N] tensor. Large T scans in TRIPLE_CHUNK chunks so the
        gathered [T, D, D] weights never materialize at once (at the
        reference's ~1M-triple full batch that would be 64 GB).

        chunk_labels/label_chunk: label-chunked (ELL) triple layout
        (train/finetune.label_chunk_triples): the list is label-sorted
        with each label's run padded to a multiple of `label_chunk`, and
        chunk_labels[i] holds chunk i's shared label. The [D, D] weight
        slice is then gathered ONCE per chunk instead of once per triple
        -- at the reference's 1M-triple full batch that cuts the per-epoch
        weight-gather traffic from 65 GB (and its 65 GB scatter-add
        transpose, the dominant backward cost: TPU scatters run at
        ~32 GB/s) down to 65/label_chunk GB. Numerics identical.
        """
        w_sym = symmetrize(self.weight)
        T = z_head.shape[0]
        C = self.TRIPLE_CHUNK

        if chunk_labels is not None:
            assert label_chunk > 0 and T % label_chunk == 0

            def scores_fn(zh_c, zt_c, lb_c):
                c = label_chunk
                w = w_sym[lb_c]  # [n/c, D, D], one gather per chunk
                zh3 = zh_c.reshape(-1, c, zh_c.shape[-1])
                zt3 = zt_c.reshape(-1, c, zt_c.shape[-1])
                return jnp.einsum("tcd,tde,tce->tc", zh3, w, zt3).reshape(-1)

            # The scan chunk bounds the gathered [C/lc, D, D] weight
            # slice. Scaling it by label_chunk cuts the step count (128
            # serialized 8 MB steps at the reference's 1M-triple batch
            # measured ~0.5 s of backward), but the slice rows are capped
            # at SCAN_WEIGHT_ROWS so the per-step transient stays bounded
            # (lc=64: 16 steps of 64 MB instead of 2 steps of 512 MB --
            # the uncapped version OOM'd the 3-forward split mode).
            C = max(C, self.SCAN_WEIGHT_ROWS * label_chunk)
            if T <= C:
                return scores_fn(z_head, z_tail, chunk_labels)
            import jax

            pad = (-T) % C
            zh = jnp.pad(z_head, ((0, pad), (0, 0))) if pad else z_head
            zt = jnp.pad(z_tail, ((0, pad), (0, 0))) if pad else z_tail
            cl = (jnp.pad(chunk_labels, (0, pad // label_chunk)) if pad
                  else chunk_labels)
            n_scan = (T + pad) // C

            def body(_, args):
                return None, jax.checkpoint(scores_fn)(*args)

            _, out = jax.lax.scan(
                body, None,
                (zh.reshape(n_scan, C, -1),
                 zt.reshape(n_scan, C, -1),
                 cl.reshape(n_scan, C // label_chunk)),
            )
            return out.reshape(-1)[:T]

        if T <= C:
            w = w_sym[labels]  # [T, D, D]
            return jnp.einsum("td,tde,te->t", z_head, w, z_tail)

        import jax

        pad = (-T) % C
        zh = jnp.pad(z_head, ((0, pad), (0, 0)))
        zt = jnp.pad(z_tail, ((0, pad), (0, 0)))
        lb = jnp.pad(labels, (0, pad))
        n_chunks = (T + pad) // C

        @jax.checkpoint  # recompute the [C, D, D] gather in the backward:
        # without remat every chunk's gathered weights are saved as scan
        # residuals, re-materializing the full 64 GB
        def chunk_scores(args):
            zh_c, zt_c, lb_c = args
            w = w_sym[lb_c]  # [C, D, D]
            return jnp.einsum("td,tde,te->t", zh_c, w, zt_c)

        def body(_, args):
            return None, chunk_scores(args)

        _, out = jax.lax.scan(
            body, None,
            (zh.reshape(n_chunks, C, -1), zt.reshape(n_chunks, C, -1),
             lb.reshape(n_chunks, C)),
        )
        return out.reshape(-1)[:T]

    # triples_indexed scan chunk: [C, D] f32 gathers = 64 MB at D=128
    INDEXED_CHUNK = 131072

    def triples_indexed(self, z_table, head_idx, tail_idx, labels,
                        chunk: int = 0):
        """`triples` that gathers its embedding rows INSIDE the scan chunk.

        z_table: [N, D]; head_idx/tail_idx/labels: [T] int -> [T] scores.
        Callers with very large T relative to N (stage-1 HGT link
        prediction: ~5M held-out queries over 122.5k nodes,
        kg_pretraining.py:41-75) must not materialize the [T, D] gathered
        embeddings up front: those temps (plus their scan residuals and
        pad copies) are ~10 GB at reference scale and OOM the chip next
        to the full-graph HGT fwd+bwd. Gathering from the shared table
        inside a jax.checkpoint'ed scan body caps the live footprint at
        one [chunk, D] block; the backward recomputes the gathers and
        accumulates a single [N, D] cotangent for the table. Numerics
        identical to `triples(z_table[head_idx], z_table[tail_idx], ...)`.
        """
        w_sym = symmetrize(self.weight)
        T = head_idx.shape[0]
        C = chunk or self.INDEXED_CHUNK

        if self.num_labels == 1:
            w0 = w_sym[0]

            def scores_fn(hi, ti, lb):
                return jnp.einsum(
                    "td,de,te->t", z_table[hi], w0, z_table[ti])
        else:
            def scores_fn(hi, ti, lb):
                return jnp.einsum(
                    "td,tde,te->t", z_table[hi], w_sym[lb], z_table[ti])

        if T <= C:
            return scores_fn(head_idx, tail_idx, labels)
        import jax

        pad = (-T) % C
        hi = jnp.pad(head_idx, (0, pad))
        ti = jnp.pad(tail_idx, (0, pad))
        lb = jnp.pad(labels, (0, pad))
        n_scan = (T + pad) // C

        def body(_, args):
            return None, jax.checkpoint(scores_fn)(*args)

        _, out = jax.lax.scan(
            body, None,
            (hi.reshape(n_scan, C), ti.reshape(n_scan, C),
             lb.reshape(n_scan, C)),
        )
        return out.reshape(-1)[:T]

    def pairs_all_labels(self, z_head, z_tail):
        """Scores for aligned (head, tail) pairs across all labels:
        z_head/z_tail [T, D] -> [T, L]."""
        w = symmetrize(self.weight)
        zw = jnp.einsum("td,lde->tle", z_head, w)
        return jnp.einsum("tle,te->tl", zw, z_tail)
