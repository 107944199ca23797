"""Missing-modality-masked transformer fusion + positional encodings.

TPU-native equivalent of the reference's fusion stack:
  * `TransformerFusion`          -- madrigal/models/models.py:352-455
  * `PositionEncodingSinusoidal` -- models.py:551-587
  * `PositionEncodingLearnable`  -- models.py:590-603

All aggregation modes are mask algebra (no boolean indexing), so the whole
fusion jits into one XLA program with static shapes.
"""
from __future__ import annotations

import math
import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..config import FusionConfig
from ..ops.segment import masked_max_pool, masked_mean_pool
from .attention import MultiheadAttention, TransformerEncoder


def sinusoidal_pe(max_len: int, d_model: int) -> np.ndarray:
    """Standard sinusoidal table [1, max_len, d_model]
    (reference: models.py:560-568)."""
    position = np.arange(max_len)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2) * (-math.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe[None]


class PositionEncoding(nn.Module):
    """Adds positional encoding to the first `max_len` tokens.

    With attention bottlenecks the reference only position-encodes the
    non-tx (+CLS) prefix (models.py:571-577,668-676); bottleneck and tx
    tokens get zeros. `pe_type` in {'learnable', 'sinusoidal'}.
    """

    max_len: int
    d_model: int
    pe_type: str = "learnable"
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        seq_len = x.shape[1]
        if self.pe_type == "learnable":
            pe = self.param(
                "pe", nn.initializers.normal(stddev=1.0),
                (1, self.max_len, self.d_model),
            )
        elif self.pe_type == "sinusoidal":
            pe = jnp.asarray(sinusoidal_pe(self.max_len, self.d_model))
        else:
            raise NotImplementedError(self.pe_type)
        pad = seq_len - self.max_len
        if pad > 0:
            pe = jnp.concatenate(
                [pe, jnp.zeros((1, pad, self.d_model), pe.dtype)], axis=1
            )
        x = x + pe[:, :seq_len]
        return nn.Dropout(rate=self.dropout, deterministic=not train)(x)


class TransformerFusion(nn.Module):
    """Masked fusion transformer with mean/max/cls/x-attn aggregation.

    Inputs:
      fusion_sequence: [B, S, embed_dim] modality tokens (incl. bottlenecks
        and CLS, already assembled by the encoder).
      fusion_mask: [B, S] bool key-padding mask (True = modality missing).
      src_mask: optional [S, S] bool attention-structure mask (True =
        disallow); used for tx attention bottlenecks.
    Output: [B, embed_dim] fused drug embedding.
    """

    cfg: FusionConfig
    embed_dim: int
    num_kv_tokens: int  # NUM_MODALITIES + num_tx_bottlenecks (x-attn mask len)
    num_non_tx: int

    @nn.compact
    def __call__(self, fusion_sequence, fusion_mask, src_mask=None,
                 train: bool = False, return_last_attn: bool = False):
        # train/return_last_attn are positional-or-keyword so the encoder
        # can wrap the whole module in nn.remat with them static
        cfg = self.cfg
        latent = cfg.latent_dim
        cdt = getattr(cfg, "compute_dtype", "float32")
        B, S, _ = fusion_sequence.shape

        h = nn.Dense(latent, name="embed2latent")(fusion_sequence)
        enc_out = TransformerEncoder(
            num_layers=cfg.num_layers, d_model=latent, nhead=cfg.att_heads,
            dim_feedforward=cfg.ffn_dim, dropout=cfg.dropout, actn=cfg.actn,
            norm_first=cfg.norm_first,
            remat=getattr(cfg, "remat", False),
            remat_policy=getattr(cfg, "remat_policy", None), dtype=cdt,
            name="transformer_encoder",
        )(h, key_padding_mask=fusion_mask, attn_mask=src_mask, train=train,
          return_last_attn=return_last_attn)
        last_attn = None
        if return_last_attn:
            h, last_attn = enc_out
        else:
            h = enc_out

        if cfg.agg == "x-attn":
            # Zorro-style learned-query cross-attention pooling
            # (models.py:370-443). With bottlenecks, the pooling query reads
            # ONLY the bottleneck tokens (key-padding on non-tx + tx).
            query = self.param(
                "x_attn_query", nn.initializers.normal(stddev=1.0),
                (1, latent),
            )
            q = jnp.broadcast_to(query[None], (B, 1, latent))
            kpm = np.zeros((self.num_kv_tokens,), dtype=bool)
            if cfg.num_tx_bottlenecks > 0:
                kpm[: self.num_non_tx] = True
                kpm[self.num_non_tx + cfg.num_tx_bottlenecks:] = True
            kpm = jnp.broadcast_to(jnp.asarray(kpm)[None], (B, self.num_kv_tokens))

            kv = nn.LayerNorm(epsilon=1e-5, name="x_attn_kv_norm")(h)
            qn = nn.LayerNorm(epsilon=1e-5, name="x_attn_query_norm")
            if cfg.norm_first:
                q = qn(q)
            out = MultiheadAttention(
                embed_dim=latent, num_heads=cfg.att_heads,
                dropout=cfg.dropout, dtype=cdt, name="x_attn_mha",
            )(q, kv, kv, key_padding_mask=kpm, train=train)
            out = nn.Dropout(rate=cfg.dropout, deterministic=not train,
                             name="x_attn_dropout")(out)
            out = out + q
            if not cfg.norm_first:
                out = qn(out)
            pooled = nn.Dense(self.embed_dim, name="latent2embed")(out[:, 0])
        elif cfg.agg == "cls":
            h = nn.Dense(self.embed_dim, name="latent2embed")(h)
            pooled = h[:, 0]
        elif cfg.agg == "mean":
            h = nn.Dense(self.embed_dim, name="latent2embed")(h)
            pooled = masked_mean_pool(h, ~fusion_mask)
        elif cfg.agg == "max":
            h = nn.Dense(self.embed_dim, name="latent2embed")(h)
            pooled = masked_max_pool(h, ~fusion_mask)
        else:
            raise NotImplementedError(cfg.agg)

        if return_last_attn:
            return pooled, last_attn
        return pooled


def build_bottleneck_masks(num_non_tx: int, num_bottlenecks: int,
                           num_cell_lines: int, with_cls: bool) -> np.ndarray:
    """Structure mask isolating tx tokens behind bottlenecks
    (reference: models.py:813-842). True = attention disallowed.

    Token order: [CLS?] + non-tx + bottlenecks + tx.
    """
    s = num_non_tx + num_bottlenecks + num_cell_lines
    m = np.zeros((s, s), dtype=bool)
    m[:num_non_tx, -num_cell_lines:] = True  # non-tx cannot see tx
    m[-num_cell_lines:, :num_non_tx] = True  # tx cannot see non-tx
    if with_cls:
        # CLS attends to (and is attended by) everything (models.py:829-842)
        m = np.pad(m, ((1, 0), (1, 0)), constant_values=False)
    return m
