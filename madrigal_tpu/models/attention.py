"""Multi-head attention and transformer encoder layers.

Semantics-compatible with torch.nn.MultiheadAttention /
nn.TransformerEncoderLayer as used by the reference fusion module
(reference: madrigal/models/models.py:366-367,374-379). The reference
disables torch's nested-tensor fast path (`enable_nested_tensor=False`,
models.py:367) precisely because correctness under per-sample key-padding
masks matters; here masking is explicit math, so the whole fused sequence
(<= ~21 tokens) compiles to a handful of MXU matmuls per layer.

The fusion sequence is tiny, so plain XLA attention is optimal (a Pallas
flash-attention kernel would only add overhead at seq_len 21 -- see
SURVEY.md section 7.1 item 3); the Pallas budget goes to the bilinear
pairxoutcome scorer instead.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .mlp import activation

NEG_INF = -1e9  # large-negative used in masked softmax (avoids NaN rows)


class MultiheadAttention(nn.Module):
    """torch.nn.MultiheadAttention-compatible (batch_first semantics).

    Parameters mirror torch's packed in_proj ([3E, E]) as three Dense
    modules `q_proj`/`k_proj`/`v_proj` plus `out_proj`; the converter splits
    torch's packed weight.
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    # activation compute dtype (params stay f32; softmax + returned
    # attention weights stay f32). 'bfloat16' = throughput mode.
    dtype: str = "float32"

    @nn.compact
    def __call__(
        self,
        query,  # [B, Tq, E]
        key,  # [B, Tk, E]
        value,  # [B, Tk, E]
        key_padding_mask=None,  # [B, Tk] bool, True = ignore
        attn_mask=None,  # [Tq, Tk] bool, True = disallow
        *,
        train: bool = False,
        return_weights: bool = False,
    ):
        B, Tq, E = query.shape
        Tk = key.shape[1]
        H = self.num_heads
        D = E // H
        assert D * H == E
        # "float32" = no casting anywhere (inputs may be f32 or, in x64
        # parity tests, f64); a reduced dtype inserts explicit casts with
        # f32 softmax statistics
        cdt = None if self.dtype == "float32" else jnp.dtype(self.dtype)
        cast = (lambda x: x) if cdt is None else (lambda x: x.astype(cdt))

        q = nn.Dense(E, name="q_proj", dtype=cdt)(cast(query))
        k = nn.Dense(E, name="k_proj", dtype=cdt)(cast(key))
        v = nn.Dense(E, name="v_proj", dtype=cdt)(cast(value))

        q = q.reshape(B, Tq, H, D).transpose(0, 2, 1, 3)
        k = k.reshape(B, Tk, H, D).transpose(0, 2, 1, 3)
        v = v.reshape(B, Tk, H, D).transpose(0, 2, 1, 3)

        scale = 1.0 / jnp.sqrt(jnp.asarray(D, dtype=q.dtype))
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q * scale, k,
            preferred_element_type=None if cdt is None else jnp.float32)

        mask = jnp.zeros((B, 1, Tq, Tk), dtype=bool)
        if key_padding_mask is not None:
            mask = mask | key_padding_mask[:, None, None, :]
        if attn_mask is not None:
            mask = mask | attn_mask[None, None, :, :]
        logits = jnp.where(mask, NEG_INF, logits)

        weights = nn.softmax(logits, axis=-1)  # f32 in reduced-dtype mode
        if self.dropout > 0:
            weights = nn.Dropout(rate=self.dropout, deterministic=not train,
                                 name="attn_drop")(weights)
        out = jnp.einsum("bhqk,bhkd->bhqd", cast(weights), v)
        out = out.transpose(0, 2, 1, 3).reshape(B, Tq, E)
        out = nn.Dense(E, name="out_proj", dtype=cdt)(out)
        if return_weights:
            return out, weights  # [B, H, Tq, Tk]
        return out


class TransformerEncoderLayer(nn.Module):
    """torch.nn.TransformerEncoderLayer-compatible block."""

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1
    actn: str = "relu"
    norm_first: bool = False
    # activation compute dtype for attention + FFN matmuls; LayerNorms and
    # residual stream stay f32 (standard mixed-precision discipline)
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, key_padding_mask=None, attn_mask=None,
                 train: bool = False, return_weights: bool = False):
        # train/return_weights are positional-or-keyword so nn.remat can
        # mark them static (keyword-only args cannot be static_argnums)
        cdt = None if self.dtype == "float32" else jnp.dtype(self.dtype)
        cast = (lambda x: x) if cdt is None else (lambda x: x.astype(cdt))
        up = (lambda x: x) if cdt is None else (
            lambda x: x.astype(jnp.float32))
        act = activation(self.actn)
        attn = MultiheadAttention(
            embed_dim=self.d_model, num_heads=self.nhead,
            dropout=self.dropout, dtype=self.dtype, name="self_attn",
        )
        norm1 = nn.LayerNorm(epsilon=1e-5, name="norm1")
        norm2 = nn.LayerNorm(epsilon=1e-5, name="norm2")
        drop1 = nn.Dropout(rate=self.dropout, deterministic=not train,
                           name="dropout1")
        drop2 = nn.Dropout(rate=self.dropout, deterministic=not train,
                           name="dropout2")
        drop_ffn = nn.Dropout(rate=self.dropout, deterministic=not train,
                              name="dropout_ffn")
        lin1 = nn.Dense(self.dim_feedforward, name="linear1", dtype=cdt)
        lin2 = nn.Dense(self.d_model, name="linear2", dtype=cdt)

        weights = None

        def sa(h):
            nonlocal weights
            out = attn(h, h, h, key_padding_mask=key_padding_mask,
                       attn_mask=attn_mask, train=train,
                       return_weights=return_weights)
            if return_weights:
                out, weights = out
            return up(drop1(out))

        def ff(h):
            return up(drop2(lin2(drop_ffn(act(lin1(cast(h)))))))

        if self.norm_first:
            x = x + sa(norm1(x))
            x = x + ff(norm2(x))
        else:
            x = norm1(x + sa(x))
            x = norm2(x + ff(x))
        if return_weights:
            return x, weights
        return x


class TransformerEncoder(nn.Module):
    """Stack of encoder layers. The last layer can expose attention weights
    (the reference hook-patches the last layer's MHA to capture weights for
    analysis -- models.py:388-399)."""

    num_layers: int
    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1
    actn: str = "relu"
    norm_first: bool = False
    remat: bool = False  # recompute each layer in the backward (memory
    # knob for full-batch training at reference scale; attention-weight
    # capture layers are never rematted)
    # remat policy: None = recompute everything; 'dots' saves the Dense
    # (dot_general-without-batch-dims) outputs -- QKV/out projections and
    # both FFN matmuls, i.e. most of the layer's FLOPs at short sequence
    # length -- and recomputes only the attention einsums/softmax/
    # elementwise in the backward. Costs a few [B_chunk, S, D] buffers
    # per layer; the full-remat program shape XLA's compiler handles
    # stays (it is still a checkpointed layer). 'all'
    # (everything_saveable) saves EVERY residual -- zero recompute, i.e.
    # the remat-off backward FLOPs while keeping the checkpointed-layer
    # program structure that the axon remote compile helper tolerates
    # (dropping fusion remat outright SIGKILLs it at reference scale;
    # docs/EPOCH_PROFILE.md).
    remat_policy: str | None = None
    dtype: str = "float32"  # activation compute dtype (see layer docs)

    @nn.compact
    def __call__(self, x, key_padding_mask=None, attn_mask=None, *,
                 train: bool = False, return_last_attn: bool = False):
        last_weights = None
        for i in range(self.num_layers):
            want = return_last_attn and (i == self.num_layers - 1)
            cls = TransformerEncoderLayer
            if self.remat and not want:
                kw = {}
                if self.remat_policy == "dots":
                    import jax

                    kw["policy"] = (
                        jax.checkpoint_policies
                        .dots_with_no_batch_dims_saveable)
                elif self.remat_policy == "all":
                    import jax

                    kw["policy"] = (
                        jax.checkpoint_policies.everything_saveable)
                elif self.remat_policy is not None:
                    raise ValueError(
                        f"unknown remat_policy {self.remat_policy!r} "
                        "(None | 'dots' | 'all')")
                cls = nn.remat(TransformerEncoderLayer,
                               static_argnums=(4, 5), **kw)
            layer = cls(
                d_model=self.d_model, nhead=self.nhead,
                dim_feedforward=self.dim_feedforward, dropout=self.dropout,
                actn=self.actn, norm_first=self.norm_first,
                dtype=self.dtype, name=f"layer_{i}",
            )
            out = layer(x, key_padding_mask, attn_mask, train, want)
            if want:
                x, last_weights = out
            else:
                x = out
        if return_last_attn:
            return x, last_weights
        return x
