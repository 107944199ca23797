"""Fusion-transformer parity vs a torch fixture built exactly like the
reference TransformerFusion (madrigal/models/models.py:352-455): torch
nn.TransformerEncoder with key-padding + structure masks, plus the
Zorro-style x-attn pooling head."""
import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax.numpy as jnp

from madrigal_tpu.config import FusionConfig
from madrigal_tpu.interop.torch_convert import convert_transformer_fusion
from madrigal_tpu.models.fusion import (
    TransformerFusion,
    build_bottleneck_masks,
    sinusoidal_pe,
)

NUM_MOD = 19  # 3 non-tx + 16 cell lines
NUM_NON_TX = 3
NUM_TX = 16


class TorchFusionFixture(tnn.Module):
    """Faithful reconstruction of the reference fusion layer stack."""

    def __init__(self, embed_dim, num_bt, nlayers, nheads, head_dim, ffn,
                 norm_first, agg):
        super().__init__()
        self.agg = agg
        self.norm_first = norm_first
        latent = nheads * head_dim
        self.embed2latent = tnn.Linear(embed_dim, latent)
        layer = tnn.TransformerEncoderLayer(
            d_model=latent, nhead=nheads, dim_feedforward=ffn, dropout=0.0,
            activation="gelu", norm_first=norm_first, batch_first=True,
        )
        self.transformer_encoder = tnn.TransformerEncoder(
            layer, num_layers=nlayers, enable_nested_tensor=False
        )
        self.latent2embed = tnn.Linear(latent, embed_dim)
        if agg == "x-attn":
            self.x_attn_kv_norm = tnn.LayerNorm(latent)
            self.x_attn_query_norm = tnn.LayerNorm(latent)
            self.x_attn_mha_layer = tnn.MultiheadAttention(
                embed_dim=latent, num_heads=nheads, dropout=0.0,
                batch_first=True,
            )
            self.x_attn_query = tnn.Parameter(torch.randn(1, latent))
            kpm = torch.zeros(1, NUM_MOD + num_bt, dtype=torch.bool)
            if num_bt > 0:
                kpm[:, :NUM_NON_TX] = True
                kpm[:, -NUM_TX:] = True
            self.register_buffer("x_attn_key_padding_mask", kpm)

    def forward(self, seq, fusion_mask, src_mask=None):
        b = seq.shape[0]
        h = self.embed2latent(seq)
        h = self.transformer_encoder(
            src=h, src_key_padding_mask=fusion_mask, mask=src_mask
        )
        if self.agg == "x-attn":
            q = self.x_attn_query.repeat(b, 1, 1)
            kpm = self.x_attn_key_padding_mask.repeat(b, 1)
            h = self.x_attn_kv_norm(h)
            if self.norm_first:
                q = self.x_attn_query_norm(q)
            out = self.x_attn_mha_layer(
                query=q, key=h, value=h, key_padding_mask=kpm,
                need_weights=True, average_attn_weights=False,
            )[0]
            out = out + q
            if not self.norm_first:
                out = self.x_attn_query_norm(out)
            return self.latent2embed(out)[:, 0, :]
        h = self.latent2embed(h)
        if self.agg == "cls":
            return h[:, 0, :]
        raise NotImplementedError


def make_masks(rng, b, seq_len, guarantee_avail=2):
    m = rng.rand(b, seq_len) < 0.5
    for i in range(b):
        avail = rng.choice(seq_len, size=guarantee_avail, replace=False)
        m[i, avail] = False
    return m


@pytest.mark.parametrize(
    "agg,num_bt,norm_first",
    [("x-attn", 2, True), ("x-attn", 0, False), ("cls", 2, True),
     ("cls", 0, False)],
)
def test_fusion_parity(agg, num_bt, norm_first, rng):
    torch.manual_seed(3)
    embed_dim, nlayers, nheads, head_dim, ffn = 32, 2, 4, 16, 48
    tmod = TorchFusionFixture(
        embed_dim, num_bt, nlayers, nheads, head_dim, ffn, norm_first, agg
    )
    tmod.eval()

    seq_len = NUM_MOD + num_bt + (1 if agg == "cls" else 0)
    b = 6
    # token sequence already assembled (bottlenecks/CLS included); modality
    # masks: bottleneck + CLS positions always available
    seq = rng.randn(b, seq_len, embed_dim).astype(np.float32)
    mask = make_masks(rng, b, seq_len)
    offset = (1 if agg == "cls" else 0)
    mask[:, :offset] = False  # CLS available
    if num_bt:
        mask[:, offset + NUM_NON_TX : offset + NUM_NON_TX + num_bt] = False

    src_mask = None
    if num_bt:
        src_mask = build_bottleneck_masks(
            NUM_NON_TX, num_bt, NUM_TX, with_cls=(agg == "cls")
        )

    with torch.no_grad():
        ref = tmod(
            torch.from_numpy(seq),
            torch.from_numpy(mask),
            torch.from_numpy(src_mask) if src_mask is not None else None,
        ).numpy()

    cfg = FusionConfig(
        num_layers=nlayers, att_heads=nheads, head_dim=head_dim, ffn_dim=ffn,
        dropout=0.0, actn="gelu", norm_first=norm_first, agg=agg,
        num_tx_bottlenecks=num_bt,
    )
    model = TransformerFusion(
        cfg=cfg, embed_dim=embed_dim, num_kv_tokens=NUM_MOD + num_bt,
        num_non_tx=NUM_NON_TX,
    )
    sd = tmod.state_dict()
    params = convert_transformer_fusion(sd, nlayers, agg)
    out = model.apply(
        {"params": params},
        jnp.asarray(seq), jnp.asarray(mask),
        jnp.asarray(src_mask) if src_mask is not None else None,
        train=False,
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)


def test_sinusoidal_matches_reference_formula():
    pe = sinusoidal_pe(19, 32)[0]
    import math
    # spot check position 3, dims 0/1
    div0 = math.exp(0.0)
    assert abs(pe[3, 0] - math.sin(3 * div0)) < 1e-6
    assert abs(pe[3, 1] - math.cos(3 * div0)) < 1e-6


def test_bilinear_decoder_parity(rng):
    """Symmetric bilinear scorer vs torch reference math
    (models.py:522-547): W.triu() + W.triu(1).T, z1 @ W @ z2.T."""
    from madrigal_tpu.models.decoder import BilinearDDIScorer

    L, D, N1, N2 = 7, 16, 5, 4
    w = rng.randn(L, D, D).astype(np.float32)
    z1 = rng.randn(N1, D).astype(np.float32)
    z2 = rng.randn(N2, D).astype(np.float32)

    tw = torch.from_numpy(w)
    tsym = tw.triu() + tw.triu(1).transpose(-1, -2)
    ref = torch.matmul(torch.matmul(torch.from_numpy(z1), tsym),
                       torch.from_numpy(z2).T).numpy()

    dec = BilinearDDIScorer(num_labels=L, input_dim1=D, input_dim2=D)
    params = {"weight": jnp.asarray(w)}
    out = dec.apply({"params": params}, jnp.asarray(z1), jnp.asarray(z2))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)

    # label_range slicing (predict.py:420-424 chunked scoring)
    out_r = dec.apply({"params": params}, jnp.asarray(z1), jnp.asarray(z2),
                      (2, 5))
    np.testing.assert_allclose(np.asarray(out_r), ref[2:5], atol=1e-5,
                               rtol=1e-5)

    # triple gather path == dense fancy-index
    labels = np.array([0, 3, 6, 2], dtype=np.int32)
    hi = np.array([0, 1, 2, 4], dtype=np.int32)
    ti = np.array([1, 0, 3, 2], dtype=np.int32)
    trip = dec.apply(
        {"params": params}, jnp.asarray(z1)[hi], jnp.asarray(z2)[ti],
        jnp.asarray(labels), method=BilinearDDIScorer.triples,
    )
    np.testing.assert_allclose(
        np.asarray(trip), ref[labels, hi, ti], atol=1e-5, rtol=1e-5
    )

    # in-chunk gather path (stage-1 link-pred arena scoring): identical
    # to pre-gathered triples, including through the scan (chunk < T)
    trip_ix = dec.apply(
        {"params": params}, jnp.asarray(z1), jnp.asarray(hi),
        jnp.asarray(ti), jnp.asarray(labels),
        method=BilinearDDIScorer.triples_indexed, chunk=3,
    )
    ref_ix = dec.apply(
        {"params": params}, jnp.asarray(z1)[hi], jnp.asarray(z1)[ti],
        jnp.asarray(labels), method=BilinearDDIScorer.triples,
    )
    np.testing.assert_allclose(np.asarray(trip_ix), np.asarray(ref_ix),
                               atol=1e-5, rtol=1e-5)

    # num_labels == 1 fast path (shared [D, D] weight, no per-triple
    # weight gather)
    dec1 = BilinearDDIScorer(num_labels=1, input_dim1=D, input_dim2=D)
    params1 = {"weight": jnp.asarray(w[:1])}
    one = dec1.apply(
        {"params": params1}, jnp.asarray(z1), jnp.asarray(hi),
        jnp.asarray(ti), jnp.zeros_like(jnp.asarray(labels)),
        method=BilinearDDIScorer.triples_indexed, chunk=3,
    )
    ref1 = (z1 @ np.asarray(tsym[0]) @ z1.T)[hi, ti]
    np.testing.assert_allclose(np.asarray(one), ref1, atol=1e-5, rtol=1e-5)


def test_fusion_remat_matches(rng):
    """FusionConfig.remat changes memory, not numerics (fwd + grads)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from madrigal_tpu.config import FusionConfig
    from madrigal_tpu.models.fusion import TransformerFusion

    cfg = FusionConfig(num_layers=2, att_heads=2, head_dim=8, ffn_dim=32,
                       dropout=0.0, norm_first=True, agg="x-attn",
                       num_tx_bottlenecks=2)
    cfg_r = dataclasses.replace(cfg, remat=True)
    # 'dots' policy: save Dense outputs, recompute attention/elementwise
    # only -- a scheduling knob, never a numerics one
    cfg_rp = dataclasses.replace(cfg, remat=True, remat_policy="dots")
    # 'all' (everything_saveable): zero backward recompute inside the
    # checkpointed-layer structure (compile-helper-safe remat-off)
    cfg_ra = dataclasses.replace(cfg, remat=True, remat_policy="all")
    S = NUM_MOD + 2
    kwargs = dict(embed_dim=16, num_kv_tokens=S, num_non_tx=3)
    m1 = TransformerFusion(cfg=cfg, **kwargs)
    m2 = TransformerFusion(cfg=cfg_r, **kwargs)
    m3 = TransformerFusion(cfg=cfg_rp, **kwargs)
    m4 = TransformerFusion(cfg=cfg_ra, **kwargs)
    x = jnp.asarray(rng.randn(4, S, 16).astype(np.float32))
    kpm = jnp.asarray(rng.rand(4, S) < 0.3)
    v = m1.init(jax.random.PRNGKey(0), x, kpm, train=False)
    o1 = m1.apply(v, x, kpm, train=False)
    o2 = m2.apply(v, x, kpm, train=False)  # identical param tree
    o3 = m3.apply(v, x, kpm, train=False)
    o4 = m4.apply(v, x, kpm, train=False)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o4), atol=1e-6)

    g1 = jax.grad(lambda v: jnp.sum(m1.apply(v, x, kpm, train=False) ** 2))(v)
    g2 = jax.grad(lambda v: jnp.sum(m2.apply(v, x, kpm, train=False) ** 2))(v)
    g3 = jax.grad(lambda v: jnp.sum(m3.apply(v, x, kpm, train=False) ** 2))(v)
    g4 = jax.grad(lambda v: jnp.sum(m4.apply(v, x, kpm, train=False) ** 2))(v)
    for a, b, c, d in zip(jax.tree_util.tree_leaves(g1),
                          jax.tree_util.tree_leaves(g2),
                          jax.tree_util.tree_leaves(g3),
                          jax.tree_util.tree_leaves(g4)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-5)
        np.testing.assert_allclose(np.asarray(a), np.asarray(d), atol=1e-5)


def test_fusion_bf16_compute_close_to_f32(rng):
    """FusionConfig.compute_dtype='bfloat16' (attention/FFN activations in
    bf16; params, LayerNorms, softmax, residual stream f32) stays close to
    the f32 path and keeps f32 outputs + finite grads."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from madrigal_tpu.config import FusionConfig
    from madrigal_tpu.models.fusion import TransformerFusion

    cfg = FusionConfig(num_layers=2, att_heads=2, head_dim=8, ffn_dim=32,
                       dropout=0.0, norm_first=True, agg="x-attn",
                       num_tx_bottlenecks=2)
    cfg_b = dataclasses.replace(cfg, compute_dtype="bfloat16")
    S = NUM_MOD + 2
    kwargs = dict(embed_dim=16, num_kv_tokens=S, num_non_tx=3)
    m1 = TransformerFusion(cfg=cfg, **kwargs)
    m2 = TransformerFusion(cfg=cfg_b, **kwargs)
    x = jnp.asarray(rng.randn(4, S, 16).astype(np.float32))
    kpm = jnp.asarray(rng.rand(4, S) < 0.3)
    v = m1.init(jax.random.PRNGKey(0), x, kpm, train=False)
    o1 = np.asarray(m1.apply(v, x, kpm, train=False))
    o2 = np.asarray(m2.apply(v, x, kpm, train=False))
    assert o2.dtype == np.float32
    scale = np.abs(o1).max()
    assert np.abs(o1 - o2).max() < 0.05 * scale

    g = jax.grad(lambda v: jnp.sum(m2.apply(v, x, kpm, train=False) ** 2))(v)
    for leaf in jax.tree_util.tree_leaves(g):
        a = np.asarray(leaf)
        assert np.all(np.isfinite(a))
        assert a.dtype == np.float32  # grads land in param dtype
