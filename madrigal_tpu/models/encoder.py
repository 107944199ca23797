"""MadrigalEncoder: the per-drug multimodal encoder.

TPU-native equivalent of the reference's NovelDDIEncoder
(reference: madrigal/models/models.py:607-899): four modality encoders ->
[B, NUM_MODALITIES, D] token stack -> missing-modality-masked transformer
fusion with optional tx attention bottlenecks; unimodal drugs bypass the
transformer through an MLP fuser (models.py:855-865).

Key TPU-first deviations (all masked-equivalent, SURVEY.md section 7.3):
  * uni/multimodal routing is select-based (`jnp.where`), not boolean
    indexing: both paths run for all rows, keeping shapes static.
  * drugs absent from the KG gather zeros instead of the reference's
    randn padding (models.py:734) -- deterministic and masked downstream.
  * the KG node table can be computed once per step and shared between the
    head/tail encodes (the reference re-runs full-KG message passing per
    encode call -- SURVEY.md section 3.1 hot loop).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import EncoderConfig
from ..constants import NUM_CELL_LINES
from ..data.batch import DrugModalityBatch
from ..data.kg import HeteroKGBatch
from .chemcpa import ChemCPAEncoder
from .decoder import BilinearDDIScorer
from .fusion import PositionEncoding, TransformerFusion, build_bottleneck_masks
from .gin import GINEncoder
from .hgt import HGTEncoder
from .mlp import MLPEncoder


def _l2_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """L2-normalize with torch F.normalize's eps clamp: all-zero rows
    (e.g. the explicitly-zeroed missing-KG token) stay zero instead of
    becoming NaN (which would survive masked attention: 0 * NaN = NaN)."""
    return x / jnp.maximum(
        jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12
    )


class MadrigalEncoder(nn.Module):
    cfg: EncoderConfig

    def setup(self):
        c = self.cfg
        if c.str_encoder == "gin":
            self.str_enc = GINEncoder(
                hidden_dims=tuple(c.gin.hidden_dims) + (c.feature_dim,),
                num_mlp_layer=c.gin.num_mlp_layer,
                eps_init=c.gin.eps,
                learn_eps=c.gin.learn_eps,
                batch_norm=c.gin.batch_norm,
                actn=c.gin.actn,
                readout=c.gin.readout,
                name="str_encoder",
            )
        elif c.str_encoder == "gat":
            from .gat import GATEncoder

            self.str_enc = GATEncoder(
                hidden_dims=tuple(c.gat.hidden_dims) + (c.feature_dim,),
                num_head=c.gat.att_heads,
                negative_slope=c.gat.negative_slope,
                batch_norm=c.gat.batch_norm,
                actn=c.gat.actn,
                readout=c.gat.readout,
                name="str_encoder",
            )
        else:
            raise NotImplementedError(c.str_encoder)

        if c.kg_encoder in ("hgt", "hgt_drug_edge_only"):
            self.kg_enc = HGTEncoder(
                cfg=c.hgt, embed_dim=c.feature_dim, drug_only_head=True,
                name="kg_encoder",
            )
        elif "han" in c.kg_encoder:
            from .kg_alt import HANEncoder

            self.kg_enc = HANEncoder(
                cfg=c.han, embed_dim=c.feature_dim, name="kg_encoder",
            )
        elif "rgcn" in c.kg_encoder:
            from .kg_alt import RGCNEncoder

            self.kg_enc = RGCNEncoder(
                hidden_dim=c.rgcn.hidden_dim, embed_dim=c.feature_dim,
                num_layers=c.rgcn.num_layers, num_bases=c.rgcn.num_bases,
                aggr=c.rgcn.aggr, actn=c.rgcn.actn, name="kg_encoder",
            )
        else:
            raise NotImplementedError(c.kg_encoder)

        self.cv_enc = MLPEncoder(
            hidden_dims=tuple(c.cv.hidden_dims),
            output_dim=c.feature_dim,
            dropout=c.cv.dropout,
            norm=c.cv.norm,
            actn=c.cv.actn,
            order=c.cv.order,
            name="cv_encoder",
        )
        self.extra_tabular_encs = {
            mod: MLPEncoder(
                hidden_dims=tuple(mc.hidden_dims),
                output_dim=c.feature_dim,
                dropout=mc.dropout,
                norm=mc.norm,
                actn=mc.actn,
                order=mc.order,
                name=f"tab_encoder_{mod}",
            )
            for mod, mc in c.extra_tabular.items()
        }

        if c.tx_encoder == "chemcpa":
            self.tx_enc = ChemCPAEncoder(cfg=c.chemcpa, name="tx_encoder")
        elif c.tx_encoder == "mlp":
            self.tx_enc = MLPEncoder(
                hidden_dims=tuple(c.tx_mlp.hidden_dims),
                output_dim=c.feature_dim,
                dropout=c.tx_mlp.dropout,
                norm=c.tx_mlp.norm,
                actn=c.tx_mlp.actn,
                order=c.tx_mlp.order,
                name="tx_encoder",
            )
        else:
            raise NotImplementedError(c.tx_encoder)

        num_bt = c.transformer.num_tx_bottlenecks
        if num_bt > 0:
            self.tx_bottleneck_tokens = self.param(
                "tx_bottleneck_tokens",
                nn.initializers.normal(stddev=1.0),
                (num_bt, c.feature_dim),
            )
        if c.transformer.agg == "cls":
            self.cls = self.param(
                "cls", nn.initializers.normal(stddev=1.0), (1, c.feature_dim)
            )

        self.pos_encoder = PositionEncoding(
            max_len=c.pos_emb_max_len,
            d_model=c.feature_dim,
            pe_type=c.pos_emb_type,
            dropout=c.pos_emb_dropout,
            name="pos_encoder",
        )
        # with cfg.transformer.remat the WHOLE fusion call rematerializes
        # (only its 128-wide inputs persist as backward residuals; the
        # 2048-latent internals recompute) -- same param tree either way
        fusion_cls = (
            nn.remat(TransformerFusion, static_argnums=(4, 5))
            if getattr(c.transformer, "remat", False) else TransformerFusion
        )
        self.transformer = fusion_cls(
            cfg=c.transformer,
            embed_dim=c.feature_dim,
            num_kv_tokens=c.num_modalities + num_bt,
            num_non_tx=c.num_non_tx_modalities,
            name="transformer",
        )
        self.uni_projector = MLPEncoder(
            hidden_dims=tuple(c.proj.hidden_dims),
            output_dim=c.feature_dim,
            dropout=c.proj.dropout,
            norm=c.proj.norm,
            actn=c.proj.actn,
            order=c.proj.order,
            name="uni_projector",
        )
        if c.fusion == "transformer_uni_proj":
            self.uni_fuser = MLPEncoder(
                hidden_dims=tuple(c.proj.hidden_dims),
                output_dim=c.feature_dim,
                dropout=c.proj.dropout,
                norm=c.proj.norm,
                actn=c.proj.actn,
                order=c.proj.order,
                name="uni_fuser",
            )

    def kg_drug_table(self, kg: HeteroKGBatch, *, train: bool = False):
        """Run full-KG message passing once; returns the drug-node embedding
        table [N_kg_drugs, D]. Reference: models.py:727-729."""
        return self.kg_enc(kg, train=train)["drug"]

    def modality_tokens(
        self,
        batch: DrugModalityBatch,
        kg: Optional[HeteroKGBatch] = None,
        kg_drug_table=None,
        *,
        train: bool = False,
    ):
        """Compute the [B, NUM_MODALITIES, D] per-modality token stack
        (reference: models.py:717-775)."""
        c = self.cfg
        str_out, _ = self.str_enc(batch.mols, train=train)

        if kg_drug_table is None:
            assert kg is not None, "need kg batch or precomputed drug table"
            kg_drug_table = self.kg_drug_table(kg, train=train)
        rows = jnp.clip(batch.kg_rows, 0, kg_drug_table.shape[0] - 1)
        kg_out = kg_drug_table[rows]
        kg_out = jnp.where((batch.kg_rows >= 0)[:, None], kg_out, 0.0)

        cv_out = self.cv_enc(batch.cv, train=train)
        extra_out = [
            self.extra_tabular_encs[mod](batch.extra_tabular[mod], train=train)
            for mod in sorted(self.extra_tabular_encs)
        ]

        C = batch.tx_sigs.shape[0]
        B = batch.batch_size
        if c.tx_encoder == "chemcpa":
            genes = batch.tx_sigs.reshape(C * B, -1)
            cov_idx = jnp.repeat(jnp.arange(C, dtype=jnp.int32), B)
            drugs_idx = jnp.tile(batch.drugs, (C,)) if c.chemcpa.use_drugs else None
            dosages = batch.tx_dosages.reshape(C * B) if c.chemcpa.use_drugs else None
            tx_latent = self.tx_enc(
                genes, cov_idx, drugs_idx, dosages, train=train,
                return_basal=c.use_tx_basal,
            )
            tx_tokens = tx_latent.reshape(C, B, -1)
        else:
            tx_tokens = self.tx_enc(batch.tx_sigs, train=train)

        tokens = jnp.stack(
            [str_out, kg_out, cv_out] + extra_out + list(tx_tokens), axis=1
        )
        return tokens

    def __call__(self, batch, kg=None, kg_drug_table=None, *, train=False,
                 raw_encoder_output=False):
        return self.encode(
            batch, kg, kg_drug_table, train=train,
            raw_encoder_output=raw_encoder_output,
        )

    def encode(
        self,
        batch: DrugModalityBatch,
        kg: Optional[HeteroKGBatch] = None,
        kg_drug_table=None,
        *,
        train: bool = False,
        raw_encoder_output: bool = False,
        return_attention: bool = False,
    ):
        """Fused drug embedding z [B, D].

        raw_encoder_output=True returns the projected single-available-
        modality embedding per drug (the contrastive-learning path,
        reference models.py:890-895; masks must select exactly one modality
        per row, as in pretrain_mode='str_center_uni').
        """
        all_embeds = self.modality_tokens(
            batch, kg, kg_drug_table, train=train
        )
        return self.fuse_tokens(
            all_embeds, batch.masks, train=train,
            raw_encoder_output=raw_encoder_output,
            return_attention=return_attention,
        )

    def fuse_tokens(
        self,
        all_embeds,
        masks,
        *,
        train: bool = False,
        raw_encoder_output: bool = False,
        return_attention: bool = False,
    ):
        """Mask-dependent tail of `encode`: fuse a precomputed
        [B, NUM_MODALITIES, D] token stack under a modality mask.

        Split out so the device-table CL path (train/pretrain_cl.py
        device_table=True) can compute `modality_tokens` ONCE per step
        over the full drug table and fuse a gathered minibatch per view
        -- tokens are mask-independent, so one token pass serves both
        SimCLR views."""
        c = self.cfg

        if raw_encoder_output:
            avail = (~masks).astype(all_embeds.dtype)
            onehot = avail * (
                jnp.cumsum(avail, axis=1) == 1.0
            )  # first available modality
            uni = jnp.einsum("bm,bmd->bd", onehot, all_embeds)
            if c.normalize:
                uni = _l2_normalize(uni)
            return self.uni_projector(uni, train=train)

        if c.adapt_before_fusion:
            all_embeds = self.uni_projector(all_embeds, train=train)

        attn = None
        if c.fusion in ("transformer_uni_proj", "transformer"):
            seq = all_embeds
            fusion_mask = masks
            src_mask = None
            num_bt = c.transformer.num_tx_bottlenecks
            B = seq.shape[0]
            if num_bt > 0:
                bt = jnp.broadcast_to(
                    self.tx_bottleneck_tokens[None],
                    (B, num_bt, c.feature_dim),
                )
                n_nontx = c.num_non_tx_modalities
                seq = jnp.concatenate(
                    [seq[:, :n_nontx], bt, seq[:, n_nontx:]], axis=1
                )
                bt_mask = jnp.zeros((B, num_bt), dtype=bool)
                fusion_mask = jnp.concatenate(
                    [fusion_mask[:, :n_nontx], bt_mask, fusion_mask[:, n_nontx:]],
                    axis=1,
                )
                src_mask = jnp.asarray(
                    build_bottleneck_masks(
                        n_nontx, num_bt, NUM_CELL_LINES,
                        with_cls=(c.transformer.agg == "cls"),
                    )
                )
            if c.transformer.agg == "cls":
                cls_tok = jnp.broadcast_to(
                    self.cls[None], (B, 1, c.feature_dim)
                )
                seq = jnp.concatenate([cls_tok, seq], axis=1)
                fusion_mask = jnp.concatenate(
                    [jnp.zeros((B, 1), dtype=bool), fusion_mask], axis=1
                )
            if c.normalize:
                seq = _l2_normalize(seq)
            seq = self.pos_encoder(seq, train=train)
            if return_attention:
                # last-layer attention weights for analysis (the reference
                # captures them via forward hooks -- predict.py:643,
                # models.py:388-399)
                z_fusion, attn = self.transformer(
                    seq, fusion_mask, src_mask, train, True,
                )
            else:
                chunk = getattr(c, "fusion_batch_chunk", None)
                if chunk and B > chunk:
                    # per-drug sequences are independent: chunking the
                    # drug axis is exact and bounds the latent-width
                    # activation footprint (full-batch at reference
                    # scale). The optimization_barrier threads a data
                    # dependency between chunks -- without it XLA's
                    # scheduler runs ALL chunks' (re)computations
                    # concurrently and the memory win evaporates.
                    import jax

                    outs = []
                    carry = jnp.zeros((), seq.dtype)
                    for s in range(0, B, chunk):
                        cs, cm, _ = jax.lax.optimization_barrier(
                            (seq[s:s + chunk], fusion_mask[s:s + chunk],
                             carry)
                        )
                        out = self.transformer(cs, cm, src_mask, train,
                                               False)
                        carry = out[0, 0]
                        outs.append(out)
                    z_fusion = jnp.concatenate(outs, axis=0)
                else:
                    z_fusion = self.transformer(
                        seq, fusion_mask, src_mask, train, False
                    )

            if c.fusion == "transformer_uni_proj":
                avail = (~masks).astype(all_embeds.dtype)
                onehot = avail * (jnp.cumsum(avail, axis=1) == 1.0)
                uni = jnp.einsum("bm,bmd->bd", onehot, all_embeds)
                if c.normalize:
                    uni = _l2_normalize(uni)
                z_uni = self.uni_fuser(uni, train=train)
                is_multi = jnp.sum(~masks, axis=1) > 1
                z = jnp.where(is_multi[:, None], z_fusion, z_uni)
            else:
                z = z_fusion
        elif c.fusion == "mean":
            e = all_embeds
            if c.normalize:
                e = _l2_normalize(e)
            keep = (~masks).astype(e.dtype)[..., None]
            z = jnp.sum(e * keep, axis=1) / jnp.maximum(
                jnp.sum(keep, axis=1), 1.0
            )
        elif c.fusion == "add":
            e = all_embeds
            if c.normalize:
                e = _l2_normalize(e)
            z = jnp.sum(e * (~masks).astype(e.dtype)[..., None], axis=1)
        else:
            raise NotImplementedError(c.fusion)

        if return_attention:
            return z, attn
        return z


def _encoder_warmup(enc: "MadrigalEncoder", batch, kg):
    z = enc.encode(batch, kg=kg, train=False)
    z_raw = enc.encode(batch, kg=kg, raw_encoder_output=True, train=False)
    return z + z_raw


class MadrigalMultilabel(nn.Module):
    """Encoder + symmetric bilinear decoder
    (reference NovelDDIMultilabel, models.py:914-953)."""

    enc_cfg: EncoderConfig
    prediction_dim: int
    decoder_normalize: bool = False
    prediction_dim_single_drug: Optional[int] = None

    def setup(self):
        self.encoder = MadrigalEncoder(cfg=self.enc_cfg, name="encoder")
        self.decoder = BilinearDDIScorer(
            num_labels=self.prediction_dim,
            input_dim1=self.enc_cfg.feature_dim,
            input_dim2=self.enc_cfg.feature_dim,
            name="decoder",
        )
        if self.prediction_dim_single_drug:
            # single-drug side-effect head (ONSIDES path; reference
            # NovelDDIMultilabel use_single_drug, models.py:915-921 and the
            # [head, label] indexing at evaluate.py:219)
            self.single_drug_head = nn.Dense(
                self.prediction_dim_single_drug, name="single_drug_head"
            )

    def embed_pair(self, head, tail, kg, *, kg_drug_table=None, train=False):
        """Encode head and tail batches, sharing one KG message pass.

        `kg_drug_table` short-circuits the KG forward with a precomputed
        drug-node table -- the seam the graph-parallel training step uses
        to run the HGT edge-sharded (parallel/kg_shard.py) while the rest
        of the model stays on the plain GSPMD path."""
        if kg_drug_table is None:
            kg_drug_table = self.encoder.kg_drug_table(kg, train=train)
        z_head = self.encoder.encode(
            head, kg_drug_table=kg_drug_table, train=train)
        z_tail = self.encoder.encode(
            tail, kg_drug_table=kg_drug_table, train=train)
        if self.decoder_normalize:
            z_head = _l2_normalize(z_head)
            z_tail = _l2_normalize(z_tail)
        return z_head, z_tail

    def __call__(self, head, tail, kg, label_range=None, *, train=False):
        z_head, z_tail = self.embed_pair(head, tail, kg, train=train)
        return self.decoder.all_pairs(z_head, z_tail, label_range)

    def score_triples(self, head, tail, kg, head_idx, tail_idx, labels, *,
                      kg_drug_table=None, train=False, chunk_labels=None,
                      label_chunk: int = 0):
        """Triple-gather scoring: embeds unique heads/tails once, scores only
        the (label, head, tail) entries needed (SURVEY.md section 7.3).
        chunk_labels/label_chunk select the label-chunked triple layout
        (see decoder.triples)."""
        z_head, z_tail = self.embed_pair(
            head, tail, kg, kg_drug_table=kg_drug_table, train=train)
        return self.decoder.triples(
            z_head[head_idx], z_tail[tail_idx], labels,
            chunk_labels=chunk_labels, label_chunk=label_chunk)

    def score_single_drug(self, batch, kg, *, train=False):
        """[N, L_single] single-drug side-effect logits."""
        table = self.encoder.kg_drug_table(kg, train=train)
        z = self.encoder.encode(batch, kg_drug_table=table, train=train)
        return self.single_drug_head(z)

    def warmup(self, head, tail, kg):
        """Trace every parameterized path for full flax init.

        Uses the triple-gather decode (one (0, 0, 0) triple) rather than
        all_pairs: init must not materialize the [L, N, N] score tensor --
        at reference scale (L=960, N=6843) that is a 181 GB allocation.
        """
        z = _encoder_warmup(self.encoder, head, kg)
        scores = self.decoder.triples(
            z[:1], z[:1], jnp.zeros((1,), jnp.int32)
        )
        total = jnp.sum(scores)
        if self.prediction_dim_single_drug:
            total = total + jnp.sum(self.single_drug_head(z))
        return total


def init_multilabel(model: MadrigalMultilabel, rng, head, tail, kg):
    """Initialize the complete variable tree (params + batch_stats).

    Jitted: eager flax init dispatches hundreds of sub-second compiles
    (below the persistent-cache threshold, so they re-compile every
    process); one fused program is both faster cold and a cache hit
    warm. Batches/kg are jit ARGUMENTS (closure constants would be
    serialized into the compile payload -- see CLAUDE.md)."""
    return jax.jit(
        lambda r, h, t, k: model.init(
            r, h, t, k, method=MadrigalMultilabel.warmup)
    )(rng, head, tail, kg)


def init_encoder(model: MadrigalEncoder, rng, batch, kg):
    return jax.jit(
        lambda r, b, k: model.init(
            r, b, k, method=lambda m, b_, k_: _encoder_warmup(m, b_, k_))
    )(rng, batch, kg)
