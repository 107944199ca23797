"""SimCLR contrastive model for cross-modality alignment.

TPU-native equivalent of the reference's SimCLR_NovelDDI
(reference: madrigal/models/simclr.py:11-141): the shared MadrigalEncoder
encodes the same drugs under two modality-subset masks; one or two
2-layer predictor MLPs (BN, bias-free, affine-free final BN) project the
views; InfoNCE with diagonal masking and optional too-hard-negative
masking scores the 2Bx2B similarity matrix.
"""
from __future__ import annotations

import flax.linen as nn

from ..config import EncoderConfig
from ..train.losses import info_nce
from .encoder import MadrigalEncoder, _encoder_warmup
from .mlp import SimCLRPredictor


class SimCLRModel(nn.Module):
    enc_cfg: EncoderConfig
    mlp_dim: int = 512
    temperature: float = 0.1
    shared_predictor: bool = False
    raw_encoder_output: bool = False

    def setup(self):
        self.base_encoder = MadrigalEncoder(cfg=self.enc_cfg,
                                            name="base_encoder")
        dim = self.enc_cfg.feature_dim
        if self.shared_predictor:
            self.predictor = SimCLRPredictor(
                mlp_dim=self.mlp_dim, output_dim=dim, name="predictor"
            )
        else:
            self.predictor_1 = SimCLRPredictor(
                mlp_dim=self.mlp_dim, output_dim=dim, name="predictor_1"
            )
            self.predictor_2 = SimCLRPredictor(
                mlp_dim=self.mlp_dim, output_dim=dim, name="predictor_2"
            )

    def __call__(self, batch, kg, mask1, mask2, too_hard_neg_mask=None, *,
                 kg_drug_table=None, ids=None, train: bool = False):
        """Returns (aug1, aug2, (logits, labels, loss))
        (reference simclr.py:110-140).

        `kg_drug_table` short-circuits the KG forward with a precomputed
        drug-node table (the graph-parallel training seam,
        parallel/kg_shard.py).

        `ids` is the device-table CL path (train/pretrain_cl.py
        device_table=True): `batch` is the FULL device-resident drug
        table, the per-step minibatch is `ids` (a [B] gather), and ONE
        modality-token pass over the table serves both views (tokens are
        mask-independent; the views differ only at the fuse/select
        stage, which runs per view on the gathered rows). This replaces
        the reference's per-step DataLoader collate (parse_args.py:109,
        a many-worker CPU pool) with a device gather -- the host sends
        ~KBs (ids + masks) per step instead of re-packing molecules and
        re-slicing the tx table."""
        import dataclasses

        table = (kg_drug_table if kg_drug_table is not None
                 else self.base_encoder.kg_drug_table(kg, train=train))
        if ids is not None:
            tokens = self.base_encoder.modality_tokens(
                batch, kg_drug_table=table, train=train
            )[ids]
            z1 = self.base_encoder.fuse_tokens(
                tokens, mask1, train=train,
                raw_encoder_output=self.raw_encoder_output,
            )
            z2 = self.base_encoder.fuse_tokens(
                tokens, mask2, train=train,
                raw_encoder_output=self.raw_encoder_output,
            )
        else:
            b1 = dataclasses.replace(batch, masks=mask1)
            b2 = dataclasses.replace(batch, masks=mask2)
            z1 = self.base_encoder.encode(
                b1, kg_drug_table=table, train=train,
                raw_encoder_output=self.raw_encoder_output,
            )
            z2 = self.base_encoder.encode(
                b2, kg_drug_table=table, train=train,
                raw_encoder_output=self.raw_encoder_output,
            )
        if self.shared_predictor:
            aug1 = self.predictor(z1, train=train)
            aug2 = self.predictor(z2, train=train)
        else:
            aug1 = self.predictor_1(z1, train=train)
            aug2 = self.predictor_2(z2, train=train)
        logits, labels, loss = info_nce(
            aug1, aug2, self.temperature, too_hard_neg_mask
        )
        return aug1, aug2, (logits, labels, loss)

    def warmup(self, batch, kg, mask1, mask2):
        _, _, (_, _, loss) = self(batch, kg, mask1, mask2, train=False)
        # also touch the raw path + uni projector for full init
        return loss + _encoder_warmup(self.base_encoder, batch, kg).sum()
