"""chemCPA transcriptomics encoder (TxAdaptingComPert).

TPU-native re-implementation of the reference's vendored chemCPA model
(reference: madrigal/chemcpa/chemCPA/model.py:290-712). The Madrigal hot
path is `predict(..., return_latent_treated=True)` which produces the 128-d
tx token per (drug, cell line) (models/models.py:753-769); the full
autoencoder decode + GaussianNLL reconstruction and the dose-response
machinery are implemented for stage-1 adaptation training
(modality_pretraining/tx/sweep.py).

Flagship config (configs/chemcpa/chemcpa_finetune_configs.yaml):
use_drugs=False, doser_type='amortized', encoder [978,512,512,128] with BN.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..config import ChemCPAConfig
from .mlp import ChemCPAMLP


class GeneralizedSigmoid(nn.Module):
    """Dose-response curve (model.py:234-287). nonlin in {sigm, logsigm, None}."""

    dim: int
    nonlin: Optional[str] = "sigm"

    @nn.compact
    def __call__(self, x, idx=None):
        if self.nonlin not in ("sigm", "logsigm"):
            return x
        beta = self.param("beta", nn.initializers.ones, (1, self.dim))
        bias = self.param("bias", nn.initializers.zeros, (1, self.dim))
        xin = jnp.log1p(x) if self.nonlin == "logsigm" else x
        if idx is None:
            c0 = nn.sigmoid(bias)
            return nn.sigmoid(xin * beta + bias) - c0
        b = bias[0][idx]
        w = beta[0][idx]
        c0 = nn.sigmoid(b)
        return nn.sigmoid(xin * w + b) - c0


class ChemCPAEncoder(nn.Module):
    """TxAdaptingComPert forward paths."""

    cfg: ChemCPAConfig

    def setup(self):
        c = self.cfg
        self.encoder = ChemCPAMLP(
            sizes=[c.num_genes]
            + [c.autoencoder_width] * c.autoencoder_depth
            + [c.dim],
            name="encoder",
        )
        self.decoder = ChemCPAMLP(
            sizes=[c.dim]
            + [c.autoencoder_width] * c.autoencoder_depth
            + [c.num_genes * 2],
            last_layer_act=c.decoder_activation,
            name="decoder",
        )
        self.covariates_embedding = nn.Embed(
            c.num_covariates, c.dim, name="cov_embedding"
        )
        if c.use_drugs:
            self.drug_embeddings = nn.Embed(
                c.num_drugs, c.drug_embedding_dim, name="drug_embeddings"
            )
            self.drug_embedding_encoder = ChemCPAMLP(
                sizes=[c.drug_embedding_dim]
                + [c.embedding_encoder_width] * c.embedding_encoder_depth
                + [c.dim],
                name="drug_embedding_encoder",
            )
            if c.doser_type == "amortized":
                self.dosers = ChemCPAMLP(
                    sizes=[c.drug_embedding_dim + 1]
                    + [c.dosers_width] * c.dosers_depth
                    + [1],
                    name="dosers",
                )
            elif c.doser_type in ("sigm", "logsigm"):
                self.dosers = GeneralizedSigmoid(
                    dim=c.num_drugs, nonlin=c.doser_type, name="dosers"
                )
            elif c.doser_type is not None:
                raise NotImplementedError(c.doser_type)
        # adversaries (stage-1 training only; reference model.py:368-376,442-451)
        if not c.disable_adv:
            self.adversary_covariates = ChemCPAMLP(
                sizes=[c.dim]
                + [c.adversary_width] * c.adversary_depth
                + [c.num_covariates],
                name="adversary_covariates",
            )
            if c.use_drugs:
                self.adversary_drugs = ChemCPAMLP(
                    sizes=[c.dim]
                    + [c.adversary_width] * c.adversary_depth
                    + [c.num_drugs],
                    name="adversary_drugs",
                )

    def compute_drug_embeddings(self, drugs_idx, dosages, *, train=False):
        """Dose-scaled drug embedding (model.py:575-653)."""
        c = self.cfg
        latent_drugs = self.drug_embeddings(drugs_idx)  # [B, emb]
        if c.doser_type == "amortized":
            inp = jnp.concatenate([latent_drugs, dosages[:, None]], axis=1)
            scaled = self.dosers(inp, train=train)[:, 0]
        elif c.doser_type in ("sigm", "logsigm"):
            scaled = self.dosers(dosages, idx=drugs_idx)
        else:
            scaled = dosages
        latent = self.drug_embedding_encoder(latent_drugs, train=train)
        return scaled[:, None] * latent

    def latent_basal(self, genes, *, train=False):
        return self.encoder(genes, train=train)

    def __call__(self, genes, covariate_idx, drugs_idx=None, dosages=None, *,
                 train: bool = False, return_basal: bool = False):
        """predict() latent path (model.py:655-712).

        genes: [B, num_genes]; covariate_idx: [B] int cell-line index.
        Returns latent_treated [B, dim] (or latent_basal with return_basal).
        """
        latent = self.latent_basal(genes, train=train)
        if return_basal:
            return latent
        if self.cfg.use_drugs:
            latent = latent + self.compute_drug_embeddings(
                drugs_idx, dosages, train=train
            )
        latent = latent + self.covariates_embedding(covariate_idx)
        return latent

    def reconstruct(self, genes, covariate_idx, drugs_idx=None, dosages=None, *,
                    train: bool = False):
        """Full autoencoder output: (mean, var) of gene reconstruction
        (model.py:698-704)."""
        latent = self(genes, covariate_idx, drugs_idx, dosages, train=train)
        recon = self.decoder(latent, train=train)
        dim = recon.shape[-1] // 2
        mean = recon[..., :dim]
        var = nn.softplus(recon[..., dim:])
        return mean, var


    def warmup(self, genes, covariate_idx, drugs_idx=None, dosages=None):
        """Touch every parameterized path so flax init creates the full
        parameter surface (encoder, decoder, dosers, embeddings,
        adversaries)."""
        mean, var = self.reconstruct(
            genes, covariate_idx, drugs_idx, dosages, train=False
        )
        outs = [jnp.sum(mean) + jnp.sum(var)]
        if not self.cfg.disable_adv:
            basal = self.latent_basal(genes)
            outs.append(jnp.sum(self.adversary_covariates(basal)))
            if self.cfg.use_drugs:
                outs.append(jnp.sum(self.adversary_drugs(basal)))
        return sum(outs)


def gaussian_nll_loss(mean, var, target, eps: float = 1e-6):
    """torch.nn.GaussianNLLLoss semantics (full=False, reduction=mean)."""
    var = jnp.maximum(var, eps)
    return 0.5 * jnp.mean(jnp.log(var) + (target - mean) ** 2 / var)
