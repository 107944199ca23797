"""chemCPA transcriptomics-encoder parity vs a torch fixture rebuilding the
reference TxAdaptingComPert predict path (chemCPA/model.py:290-712)."""
import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from madrigal_tpu.config import ChemCPAConfig
from madrigal_tpu.interop.torch_convert import convert_chemcpa
from madrigal_tpu.models.chemcpa import ChemCPAEncoder, gaussian_nll_loss


def torch_chemcpa_mlp(sizes, batch_norm=True):
    layers = []
    for s in range(len(sizes) - 1):
        layers += [
            tnn.Linear(sizes[s], sizes[s + 1]),
            tnn.BatchNorm1d(sizes[s + 1])
            if batch_norm and s < len(sizes) - 2 else None,
            tnn.ReLU(),
        ]
    layers = [l for l in layers if l is not None][:-1]
    return tnn.Sequential(*layers)


class TorchChemCPAFixture(tnn.Module):
    def __init__(self, num_genes, dim, width, depth, num_cov, use_drugs,
                 num_drugs=0, demb=32, eew=24, eed=2, dw=16, dd=2):
        super().__init__()
        self.use_drugs = use_drugs
        self.encoder = tnn.Module()
        self.encoder.network = torch_chemcpa_mlp(
            [num_genes] + [width] * depth + [dim]
        )
        self.decoder = tnn.Module()
        self.decoder.network = torch_chemcpa_mlp(
            [dim] + [width] * depth + [num_genes * 2]
        )
        self.cov_embedding = tnn.Embedding(num_cov, dim)
        if use_drugs:
            self.drug_embeddings = tnn.Embedding(num_drugs, demb)
            self.drug_embedding_encoder = tnn.Module()
            self.drug_embedding_encoder.network = torch_chemcpa_mlp(
                [demb] + [eew] * eed + [dim]
            )
            self.dosers = tnn.Module()
            self.dosers.network = torch_chemcpa_mlp(
                [demb + 1] + [dw] * dd + [1]
            )

    def predict_latent(self, genes, cov_idx, drugs_idx=None, dosages=None):
        latent = self.encoder.network(genes)
        if self.use_drugs:
            emb = self.drug_embeddings(drugs_idx)
            scaled = self.dosers.network(
                torch.cat([emb, dosages[:, None]], dim=1)
            ).squeeze(-1)
            latent = latent + scaled[:, None] * \
                self.drug_embedding_encoder.network(emb)
        latent = latent + self.cov_embedding(cov_idx)
        return latent

    def reconstruct(self, genes, cov_idx, drugs_idx=None, dosages=None):
        latent = self.predict_latent(genes, cov_idx, drugs_idx, dosages)
        recon = self.decoder.network(latent)
        dim = recon.shape[1] // 2
        return recon[:, :dim], torch.nn.functional.softplus(recon[:, dim:])


def flat_sd(mod):
    return {k: v for k, v in mod.state_dict().items()}


@pytest.mark.parametrize("use_drugs", [False, True])
def test_chemcpa_latent_parity(use_drugs, rng):
    torch.manual_seed(5)
    num_genes, dim, width, depth, num_cov = 40, 16, 32, 2, 5
    tmod = TorchChemCPAFixture(num_genes, dim, width, depth, num_cov,
                               use_drugs, num_drugs=7)
    tmod.eval()

    B = 6
    genes = rng.randn(B, num_genes).astype(np.float32)
    cov = rng.randint(0, num_cov, B)
    drugs = rng.randint(0, 7, B)
    dosages = rng.rand(B).astype(np.float32)

    with torch.no_grad():
        ref = tmod.predict_latent(
            torch.from_numpy(genes), torch.from_numpy(cov),
            torch.from_numpy(drugs) if use_drugs else None,
            torch.from_numpy(dosages) if use_drugs else None,
        ).numpy()
        ref_mean, ref_var = tmod.reconstruct(
            torch.from_numpy(genes), torch.from_numpy(cov),
            torch.from_numpy(drugs) if use_drugs else None,
            torch.from_numpy(dosages) if use_drugs else None,
        )

    cfg = ChemCPAConfig(
        num_genes=num_genes, dim=dim, autoencoder_width=width,
        autoencoder_depth=depth, num_covariates=num_cov, use_drugs=use_drugs,
        num_drugs=7, drug_embedding_dim=32, embedding_encoder_width=24,
        embedding_encoder_depth=2, dosers_width=16, dosers_depth=2,
    )
    model = ChemCPAEncoder(cfg=cfg)
    sd = flat_sd(tmod)
    params, stats = convert_chemcpa(
        sd, sd["cov_embedding.weight"], encoder_depth=depth,
        embedding_encoder_depth=2, dosers_depth=2, use_drugs=use_drugs,
        drug_embedding_weight=sd.get("drug_embeddings.weight"),
    )
    variables = {"params": params, "batch_stats": stats}
    out = model.apply(
        variables, jnp.asarray(genes), jnp.asarray(cov),
        jnp.asarray(drugs) if use_drugs else None,
        jnp.asarray(dosages) if use_drugs else None,
        train=False,
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)

    mean, var = model.apply(
        variables, jnp.asarray(genes), jnp.asarray(cov),
        jnp.asarray(drugs) if use_drugs else None,
        jnp.asarray(dosages) if use_drugs else None,
        train=False, method=ChemCPAEncoder.reconstruct,
    )
    np.testing.assert_allclose(np.asarray(mean), ref_mean.numpy(), atol=2e-5,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(var), ref_var.numpy(), atol=2e-5,
                               rtol=1e-4)


def test_gaussian_nll_matches_torch(rng):
    mean = rng.randn(8, 10).astype(np.float32)
    var = np.abs(rng.randn(8, 10)).astype(np.float32) + 0.1
    target = rng.randn(8, 10).astype(np.float32)
    ref = tnn.GaussianNLLLoss()(torch.from_numpy(mean),
                                torch.from_numpy(target),
                                torch.from_numpy(var)).item()
    out = gaussian_nll_loss(jnp.asarray(mean), jnp.asarray(var),
                            jnp.asarray(target))
    assert abs(float(out) - ref) < 1e-6


def test_generalized_sigmoid():
    from madrigal_tpu.models.chemcpa import GeneralizedSigmoid

    gs = GeneralizedSigmoid(dim=5, nonlin="logsigm")
    x = jnp.asarray(np.linspace(0, 3, 4, dtype=np.float32))
    idx = jnp.asarray([0, 2, 4, 1])
    v = gs.init(jax.random.PRNGKey(0), x, idx)
    out = gs.apply(v, x, idx)
    # beta=1, bias=0 => sigmoid(log1p(x)) - 0.5
    ref = 1 / (1 + np.exp(-np.log1p(np.asarray(x)))) - 0.5
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)
