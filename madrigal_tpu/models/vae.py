"""Variational autoencoder for tabular modalities.

Reference: madrigal/models/models.py:183-208 (VAE over MLPEncoder
encoder/decoder with reparameterization); an alternative stage-1
pretrainer for the tabular views.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .mlp import MLPEncoder


class VAE(nn.Module):
    input_dim: int
    hidden_dims: Sequence[int] = (512, 256)
    hidden_dim: int = 128  # encoder output feeding mu/var heads
    latent_dim: int = 64
    dropout: float = 0.2

    def setup(self):
        self.encoder = MLPEncoder(
            hidden_dims=tuple(self.hidden_dims), output_dim=self.hidden_dim,
            dropout=self.dropout, norm=None, actn="relu", name="encoder",
        )
        self.fc_mu = nn.Dense(self.latent_dim, name="fc_mu")
        self.fc_var = nn.Dense(self.latent_dim, name="fc_var")
        self.decoder = MLPEncoder(
            hidden_dims=tuple(reversed(self.hidden_dims)),
            output_dim=self.input_dim, dropout=self.dropout, norm=None,
            actn="relu", name="decoder",
        )

    def encode(self, x, *, train=False):
        h = nn.relu(self.encoder(x, train=train))
        return self.fc_mu(h), self.fc_var(h)

    def __call__(self, x, *, train=False):
        mu, logvar = self.encode(x, train=train)
        if train:
            rng = self.make_rng("reparam")
            std = jnp.exp(0.5 * logvar)
            z = mu + std * jax.random.normal(rng, std.shape)
        else:
            z = mu
        recon = self.decoder(z, train=train)
        return z, recon, mu, logvar


def vae_loss(x, recon, mu, logvar, beta: float = 1.0):
    recon_loss = jnp.mean((recon - x) ** 2)
    kl = -0.5 * jnp.mean(1 + logvar - mu ** 2 - jnp.exp(logvar))
    return recon_loss + beta * kl, recon_loss, kl
