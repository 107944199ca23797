"""Mask-aware BatchNorm.

The reference's GIN BatchNorm (torchdrug conv layers) normalizes over real
atoms only (torchdrug packs graphs without padding). On TPU we pad node
arenas to static shapes, so train-mode batch statistics must exclude padding
rows; eval mode uses running statistics exactly like torch's BatchNorm1d.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over rows selected by a boolean mask.

    Matches torch.nn.BatchNorm1d semantics (biased variance for
    normalization, unbiased for the running-var update, momentum 0.1 in
    torch convention == 0.9 flax convention).
    """

    momentum: float = 0.9  # running = momentum*running + (1-momentum)*batch
    epsilon: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, mask=None, *, train: bool = False):
        dim = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((dim,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((dim,), jnp.float32)
        )
        if train:
            if mask is None:
                count = jnp.asarray(x.shape[0] if x.ndim == 2 else x[..., 0].size,
                                    jnp.float32)
                mean = jnp.mean(x.reshape(-1, dim), axis=0)
                var = jnp.mean(
                    (x.reshape(-1, dim) - mean) ** 2, axis=0
                )
            else:
                m = mask.reshape(-1).astype(jnp.float32)
                count = jnp.maximum(jnp.sum(m), 1.0)
                xf = x.reshape(-1, dim)
                mean = jnp.sum(xf * m[:, None], axis=0) / count
                var = jnp.sum(((xf - mean) ** 2) * m[:, None], axis=0) / count
            if not self.is_initializing():
                unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1.0 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1.0 - self.momentum) * unbiased
                )
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) / jnp.sqrt(var + self.epsilon)
        if self.use_scale:
            scale = self.param("scale", nn.initializers.ones, (dim,))
            y = y * scale
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (dim,))
            y = y + bias
        return y
