"""MLP building blocks.

TPU-native equivalents of the reference's tabular encoders and projector MLPs:
  * `MLPEncoder`  -- reference madrigal/models/models.py:121-180 (MLPEncoder)
                     and models.py:459-518 (MLPAdaptor, identical layout).
  * `ChemCPAMLP`  -- reference madrigal/chemcpa/chemCPA/model.py:161-231 (MLP),
                     including the "half-ReLU" last-layer quirk.
  * `SimCLRPredictor` -- reference madrigal/models/simclr.py:46-62 (_build_mlp).

All modules are flax.linen with explicit `train` flags; BatchNorm running
statistics live in the `batch_stats` collection.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

ACTIVATIONS = {
    "relu": nn.relu,
    "leakyrelu": lambda x: nn.leaky_relu(x, negative_slope=0.01),
    "tanh": nn.tanh,
    "sigmoid": nn.sigmoid,
    "selu": nn.selu,
    "softplus": nn.softplus,
    "gelu": nn.gelu,  # note: torch nn.GELU default is exact erf-based
    "gelu_exact": lambda x: nn.gelu(x, approximate=False),
    None: lambda x: x,
    "none": lambda x: x,
}


def activation(name: Optional[str]):
    # torch's nn.GELU uses the exact erf formulation by default; match it so
    # parity tests against the reference hold to float tolerance.
    if name == "gelu":
        return ACTIVATIONS["gelu_exact"]
    return ACTIVATIONS[name]


class MLPEncoder(nn.Module):
    """Reference MLPEncoder layout (models.py:121-180).

    Layer sequence:
      Dense(in->h0), actn,
      for each subsequent hidden dim: [norm?, dropout?, Dense, actn]  ('nd')
                                   or [dropout?, norm?, Dense, actn]  ('dn'),
      Dense(h_last->out).
    """

    hidden_dims: Sequence[int]
    output_dim: int
    dropout: float = 0.0
    norm: Optional[str] = None  # 'bn' | 'ln' | None
    actn: str = "relu"
    order: str = "nd"

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        act = activation(self.actn)
        h = nn.Dense(self.hidden_dims[0], name="dense_0")(x)
        h = act(h)
        for i in range(len(self.hidden_dims) - 1):
            def norm_layer(h, i=i):
                if self.norm == "bn":
                    return nn.BatchNorm(
                        use_running_average=not train,
                        momentum=0.9,
                        epsilon=1e-5,
                        name=f"norm_{i}",
                    )(h)
                if self.norm == "ln":
                    return nn.LayerNorm(epsilon=1e-5, name=f"norm_{i}")(h)
                return h

            def drop_layer(h, i=i):
                if self.dropout > 0:
                    return nn.Dropout(
                        rate=self.dropout, deterministic=not train,
                        name=f"drop_{i}",
                    )(h)
                return h

            if self.order == "nd":
                h = norm_layer(h)
                h = drop_layer(h)
            elif self.order == "dn":
                h = drop_layer(h)
                h = norm_layer(h)
            else:
                raise NotImplementedError(self.order)
            h = nn.Dense(self.hidden_dims[i + 1], name=f"dense_{i + 1}")(h)
            h = act(h)
        out = nn.Dense(self.output_dim, name=f"dense_{len(self.hidden_dims)}")(h)
        return out


class ChemCPAMLP(nn.Module):
    """chemCPA MLP (chemCPA/model.py:161-231).

    `sizes` = full layer widths including input and output.
    BatchNorm between all but the final Linear; `last_layer_act='ReLU'`
    applies ReLU to only the first half of the outputs (reference quirk at
    model.py:226-230).
    """

    sizes: Sequence[int]
    batch_norm: bool = True
    last_layer_act: str = "linear"

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        n = len(self.sizes) - 1
        h = x
        for i in range(n):
            h = nn.Dense(self.sizes[i + 1], name=f"dense_{i}")(h)
            if i < n - 1:
                if self.batch_norm:
                    h = nn.BatchNorm(
                        use_running_average=not train,
                        momentum=0.9,
                        epsilon=1e-5,
                        name=f"bn_{i}",
                    )(h)
                h = nn.relu(h)
        if self.last_layer_act == "linear":
            return h
        if self.last_layer_act == "ReLU":
            dim = h.shape[-1] // 2
            return jnp.concatenate([nn.relu(h[..., :dim]), h[..., dim:]], axis=-1)
        raise ValueError(self.last_layer_act)


class SimCLRPredictor(nn.Module):
    """SimCLR projection/prediction head (simclr.py:46-62).

    num_layers Dense(bias=False) blocks; BatchNorm+ReLU between; final
    BatchNorm without affine parameters (`last_bn`).
    """

    mlp_dim: int
    output_dim: int
    num_layers: int = 2
    last_bn: bool = True

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = x
        for l in range(self.num_layers):
            dim2 = self.output_dim if l == self.num_layers - 1 else self.mlp_dim
            h = nn.Dense(dim2, use_bias=False, name=f"dense_{l}")(h)
            if l < self.num_layers - 1:
                h = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    name=f"bn_{l}",
                )(h)
                h = nn.relu(h)
            elif self.last_bn:
                h = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    use_bias=False,
                    use_scale=False,
                    name=f"bn_{l}",
                )(h)
        return h
