"""Parity tests: MLP building blocks vs torch fixtures.

The torch fixtures rebuild the reference layer layouts (documented at
madrigal/models/models.py:121-180, chemCPA/model.py:161-231,
madrigal/models/simclr.py:46-62) and the converter maps their weights onto
our flax modules; outputs must agree to float32 tolerance.
"""
import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from madrigal_tpu.models.mlp import MLPEncoder, ChemCPAMLP, SimCLRPredictor
from madrigal_tpu.interop.torch_convert import (
    convert_chemcpa_mlp,
    convert_mlp_encoder,
)


def torch_mlp_encoder(in_dim, hidden_dims, out_dim, p, norm, actn="relu",
                      order="nd"):
    """Reference MLPEncoder layout rebuilt in torch for parity checking."""
    acts = {"relu": tnn.ReLU(), "gelu": tnn.GELU(), "tanh": tnn.Tanh()}
    layers = [tnn.Linear(in_dim, hidden_dims[0]), acts[actn]]
    for i in range(len(hidden_dims) - 1):
        block = []
        norm_layer = {"bn": tnn.BatchNorm1d(hidden_dims[i]),
                      "ln": tnn.LayerNorm(hidden_dims[i]), None: None}[norm]
        if order == "nd":
            if norm_layer is not None:
                block.append(norm_layer)
            if p != 0:
                block.append(tnn.Dropout(p))
        else:
            if p != 0:
                block.append(tnn.Dropout(p))
            if norm_layer is not None:
                block.append(norm_layer)
        block += [tnn.Linear(hidden_dims[i], hidden_dims[i + 1]), acts[actn]]
        layers += block
    layers.append(tnn.Linear(hidden_dims[-1], out_dim))
    return tnn.Sequential(*layers)


@pytest.mark.parametrize("norm", [None, "ln", "bn"])
def test_mlp_encoder_parity(norm, rng):
    torch.manual_seed(0)
    in_dim, hidden, out_dim, p = 37, (64, 48), 16, 0.2
    tmod = torch_mlp_encoder(in_dim, hidden, out_dim, p, norm)
    tmod.eval()
    sd = {f"fc.{k}": v for k, v in tmod.state_dict().items()}

    x = rng.randn(5, in_dim).astype(np.float32)
    with torch.no_grad():
        ref = tmod(torch.from_numpy(x)).numpy()

    model = MLPEncoder(hidden_dims=hidden, output_dim=out_dim, dropout=p,
                       norm=norm)
    params, stats = convert_mlp_encoder(sd, hidden, p, norm)
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    out = model.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


def test_cv_checkpoint_forward():
    """Load the reference's real pretrained cv autoencoder-encoder weights
    (modality_pretraining/cv/cv_model_ae.pt) and check our encoder output
    matches the torch fixture running the same weights."""
    sd = torch.load(
        "/root/reference/modality_pretraining/cv/cv_model_ae.pt",
        map_location="cpu", weights_only=False,
    )
    hidden, p, norm = (512, 256), 0.2, None
    tmod = torch_mlp_encoder(559, hidden, 128, p, norm)
    tmod.load_state_dict({k[len("fc."):]: v for k, v in sd.items()},
                         strict=True)
    tmod.eval()

    x = np.random.RandomState(1).randn(4, 559).astype(np.float32)
    with torch.no_grad():
        ref = tmod(torch.from_numpy(x)).numpy()

    model = MLPEncoder(hidden_dims=hidden, output_dim=128, dropout=p, norm=norm)
    params, _ = convert_mlp_encoder(dict(sd), hidden, p, norm)
    out = model.apply({"params": params}, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


def torch_chemcpa_mlp(sizes, batch_norm=True, last_layer_act="linear"):
    layers = []
    for s in range(len(sizes) - 1):
        layers += [
            tnn.Linear(sizes[s], sizes[s + 1]),
            tnn.BatchNorm1d(sizes[s + 1])
            if batch_norm and s < len(sizes) - 2 else None,
            tnn.ReLU(),
        ]
    layers = [l for l in layers if l is not None][:-1]
    mod = tnn.Sequential(*layers)
    return mod


@pytest.mark.parametrize("last_act", ["linear", "ReLU"])
def test_chemcpa_mlp_parity(last_act, rng):
    torch.manual_seed(2)
    sizes = [30, 64, 64, 20]
    tmod = torch_chemcpa_mlp(sizes)
    tmod.eval()
    sd = {f"network.{k}": v for k, v in tmod.state_dict().items()}

    x = rng.randn(6, sizes[0]).astype(np.float32)
    with torch.no_grad():
        h = tmod(torch.from_numpy(x))
        if last_act == "ReLU":
            dim = h.shape[1] // 2
            ref = torch.cat([torch.relu(h[:, :dim]), h[:, dim:]], dim=1).numpy()
        else:
            ref = h.numpy()

    model = ChemCPAMLP(sizes=sizes, last_layer_act=last_act)
    params, stats = convert_chemcpa_mlp(sd, num_linear=len(sizes) - 1)
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


def test_simclr_predictor_shapes():
    model = SimCLRPredictor(mlp_dim=64, output_dim=32)
    x = jnp.ones((8, 32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (8, 32)
    # train mode updates batch stats
    out2, updates = model.apply(variables, x, train=True,
                                mutable=["batch_stats"])
    assert "batch_stats" in updates
