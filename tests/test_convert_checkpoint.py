"""Reference-checkpoint conversion: build a reference-style state_dict from
torch fixtures (incl. the parametrized decoder weight and CL prefixes) and
check the converted model reproduces the torch outputs."""
import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from madrigal_tpu.config import (
    EncoderConfig,
    FusionConfig,
    GINConfig,
    HGTConfig,
    MLPEncoderConfig,
    ProjectorConfig,
)
from madrigal_tpu.interop.convert_checkpoint import (
    convert_reference_cl_checkpoint,
    convert_reference_finetune_checkpoint,
)
from tests.test_fusion import TorchFusionFixture
from tests.test_mlp import torch_mlp_encoder


def build_reference_style_state_dict():
    """Assemble reference-format keys for the pure-torch modules."""
    torch.manual_seed(11)
    sd = {}
    cv = torch_mlp_encoder(559, (64, 32), 32, 0.0, None)
    for k, v in cv.state_dict().items():
        sd[f"encoder.cv_encoder.fc.{k}"] = v
    fus = TorchFusionFixture(32, 2, nlayers=1, nheads=2, head_dim=16,
                             ffn=64, norm_first=True, agg="x-attn")
    for k, v in fus.state_dict().items():
        if k == "x_attn_key_padding_mask":
            continue
        sd[f"encoder.transformer.{k}"] = v
    proj = torch_mlp_encoder(32, (64, 64), 32, 0.0, "ln")
    for k, v in proj.state_dict().items():
        sd[f"encoder.uni_projector.fc.{k}"] = v
        sd[f"encoder.uni_fuser.fc.{k}"] = v
    sd["encoder.tx_bottleneck_tokens"] = torch.randn(2, 32)
    sd["encoder.pos_encoder.pe"] = torch.randn(1, 3, 32)
    # parametrized decoder weight (reference models.py:922)
    sd["decoder.parametrizations.weight.original"] = torch.randn(5, 32, 32)
    return sd, cv, fus


def enc_cfg():
    return EncoderConfig(
        feature_dim=32,
        gin=GINConfig(hidden_dims=(32,), num_mlp_layer=3),
        hgt=HGTConfig(hidden_dim=16, num_layers=2, att_heads=4),
        cv=MLPEncoderConfig(hidden_dims=(64, 32), dropout=0.0, norm=None),
        transformer=FusionConfig(num_layers=1, att_heads=2, head_dim=16,
                                 ffn_dim=64, dropout=0.0, norm_first=True,
                                 agg="x-attn", num_tx_bottlenecks=2),
        proj=ProjectorConfig(hidden_dims=(64, 64), dropout=0.0, norm="ln"),
        pos_emb_type="learnable", pos_emb_dropout=0.0,
    )


@pytest.mark.slow
def test_finetune_checkpoint_conversion(rng):
    sd, cv_mod, fus_mod = build_reference_style_state_dict()
    params, stats = convert_reference_finetune_checkpoint(sd, enc_cfg())

    assert set(params["encoder"]) >= {
        "cv_encoder", "transformer", "uni_projector", "uni_fuser",
        "tx_bottleneck_tokens", "pos_encoder",
    }
    # cv output parity through the converted weights
    from madrigal_tpu.models.mlp import MLPEncoder

    x = rng.randn(4, 559).astype(np.float32)
    with torch.no_grad():
        ref = cv_mod(torch.from_numpy(x)).numpy()
    out = MLPEncoder(hidden_dims=(64, 32), output_dim=32, dropout=0.0).apply(
        {"params": params["encoder"]["cv_encoder"]}, jnp.asarray(x),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    # decoder weight symmetrization equals the reference parametrization
    from madrigal_tpu.models.decoder import symmetrize

    orig = sd["decoder.parametrizations.weight.original"].numpy()
    ours = np.asarray(symmetrize(jnp.asarray(params["decoder"]["weight"])))
    theirs = (torch.from_numpy(orig).triu()
              + torch.from_numpy(orig).triu(1).transpose(-1, -2)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_cl_checkpoint_transfer_filter():
    sd, *_ = build_reference_style_state_dict()
    cl_sd = {"base_encoder." + k[len("encoder."):]: v
             for k, v in sd.items() if k.startswith("encoder.")}
    params, _ = convert_reference_cl_checkpoint(cl_sd, enc_cfg())
    # fusion modules filtered out; encoders kept
    assert "transformer" not in params
    assert "pos_encoder" not in params
    assert "tx_bottleneck_tokens" not in params
    assert "uni_projector" not in params  # use_pretrained_adaptor=False
    assert "cv_encoder" in params and "uni_fuser" in params

    params2, _ = convert_reference_cl_checkpoint(
        cl_sd, enc_cfg(), use_pretrained_adaptor=True)
    assert "uni_projector" in params2


def test_hgt_pyg23_layout_mismatch_raises():
    from madrigal_tpu.data.kg import KGMetadata
    from madrigal_tpu.interop.convert_checkpoint import convert_hgt_pyg23

    meta = KGMetadata(node_types=("drug",),
                      edge_types=(("drug", "r", "drug"),))
    with pytest.raises(KeyError, match="layout mismatch"):
        convert_hgt_pyg23({"convs.0.bogus": torch.zeros(1)},
                          meta.node_types, meta.edge_types, 1, 2, 8)
