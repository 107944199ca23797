"""Golden numeric regression: a frozen tiny model's parameters and outputs
(tests/golden/tiny_model_v1.npz) must be reproduced exactly by the current
code. Protects the full forward path (featurized synthetic data -> all four
encoders -> bottleneck x-attn fusion -> routing -> bilinear scores, plus
the raw CL output path) against silent numeric drift across refactors."""
import os

import numpy as np

import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from madrigal_tpu.config import (
    ChemCPAConfig,
    EncoderConfig,
    FusionConfig,
    GINConfig,
    HGTConfig,
    MLPEncoderConfig,
    ProjectorConfig,
)
from madrigal_tpu.data.collate import DDICollator
from madrigal_tpu.data.synthetic import make_dataset
from madrigal_tpu.models.encoder import MadrigalMultilabel, init_multilabel

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "tiny_model_v1.npz")


def build():
    enc = EncoderConfig(
        feature_dim=16, gin=GINConfig(hidden_dims=(16, 16), num_mlp_layer=2),
        hgt=HGTConfig(hidden_dim=8, num_layers=2, att_heads=2),
        cv=MLPEncoderConfig(hidden_dims=(32, 16)),
        chemcpa=ChemCPAConfig(dim=16, autoencoder_width=32,
                              autoencoder_depth=1),
        transformer=FusionConfig(num_layers=1, att_heads=2, head_dim=8,
                                 ffn_dim=32, dropout=0.0, norm_first=True,
                                 agg="x-attn", num_tx_bottlenecks=2),
        proj=ProjectorConfig(hidden_dims=(32, 32), dropout=0.0),
        pos_emb_type="sinusoidal", pos_emb_dropout=0.0,
    )
    ds = make_dataset(num_drugs=12, num_labels=4, num_edges=16, seed=99)
    batch, kg = DDICollator(ds, split="train")()
    model = MadrigalMultilabel(enc_cfg=enc, prediction_dim=4)
    return model, batch, kg


def test_golden_forward_reproduced():
    data = np.load(GOLDEN)
    model, batch, kg = build()
    variables = init_multilabel(model, jax.random.PRNGKey(123), batch.head,
                                batch.tail, kg)

    # overlay the frozen leaves by path (structure from a fresh init)
    leaves_with_path = jtu.tree_leaves_with_path(variables)
    paths = ["/".join(str(k.key) for k in p) for p, _ in leaves_with_path]
    assert set(paths) == set(k for k in data.files
                             if k not in ("scores", "z_raw")), (
        "parameter tree structure changed vs the golden fixture; "
        "regenerate tests/golden/tiny_model_v1.npz deliberately if the "
        "architecture change is intentional"
    )
    treedef = jtu.tree_structure(variables)
    variables = jtu.tree_unflatten(
        treedef, [jnp.asarray(data[p]) for p in paths]
    )

    scores = np.asarray(model.apply(variables, batch.head, batch.tail, kg,
                                    train=False))
    np.testing.assert_allclose(scores, data["scores"], atol=1e-5, rtol=1e-5)

    z_raw = np.asarray(model.apply(
        variables, batch.head, kg, train=False, raw_encoder_output=True,
        method=lambda m, b, k, train, raw_encoder_output: m.encoder.encode(
            b, kg=k, train=train, raw_encoder_output=raw_encoder_output),
    ))
    np.testing.assert_allclose(z_raw, data["z_raw"], atol=1e-5, rtol=1e-5)
