"""Extra tabular modality ('bs') end-to-end via the NON_TX_MODALITIES env
override (reference: madrigal/utils.py:30-37) -- runs in a subprocess since
the modality list is bound at import."""
import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = textwrap.dedent("""
    import os
    os.environ["NON_TX_MODALITIES"] = "str_kg_cv_bs"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from madrigal_tpu.constants import (
        NON_TX_MODALITIES, NUM_MODALITIES, NUM_NON_TX_MODALITIES,
    )
    assert NON_TX_MODALITIES == ["str", "kg", "cv", "bs"]
    assert NUM_NON_TX_MODALITIES == 4 and NUM_MODALITIES == 20

    from madrigal_tpu.config import (
        ChemCPAConfig, EncoderConfig, FusionConfig, GINConfig, HGTConfig,
        MLPEncoderConfig, ProjectorConfig,
    )
    from madrigal_tpu.data.collate import DDICollator
    from madrigal_tpu.data.synthetic import make_dataset
    from madrigal_tpu.models.encoder import MadrigalMultilabel, init_multilabel

    ds = make_dataset(num_drugs=10, num_labels=3, num_edges=12, seed=33,
                      extra_tabular_dims={"bs": 48})
    assert ds.mod_avail.shape[1] == 20
    assert "bs" in ds.extra_tabular and ds.extra_tabular["bs"].shape == (10, 48)

    coll = DDICollator(ds, split="train")
    batch, kg = coll()
    assert "bs" in batch.head.extra_tabular
    assert batch.head.masks.shape[1] == 20

    enc = EncoderConfig(
        feature_dim=16,
        gin=GINConfig(hidden_dims=(16,), num_mlp_layer=2),
        hgt=HGTConfig(hidden_dim=8, num_layers=2, att_heads=2),
        cv=MLPEncoderConfig(hidden_dims=(32, 16)),
        extra_tabular={"bs": MLPEncoderConfig(input_dim=48,
                                              hidden_dims=(32, 16))},
        chemcpa=ChemCPAConfig(dim=16, autoencoder_width=32,
                              autoencoder_depth=1),
        transformer=FusionConfig(num_layers=1, att_heads=2, head_dim=8,
                                 ffn_dim=32, dropout=0.0, norm_first=True,
                                 agg="x-attn", num_tx_bottlenecks=2),
        proj=ProjectorConfig(hidden_dims=(32, 32)),
        pos_emb_type="sinusoidal",
    )
    assert enc.seq_len == 22  # 20 modalities + 2 bottlenecks
    model = MadrigalMultilabel(enc_cfg=enc, prediction_dim=3)
    variables = init_multilabel(model, jax.random.PRNGKey(0), batch.head,
                                batch.tail, kg)
    assert "tab_encoder_bs" in variables["params"]["encoder"]
    s = model.apply(variables, batch.head, batch.tail, kg, train=False)
    assert s.shape == (3, batch.head.batch_size, batch.tail.batch_size)
    assert np.isfinite(np.asarray(s)).all()
    print("BS_MODALITY_OK")
""")


@pytest.mark.slow
def test_bs_modality_subprocess():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env.pop("XLA_FLAGS", None)
    result = subprocess.run(
        [sys.executable, "-c", SCRIPT], capture_output=True, text=True,
        env=env, timeout=420,
    )
    assert "BS_MODALITY_OK" in result.stdout, (
        result.stdout[-2000:] + "\n" + result.stderr[-3000:]
    )
