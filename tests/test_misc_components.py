"""Tests for pipeline prefetcher, VAE, CE loss, single-drug head."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_device_prefetcher_order_and_error():
    from madrigal_tpu.data.pipeline import DevicePrefetcher, prefetch_epochs

    batches = [np.full((4,), i, np.float32) for i in range(5)]
    out = list(DevicePrefetcher(batches, buffer_size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert float(np.asarray(b)[0]) == i

    def gen():
        yield np.zeros(3)
        raise RuntimeError("collator exploded")

    with pytest.raises(RuntimeError, match="collator exploded"):
        list(DevicePrefetcher(gen()))

    out = list(prefetch_epochs(lambda s: np.full((2,), s), 3))
    assert [int(np.asarray(b)[0]) for b in out] == [0, 1, 2]


def test_vae_roundtrip(rng):
    from madrigal_tpu.models.vae import VAE, vae_loss

    model = VAE(input_dim=20, hidden_dims=(32, 16), hidden_dim=16,
                latent_dim=8, dropout=0.0)
    x = jnp.asarray(rng.randn(10, 20).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "reparam": jax.random.PRNGKey(1)},
        x, train=True,
    )
    z, recon, mu, logvar = model.apply(variables, x, train=False)
    assert z.shape == (10, 8) and recon.shape == (10, 20)
    total, rl, kl = vae_loss(x, recon, mu, logvar)
    assert np.isfinite(float(total))
    # train mode samples (needs reparam rng)
    z2, *_ = model.apply(variables, x, train=True,
                         rngs={"reparam": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(z), np.asarray(z2))


def test_ce_loss(rng):
    from madrigal_tpu.train.losses import ce_loss_for_pairs

    logits = jnp.asarray(rng.randn(6, 4).astype(np.float32))
    labels = jnp.asarray([0, 1, 2, 3, 0, 1])
    w = jnp.ones(6)
    loss = ce_loss_for_pairs(logits, labels, w)
    import torch

    ref = torch.nn.CrossEntropyLoss()(
        torch.from_numpy(np.asarray(logits)),
        torch.from_numpy(np.asarray(labels)).long(),
    ).item()
    assert abs(float(loss) - ref) < 1e-5


def test_single_drug_head(rng):
    from madrigal_tpu.config import (
        ChemCPAConfig, EncoderConfig, FusionConfig, GINConfig, HGTConfig,
        MLPEncoderConfig, ProjectorConfig,
    )
    from madrigal_tpu.data.collate import DDICollator
    from madrigal_tpu.data.synthetic import make_dataset
    from madrigal_tpu.models.encoder import MadrigalMultilabel, init_multilabel

    enc = EncoderConfig(
        feature_dim=16, gin=GINConfig(hidden_dims=(16, 16), num_mlp_layer=2),
        hgt=HGTConfig(hidden_dim=8, num_layers=2, att_heads=2),
        cv=MLPEncoderConfig(hidden_dims=(32, 16)),
        chemcpa=ChemCPAConfig(dim=16, autoencoder_width=32,
                              autoencoder_depth=1),
        transformer=FusionConfig(num_layers=1, att_heads=2, head_dim=8,
                                 ffn_dim=32, dropout=0.0, norm_first=True,
                                 agg="x-attn", num_tx_bottlenecks=2),
        proj=ProjectorConfig(hidden_dims=(32, 32)),
        pos_emb_type="sinusoidal",
    )
    ds = make_dataset(num_drugs=10, num_labels=4, num_edges=14, seed=11)
    batch, kg = DDICollator(ds, split="train")()
    model = MadrigalMultilabel(enc_cfg=enc, prediction_dim=4,
                               prediction_dim_single_drug=7)
    variables = init_multilabel(model, jax.random.PRNGKey(0), batch.head,
                                batch.tail, kg)
    assert "single_drug_head" in variables["params"]
    out = model.apply(variables, batch.head, kg, train=False,
                      method=MadrigalMultilabel.score_single_drug)
    assert out.shape == (batch.head.batch_size, 7)
    assert np.isfinite(np.asarray(out)).all()


def test_profiling_utils():
    import jax.numpy as jnp

    from madrigal_tpu.utils.profiling import StepTimer, memory_stats

    t = StepTimer()
    for _ in range(3):
        t.start()
        x = jnp.ones((128, 128)) @ jnp.ones((128, 128))
        t.stop(x)
    s = t.summary()
    assert s["n"] == 3 and s["mean_s"] > 0
    stats = memory_stats()
    assert isinstance(stats, dict)


def test_logging_utils(tmp_path):
    import json

    from madrigal_tpu.utils.logging import (
        AverageMeter, MetricLogger, ProgressMeter, get_root_logger,
    )

    m = AverageMeter("loss", ":.3f")
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0
    logger = get_root_logger(str(tmp_path / "x.log"))
    ProgressMeter(10, [m], logger).display(3)

    ml = MetricLogger(str(tmp_path), run_name="r")
    ml.log({"a": 1.5}, step=0)
    ml.log({"a": 2.5}, step=1)
    rows = [json.loads(l) for l in
            open(tmp_path / "r_metrics.jsonl").read().splitlines()]
    assert rows[0]["a"] == 1.5 and rows[1]["_step"] == 1


def test_restore_into_matches_by_key_not_order():
    """Same-shaped optimizer leaves (adam mu/nu) must pair by FIELD NAME:
    a restored dict whose key order differs from the namedtuple field
    order restores correctly (ADVICE r1: flatten-order pairing was latent
    fragility)."""
    from collections import namedtuple

    import numpy as np

    from madrigal_tpu.train.checkpoint import restore_into

    State = namedtuple("State", ["count", "mu", "nu"])
    tmpl = (State(np.zeros([], np.int32),
                  {"w": np.zeros((2, 2))}, {"w": np.zeros((2, 2))}),)
    mu = {"w": np.full((2, 2), 1.0)}
    nu = {"w": np.full((2, 2), 2.0)}
    # deliberately adversarial key order: nu before mu, tuple key as str
    restored = {"0": {"nu": nu, "mu": mu, "count": np.asarray(7, np.int32)}}
    out = restore_into(tmpl, restored)
    assert int(out[0].count) == 7
    np.testing.assert_array_equal(out[0].mu["w"], mu["w"])
    np.testing.assert_array_equal(out[0].nu["w"], nu["w"])

    # missing key -> loud error naming the path
    import pytest

    with pytest.raises(KeyError, match="mu"):
        restore_into(tmpl, {"0": {"nu": nu, "count": np.asarray(7)}})
    # shape mismatch -> loud error
    with pytest.raises(ValueError, match="shape"):
        restore_into(
            tmpl,
            {"0": {"nu": nu, "mu": {"w": np.zeros(3)},
                   "count": np.asarray(7, np.int32)}},
        )


def test_l2_normalize_zero_rows_stay_zero():
    """All-zero tokens (missing-KG row) must not become NaN under
    cfg.normalize=True (torch F.normalize eps semantics)."""
    import jax.numpy as jnp
    import numpy as np

    from madrigal_tpu.models.encoder import _l2_normalize

    x = jnp.asarray(np.array([[0.0, 0.0], [3.0, 4.0]], np.float32))
    out = np.asarray(_l2_normalize(x))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[0], 0.0)
    np.testing.assert_allclose(out[1], [0.6, 0.8], atol=1e-6)
