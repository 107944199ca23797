"""GeomCA diagnostics + LM decoder tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from madrigal_tpu.eval.geomca import estimate_epsilon, geomca
from madrigal_tpu.models.lm_decoder import LMDecoder


def test_geomca_identical_sets(rng):
    """R == E: every component perfectly consistent; precision=recall=1
    when thresholds are met."""
    R = rng.randn(60, 8).astype(np.float64)
    res = geomca(R, R + 1e-9, gamma=1.0, percentile=20.0)
    assert res.network_consistency == 1.0
    assert res.precision > 0.9 and res.recall > 0.9
    top = res.components[0]
    assert top["comp_consistency"] == pytest.approx(1.0)


def test_geomca_disjoint_sets(rng):
    """Far-apart R and E: no heterogeneous edges; quality ~ 0."""
    R = rng.randn(40, 4)
    E = rng.randn(40, 4) + 100.0
    res = geomca(R, E, epsilon=2.0)
    assert res.network_quality == 0.0
    assert res.precision == 0.0 and res.recall == 0.0
    assert res.num_components >= 2


def test_geomca_epsilon_estimate(rng):
    R = rng.randn(100, 4)
    eps = estimate_epsilon(R, percentile=5.0, gamma=2.0)
    assert eps > 0
    eps1 = estimate_epsilon(R, percentile=5.0, gamma=1.0)
    assert abs(eps - 2 * eps1) < 1e-9



def test_geomca_sparsify_and_logging(rng, tmp_path):
    """Reference GeomCA extras: geometric sparsification (Def 3.1) keeps
    points >= min_dist apart; geomca_logged writes the component-stat /
    network-stat / parameter artifacts (GeomCA.py:197-248)."""
    import json

    from madrigal_tpu.eval.geomca import (
        geomca_logged,
        reduce_points,
        sparsify_point_set,
    )

    pts = rng.randn(200, 4)
    sp = sparsify_point_set(pts, min_dist=1.5)
    assert 1 < len(sp) < len(pts)
    from scipy.spatial.distance import pdist

    assert pdist(sp).min() >= 1.5
    sub = reduce_points(pts, "subsample", n_samples=50, seed=0)
    assert sub.shape == (50, 4)

    R = rng.randn(80, 4)
    E = R + 0.05 * rng.randn(80, 4)
    res = geomca_logged(R, E, str(tmp_path), prefix="t_",
                        reduce="subsample", n_samples=60, gamma=2.0)
    for name in ("network_parameters.json", "network_stats.json",
                 "components_stats.json", "geomca.txt"):
        assert (tmp_path / ("t_" + name)).exists(), name
    stats = json.load(open(tmp_path / "t_network_stats.json"))
    assert stats["precision"] == res.precision
    comps = json.load(open(tmp_path / "t_components_stats.json"))
    assert len(comps) == res.num_components
    # ordered largest-first
    sizes = [c["num_R"] + c["num_E"] for c in comps]
    assert sizes == sorted(sizes, reverse=True)
    params = json.load(open(tmp_path / "t_network_parameters.json"))
    assert params["num_R"] == 60 and params["num_R_original"] == 80


@pytest.mark.parametrize("self_att", [True, False])
def test_lm_decoder_forward(self_att, rng):
    model = LMDecoder(lm_emb_dim=32, drug_dim=16, project_dim=24,
                      mlp_dim=48, self_att=self_att)
    zh = jnp.asarray(rng.randn(6, 16).astype(np.float32))
    zt = jnp.asarray(rng.randn(6, 16).astype(np.float32))
    tx = jnp.asarray(rng.randn(6, 32).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), zh, zt, tx, train=False)
    out = model.apply(variables, zh, zt, tx, train=False)
    assert out.shape == (6,)
    assert np.isfinite(np.asarray(out)).all()

    # train mode with dropout rng
    out2 = model.apply(variables, zh, zt, tx, train=True,
                       rngs={"dropout": jax.random.PRNGKey(1)})
    assert np.isfinite(np.asarray(out2)).all()


def test_lm_decoder_trains(rng):
    import optax

    model = LMDecoder(lm_emb_dim=16, drug_dim=8, project_dim=16, mlp_dim=32,
                      self_att=False, dropout=0.0)
    zh = jnp.asarray(rng.randn(32, 8).astype(np.float32))
    zt = jnp.asarray(rng.randn(32, 8).astype(np.float32))
    tx = jnp.asarray(rng.randn(32, 16).astype(np.float32))
    y = jnp.asarray((rng.rand(32) < 0.5).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), zh, zt, tx)
    tx_opt = optax.adam(1e-2)
    opt_state = tx_opt.init(variables["params"])

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = model.apply({"params": p}, zh, zt, tx, train=False)
            return optax.sigmoid_binary_cross_entropy(logits, y).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx_opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params = variables["params"]
    losses = []
    for _ in range(40):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8
