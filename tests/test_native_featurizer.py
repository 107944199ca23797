"""Native (C++) featurizer: build, parity with the Python parser, and bulk
throughput sanity."""
import numpy as np
import pytest

from madrigal_tpu.data.featurize import featurize_smiles_builtin
from madrigal_tpu.data.native_featurizer import (
    build_native,
    featurize_batch_native,
    featurize_smiles_native,
    native_available,
)

SMILES = [
    "CCO",
    "c1ccccc1",
    "CC(=O)Oc1ccccc1C(=O)O",
    "Cn1cnc2c1c(=O)n(C)c(=O)n2C",
    "C[N+](C)(C)C",
    "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
    "CN(C)C(=N)N=C(N)N",
]


def test_build():
    path = build_native()
    assert path.endswith(".so")
    assert native_available()


@pytest.mark.parametrize("smi", SMILES)
def test_native_matches_python(smi):
    py = featurize_smiles_builtin(smi)
    nat = featurize_smiles_native(smi)
    assert py is not None and nat is not None
    np.testing.assert_array_equal(py["node_feats"], nat["node_feats"])
    np.testing.assert_array_equal(py["edge_index"], nat["edge_index"])
    np.testing.assert_array_equal(py["edge_feats"], nat["edge_feats"])


def test_native_batch():
    out = featurize_batch_native(SMILES + ["NOT_A_SMILES((", "C1CC"])
    assert len(out) == len(SMILES) + 2
    assert all(o is not None for o in out[: len(SMILES)])
    assert out[-1] is None and out[-2] is None


def test_native_throughput():
    import time

    batch = SMILES * 200  # 1400 molecules
    t0 = time.perf_counter()
    out = featurize_batch_native(batch)
    dt = time.perf_counter() - t0
    assert all(o is not None for o in out)
    rate = len(batch) / dt
    assert rate > 2000, f"native featurizer too slow: {rate:.0f} mol/s"


def test_native_arena_pack_matches_python_path():
    import jax.numpy as jnp

    from madrigal_tpu.data.featurize import featurize_smiles_builtin
    from madrigal_tpu.data.molgraph import pack_molecules
    from madrigal_tpu.data.native_featurizer import featurize_pack_native

    graphs = [featurize_smiles_builtin(s) for s in SMILES]
    py_batch = pack_molecules(graphs, node_budget=256, edge_budget=256)
    nat_batch = featurize_pack_native(SMILES, node_budget=256,
                                      edge_budget=256)
    np.testing.assert_array_equal(np.asarray(py_batch.node_feats),
                                  np.asarray(nat_batch.node_feats))
    np.testing.assert_array_equal(np.asarray(py_batch.node_graph),
                                  np.asarray(nat_batch.node_graph))
    np.testing.assert_array_equal(np.asarray(py_batch.edge_src),
                                  np.asarray(nat_batch.edge_src))
    np.testing.assert_array_equal(np.asarray(py_batch.edge_feats),
                                  np.asarray(nat_batch.edge_feats))
    assert nat_batch.num_graphs == len(SMILES)


def test_native_arena_pack_through_gin():
    import jax

    from madrigal_tpu.data.native_featurizer import featurize_pack_native
    from madrigal_tpu.models.gin import GINEncoder

    batch = featurize_pack_native(SMILES, node_budget=256, edge_budget=256)
    model = GINEncoder(hidden_dims=(16, 16), num_mlp_layer=2)
    v = model.init(jax.random.PRNGKey(0), batch, train=False)
    feat, _ = model.apply(v, batch, train=False)
    assert feat.shape == (len(SMILES), 16)
    assert np.isfinite(np.asarray(feat)).all()
