"""KG subgraph sampler + seml-style config generator tests."""
import numpy as np
import pytest

from madrigal_tpu.data.kg_sampling import sample_kg_subgraph
from madrigal_tpu.data.synthetic import make_dataset
from madrigal_tpu.utils.config_gen import (
    generate_configs,
    merge_dicts,
    read_config,
    unflatten,
)


def test_kg_subgraph_sampling():
    ds = make_dataset(num_drugs=24, seed=9)
    seeds = [0, 1, 2]
    sub, drug_row_map = sample_kg_subgraph(
        ds.kg_node_feats, ds.kg_edge_indices, ds.kg_drug_ids,
        seed_drug_rows=seeds, num_neighbors=4, num_layers=2,
        rng=np.random.RandomState(0),
    )
    # seed drugs must survive with valid rows
    for s in seeds:
        assert drug_row_map[s] >= 0
    # subgraph smaller than the full graph
    assert sub.num_nodes("protein") <= ds.kg_node_feats["protein"].shape[0]
    # subgraph drug ids map back to global ids
    gids = np.asarray(sub.drug_index_map)
    assert set(np.asarray(ds.kg_drug_ids)[seeds]).issubset(set(gids.tolist()))
    # relabeled edges stay in range
    for ek, src in sub.edge_src.items():
        mask = np.asarray(sub.edge_mask[ek])
        assert (np.asarray(src)[mask] >= 0).all()


def test_kg_subgraph_runs_through_hgt():
    import jax
    from madrigal_tpu.config import HGTConfig
    from madrigal_tpu.models.hgt import HGTEncoder

    ds = make_dataset(num_drugs=24, seed=9)
    sub, _ = sample_kg_subgraph(
        ds.kg_node_feats, ds.kg_edge_indices, ds.kg_drug_ids,
        seed_drug_rows=[0, 3], num_neighbors=3, num_layers=2,
    )
    enc = HGTEncoder(cfg=HGTConfig(hidden_dim=8, num_layers=2, att_heads=2),
                     embed_dim=8, drug_only_head=True)
    v = enc.init(jax.random.PRNGKey(0), sub, train=False)
    out = enc.apply(v, sub, train=False)
    assert np.isfinite(np.asarray(out["drug"])).all()


def test_config_gen_grid_and_fixed(tmp_path):
    yaml_text = """
seml:
  name: sweep
fixed:
  model.hparams.dim: 128
  model.use_drugs: false
grid:
  model.hparams.autoencoder_width:
    type: choice
    options: [256, 512]
  model.hparams.dropout:
    type: choice
    options: [0.1, 0.4]
"""
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml_text)
    seml_cfg, slurm_cfg, exp = read_config(str(p))
    assert seml_cfg["name"] == "sweep"
    configs = generate_configs(exp)
    assert len(configs) == 4
    for c in configs:
        assert c["model"]["hparams"]["dim"] == 128
        assert c["model"]["hparams"]["autoencoder_width"] in (256, 512)
    widths = {c["model"]["hparams"]["autoencoder_width"] for c in configs}
    assert widths == {256, 512}


def test_config_gen_random_and_merge():
    exp = {
        "fixed": {"a.b": 1},
        "random": {"samples": 3,
                   "a.lr": {"type": "loguniform", "min": 1e-5, "max": 1e-2}},
    }
    configs = generate_configs(exp, seed=1)
    assert len(configs) == 3
    for c in configs:
        assert 1e-5 <= c["a"]["lr"] <= 1e-2
        assert c["a"]["b"] == 1

    m = merge_dicts({"x": {"y": 1, "z": 2}}, {"x": {"y": 9}, "w": 0})
    assert m == {"x": {"y": 9, "z": 2}, "w": 0}
    assert unflatten({"p.q.r": 5}) == {"p": {"q": {"r": 5}}}


def test_reference_chemcpa_config_parses():
    """The reference's actual chemCPA sweep configs parse and expand."""
    seml_cfg, _, exp = read_config(
        "/root/reference/configs/chemcpa/chemcpa_finetune_configs.yaml"
    )
    configs = generate_configs(exp)
    assert len(configs) == 1
    hp = configs[0]["model"]["hparams"]
    assert hp["dim"] == 128
    assert hp["autoencoder_width"] == 512
    assert configs[0]["model"]["use_drugs"] is False
