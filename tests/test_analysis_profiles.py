"""Discussion-notebook cores (analysis/profiles.py) and the fig1
pretrain embedding-shift workflow (analysis/pretrain_embeds.py)."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-matrix profile workflows; fast
# lane (-m "not slow") skips this file, the full suite keeps it

from madrigal_tpu.analysis import (  # noqa: E402
    binned_similarity_compare,
    combo_class_table,
    ddi_profile_matrix,
    high_similarity_contrast,
    jaccard_similarity,
    match_drug_names,
    organ_class_groups,
    per_drug_modality_alignment,
    pretrain_embedding_shift,
)
from madrigal_tpu.analysis.profiles import (
    load_organ_map,
    lower_triangle_pairs,
    normalize_name,
)


def test_match_drug_names():
    name_sets = [
        ["Paclitaxel", "taxol"],
        ["Binimetinib", "MEK-162"],
        ["AMG-510", "sotorasib"],
    ]
    got = match_drug_names(["paclitaxel", "mek-162", "Sotorasib", "nope"],
                           name_sets)
    assert got == {"paclitaxel": 0, "mek-162": 1, "Sotorasib": 2,
                   "nope": None}
    # squash mode: the proteomics notebook's compound_name_plain
    assert normalize_name("MEK 162-a_b", squash=True) == "mek162ab"
    got = match_drug_names(["MEK162"], name_sets, squash=True)
    assert got == {"MEK162": 1}
    # first drug wins on a shared synonym (notebook's v[0])
    got = match_drug_names(["taxol"], [["taxol"], ["taxol"]])
    assert got == {"taxol": 0}


def test_organ_map_and_groups(tmp_path):
    p = tmp_path / "organs.csv"
    p.write_text("ddi_class\torgan\n"
                 "QTc prolongation, increase\theart\n"
                 "hepatotoxicity, increase\tliver, gastrointestinal\n"
                 "anemia, increase\tblood\n")
    organ_map = load_organ_map(str(p))
    assert organ_map["hepatotoxicity, increase"] == [
        "liver", "gastrointestinal"]
    classes = ["anemia, increase", "QTc prolongation, increase",
               "hepatotoxicity, increase", "unannotated thing"]
    groups = organ_class_groups(classes, organ_map,
                                exclude=["anemia, increase"])
    assert groups == {"heart": [1], "liver": [2], "gastrointestinal": [2]}


def test_combo_class_table():
    rng = np.random.RandomState(0)
    tensor = rng.rand(3, 6, 6)
    tensor = (tensor + tensor.transpose(0, 2, 1)) / 2
    classes = ["a, increase", "b, increase", "c, decrease"]
    organ_map = {"a, increase": ["heart"],
                 "b, increase": ["liver", "blood"]}
    pairs = [(4, 1), (2, 5)]
    tab = combo_class_table(tensor, pairs, ["p0", "p1"], classes,
                            organ_map, exclude=["c, decrease"])
    # classes 0 (heart) + 1 (liver, blood) x 2 pairs = 6 rows
    assert len(tab["value"]) == 6
    assert set(tab["organ"]) == {"heart", "liver", "blood"}
    row = (tab["pair"] == "p1") & (tab["ddi_class"] == "a, increase")
    assert tab["value"][row][0] == pytest.approx(tensor[0, 2, 5])
    # liver and blood rows of class 1 carry the same value
    b_rows = tab["value"][(tab["ddi_class"] == "b, increase")
                          & (tab["pair"] == "p0")]
    assert b_rows[0] == b_rows[1] == pytest.approx(tensor[1, 4, 1])

    # no organ map: every non-excluded class, no organ column
    tab = combo_class_table(tensor, pairs, ["p0", "p1"], classes)
    assert "organ" not in tab and len(tab["value"]) == 6


def test_ddi_profile_matrix_and_jaccard():
    pairs = [(0, 1), (0, 2), (1, 2)]
    labels = [0, 1, 1]
    prof = ddi_profile_matrix(pairs, n_drugs=4, kind="partner")
    assert prof.shape == (4, 4)
    assert prof[0, 1] and prof[1, 0] and not prof[3].any()
    assert not prof[0, 0]

    lab = ddi_profile_matrix(pairs, 4, labels, kind="label")
    assert lab.shape == (4, 2)
    np.testing.assert_array_equal(lab[0], [True, True])
    np.testing.assert_array_equal(lab[1], [True, True])
    np.testing.assert_array_equal(lab[2], [False, True])

    pl = ddi_profile_matrix(pairs, 4, labels, kind="partner_label")
    assert pl.shape == (4, 8)
    assert pl[0, 1 * 2 + 0] and pl[1, 0 * 2 + 0] and pl[2, 0 * 2 + 1]

    with pytest.raises(ValueError):
        ddi_profile_matrix(pairs, 4, kind="label")

    sim = jaccard_similarity(prof)
    # drug 0: partners {1,2}; drug 1: {0,2}; intersection {2} union {0,1,2}
    assert sim[0, 1] == pytest.approx(1 / 3)
    assert sim[0, 3] == 0.0  # empty profile
    np.testing.assert_allclose(np.diag(sim), 1.0)
    np.testing.assert_allclose(sim, sim.T)


def test_binned_similarity_compare():
    rng = np.random.RandomState(0)
    x = np.concatenate([rng.uniform(-0.5, 0, 50),
                        rng.uniform(0, 1, 300)])
    y = 0.2 + 0.5 * np.clip(x, 0, 1) + rng.rand(350) * 0.05
    res = binned_similarity_compare(x, y, n_bins=3)
    assert res["bin_labels"][0] == "<0"
    assert len(res["bin_labels"]) == 4
    assert res["counts"].sum() == 350
    # monotone relationship -> increasing means, significant U test
    m = res["means"][1:]
    assert (np.diff(m) > 0).all()
    assert res["pvalue"] < 1e-6

    i, j = lower_triangle_pairs(4)
    assert len(i) == 6 and (i > j).all()


def test_high_similarity_contrast():
    rng = np.random.RandomState(1)
    n = 2000
    embed_sim = rng.rand(n)
    overlap = (rng.rand(n) < 0.3).astype(float)
    values = rng.randn(n)
    hi = embed_sim > 0.95
    # make shared-target high-sim pairs visibly higher
    values[hi & (overlap > 0)] += 3.0
    res = high_similarity_contrast(embed_sim, overlap, values,
                                   n_background=500)
    assert res["shared_pvalue"] < 1e-3
    assert res["unshared_pvalue"] > 1e-3
    assert len(res["background"]) == 500
    assert (len(res["shared_target"]) + len(res["no_shared_target"])
            == hi.sum())


@pytest.fixture(scope="module")
def setup():
    import jax

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
    from madrigal_tpu.models.encoder import MadrigalEncoder, init_encoder

    enc_cfg = EncoderConfig(
        feature_dim=16,
        gin=GINConfig(hidden_dims=(16, 16), num_mlp_layer=2),
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
    ds = make_dataset(num_drugs=20, num_labels=4, num_edges=20, seed=40)
    coll = DDICollator(ds, split="train")
    kg = coll.kg_batch()
    enc = MadrigalEncoder(cfg=enc_cfg)
    batch = coll.drug_batch(np.arange(8))
    v_before = init_encoder(enc, jax.random.PRNGKey(0), batch, kg)
    v_after = init_encoder(enc, jax.random.PRNGKey(7), batch, kg)

    def apply_fn(variables, batch, kg, raw):
        return enc.apply(
            variables, batch, kg, train=False, raw_encoder_output=raw,
            method=lambda m, b, k, train, raw_encoder_output: m.encode(
                b, kg=k, train=train, raw_encoder_output=raw_encoder_output),
        )

    return ds, coll, kg, apply_fn, v_before, v_after


def test_pretrain_embedding_shift(setup):
    ds, coll, kg, apply_fn, v_before, v_after = setup
    res = pretrain_embedding_shift(
        apply_fn, v_before, v_after, coll, kg, n_drugs=4, seed=1,
        modality_indices=(0, 1, 2), method="pca")
    k = len(res["modality"])
    assert k > 0 and res["coords_before"].shape == (k, 2)
    assert res["coords_after"].shape == (k, 2)
    assert res["projection"] == "pca"
    # str (modality 0) is always available -> every sampled drug appears
    assert set(res["drugs"]) <= set(res["drug"][res["modality"] == 0])
    for key in ("before", "after"):
        a = res["alignment"][key]
        assert np.isfinite(a) and -1.0 <= a <= 1.0
    # different params -> different alignment
    assert res["alignment"]["before"] != res["alignment"]["after"]


def test_per_drug_modality_alignment_degenerate():
    table = {"embeds": np.eye(3), "drug": np.array([0, 1, 2])}
    assert np.isnan(per_drug_modality_alignment(table))
    table = {"embeds": np.array([[1.0, 0.0], [1.0, 0.0]]),
             "drug": np.array([0, 0])}
    assert per_drug_modality_alignment(table) == pytest.approx(1.0)
