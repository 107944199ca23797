"""Analysis-layer tests: tensor queries + enrichment statistics (the
computational core of the reference's fig1-6 notebooks)."""
import json

import numpy as np
import pytest

from madrigal_tpu.analysis import (
    aggregate_outcomes,
    cv_validation_auroc,
    external_validation,
    load_outcome_mapper,
    map_outcome_labels,
    pair_values,
    rank_enrichment,
    self_combo_scores,
    topk_novel_pairs,
)


@pytest.fixture(scope="module")
def rank_tensor():
    """A genuine normalized-rank tensor built by the production path."""
    import jax.numpy as jnp

    from madrigal_tpu.eval.ranks import rank_tensor as build
    from madrigal_tpu.models.decoder import symmetrize

    rng = np.random.RandomState(3)
    z = rng.randn(20, 8).astype(np.float32)
    w = np.asarray(symmetrize(jnp.asarray(
        rng.randn(5, 8, 8).astype(np.float32))))
    return build(z, w, chunk=2)


def test_self_combo_and_pair_values(rank_tensor):
    t = rank_tensor
    diag = self_combo_scores(t)
    assert diag.shape == (5, 20)
    assert (diag == 0).all()  # normalized ranks zero the diagonal

    pairs = [(3, 1), (1, 3), (19, 0)]
    vals = pair_values(t, pairs)
    assert vals.shape == (5, 3)
    np.testing.assert_allclose(vals[:, 0], vals[:, 1])  # symmetric lookup
    np.testing.assert_allclose(vals[:, 0], t[:, 3, 1])
    sub = pair_values(t, pairs, labels=[2, 4])
    np.testing.assert_allclose(sub[0, 0], t[2, 3, 1], atol=0)
    assert sub.shape == (2, 3)


def test_aggregate_outcomes(rank_tensor):
    t = rank_tensor
    g = aggregate_outcomes(t, [0, 2], agg="gmean")
    tril = np.tri(20, k=-1, dtype=bool)
    np.testing.assert_allclose(
        g[tril], np.sqrt(t[0][tril].astype(np.float64)
                         * t[2][tril].astype(np.float64)), rtol=1e-12)
    m = aggregate_outcomes(t, [0, 2], agg="mean")
    np.testing.assert_allclose(m, (t[0].astype(np.float64)
                                   + t[2]. astype(np.float64)) / 2)
    x = aggregate_outcomes(t, [0, 2], agg="max")
    np.testing.assert_allclose(x, np.maximum(t[0], t[2]))
    with pytest.raises(ValueError):
        aggregate_outcomes(t, [])


def test_topk_novel_pairs(rank_tensor):
    mat = rank_tensor[1]
    pairs, vals = topk_novel_pairs(mat, 5)
    assert pairs.shape == (5, 2) and (pairs[:, 0] > pairs[:, 1]).all()
    assert (np.diff(vals) <= 0).all()  # descending
    # the global max over the strict lower triangle is returned first
    tril = np.tri(20, k=-1, dtype=bool)
    assert vals[0] == mat[tril].max()

    # exclusion: mask out the top pair -> it disappears
    known = np.zeros((20, 20), bool)
    known[pairs[0, 0], pairs[0, 1]] = True
    p2, v2 = topk_novel_pairs(mat, 5, known_mask=known)
    assert not ((p2 == pairs[0]).all(axis=1)).any()
    assert v2[0] == mat[tril & ~(known | known.T)].max()

    # smallest-first
    p3, v3 = topk_novel_pairs(mat, 3, largest=False)
    assert (np.diff(v3) >= 0).all()
    assert v3[0] == mat[tril].min()


def test_rank_enrichment(rank_tensor):
    mat = np.asarray(rank_tensor[0], np.float64)
    tril = np.tri(20, k=-1, dtype=bool)
    # candidates = the top-10 ranked pairs -> strong enrichment
    pairs, _ = topk_novel_pairs(mat, 10)
    res = rank_enrichment(mat, pairs, alternative="greater")
    assert res.pvalue < 1e-4
    # order-insensitive pair spec
    res_swapped = rank_enrichment(mat, pairs[:, ::-1],
                                  alternative="greater")
    assert res_swapped.pvalue == res.pvalue
    # random candidates -> not significant
    rng = np.random.RandomState(0)
    rand = np.stack(np.nonzero(tril), axis=1)
    rand = rand[rng.choice(len(rand), 10, replace=False)]
    res_rand = rank_enrichment(mat, rand, alternative="greater")
    assert res_rand.pvalue > 1e-3
    # explicit background
    res_bg = rank_enrichment(mat, pairs, background_pairs=rand,
                             alternative="greater")
    assert res_bg.pvalue < 0.05


def test_analyze_cli_end_to_end(rank_tensor, tmp_path, capsys):
    """cli.analyze over an exported memmap tensor: pair lookups, topk with
    known-DDI exclusion, aggregation, enrichment, outcome-mapper
    resolution — the notebook workflow without writing Python."""
    from madrigal_tpu.cli.analyze import main

    tpath = tmp_path / "ranks.npy"
    np.save(tpath, np.asarray(rank_tensor, np.float32))

    # pair lookups + self-combo export
    main(["--tensor", str(tpath), "--pairs", "3:1", "19:0",
          "--labels", "0,2", "--self_combo", str(tmp_path / "sc.npy")])
    out = json.loads(capsys.readouterr().out)
    np.testing.assert_allclose(
        out["pairs"]["values"],
        np.asarray(rank_tensor)[[0, 2]][:, [3, 19], [1, 0]], rtol=1e-6)
    sc = np.load(tmp_path / "sc.npy")
    assert sc.shape == (5, 20) and (sc == 0).all()

    # topk with known-mask exclusion
    pairs, vals = topk_novel_pairs(np.asarray(rank_tensor[1]), 1)
    known = np.zeros((20, 20), bool)
    known[pairs[0, 0], pairs[0, 1]] = True
    np.save(tmp_path / "known.npy", known)
    main(["--tensor", str(tpath), "--label", "1", "--topk", "3",
          "--known", str(tmp_path / "known.npy")])
    out = json.loads(capsys.readouterr().out)
    assert len(out["topk"]["pairs"]) == 3
    assert [int(pairs[0, 0]), int(pairs[0, 1])] not in out["topk"]["pairs"]

    # aggregate + topk over the aggregate + enrichment of top candidates
    cand = np.stack(topk_novel_pairs(
        aggregate_outcomes(rank_tensor, [0, 2]), 8)[0])
    np.savetxt(tmp_path / "cand.csv", cand, fmt="%d")
    main(["--tensor", str(tpath), "--aggregate", "gmean",
          "--labels", "0,2", "--out", str(tmp_path / "agg.npy"),
          "--topk", "2", "--enrich", str(tmp_path / "cand.csv")])
    out = json.loads(capsys.readouterr().out)
    agg = np.load(tmp_path / "agg.npy")
    np.testing.assert_allclose(
        agg, aggregate_outcomes(rank_tensor, [0, 2]).astype(np.float32),
        rtol=1e-6)
    assert out["enrichment"]["pvalue"] < 1e-3
    np.testing.assert_allclose(
        out["topk"]["values"],
        topk_novel_pairs(agg.astype(np.float64), 2)[0:2][1], rtol=1e-5)

    # outcome-mapper label resolution drives --pairs
    mapper = {"neutro": {"twosides": ["L1", "L3"]}}
    (tmp_path / "mapper.json").write_text(json.dumps(mapper))
    (tmp_path / "names.txt").write_text("L0\nL1\nL2\nL3\nL4\n")
    main(["--tensor", str(tpath), "--pairs", "3:1",
          "--outcome", "neutro",
          "--outcome_mapper", str(tmp_path / "mapper.json"),
          "--label_names", str(tmp_path / "names.txt")])
    out = json.loads(capsys.readouterr().out)
    assert out["pairs"]["labels"] == [1, 3]


def test_external_validation_binary_and_continuous():
    rng = np.random.RandomState(5)
    # binary: values strictly separate classes -> AUROC 1
    y = (rng.rand(60) > 0.5).astype(float)
    vals = y * 2 + rng.rand(60)  # positives strictly above negatives
    res = external_validation(vals, y)
    assert res["kind"] == "binary" and res["auroc"] == 1.0
    np.testing.assert_allclose(res["auprc"], 1.0, rtol=1e-12)
    assert res["n"] == 60

    # continuous: monotone relation -> spearman 1, tiny p
    t = rng.randn(40)
    res = external_validation(np.tanh(t), t)
    assert res["kind"] == "continuous"
    np.testing.assert_allclose(res["spearman"], 1.0)
    assert res["spearman_pvalue"] < 1e-10
    assert 0.9 < res["kendall"] <= 1.0

    # anti-correlated + NaN filtering
    vals = -t.copy()
    vals[3] = np.nan
    res = external_validation(vals, t, kind="continuous")
    assert res["n"] == 39 and res["spearman"] < -0.99

    with pytest.raises(ValueError):
        external_validation(np.zeros(3), np.zeros(4))


def test_cv_validation_auroc():
    rng = np.random.RandomState(7)
    n = 120
    y = (rng.rand(n) > 0.5).astype(float)
    # informative feature + noise feature: CV AUROC well above chance
    feats = np.stack([y * 3 + rng.randn(n), rng.randn(n)], axis=1)
    res = cv_validation_auroc(feats, y, folds=5)
    assert res["auroc"] > 0.9 and res["folds"] == 5
    assert res["alpha"] in (1e-3, 1e-2, 1e-1, 1.0, 10.0)
    # pure-noise features: near chance
    res_noise = cv_validation_auroc(rng.randn(n, 2), y, folds=5)
    assert res_noise["auroc"] < 0.75
    # degenerate: single positive cannot form folds
    with pytest.raises(ValueError):
        cv_validation_auroc(feats[:4], np.array([1.0, 0, 0, 0]))


def test_analyze_cli_validate(rank_tensor, tmp_path, capsys):
    """--validate / --cv_auroc: the fig6 external-validation protocol on
    an exported tensor."""
    from madrigal_tpu.cli.analyze import main

    tpath = tmp_path / "ranks.npy"
    np.save(tpath, np.asarray(rank_tensor, np.float32))
    mat = np.asarray(rank_tensor[2], np.float64)

    # binary targets: top pairs labeled 1, bottom pairs labeled 0 -> AUROC 1
    top, _ = topk_novel_pairs(mat, 6)
    bot, _ = topk_novel_pairs(mat, 6, largest=False)
    pairs = np.concatenate([top, bot])
    targets = np.concatenate([np.ones(6), np.zeros(6)])
    rows = np.column_stack([pairs, targets])
    np.savetxt(tmp_path / "val.csv", rows, fmt="%.1f")
    main(["--tensor", str(tpath), "--label", "2",
          "--validate", str(tmp_path / "val.csv")])
    out = json.loads(capsys.readouterr().out)
    assert out["validation"]["kind"] == "binary"
    assert out["validation"]["auroc"] == 1.0

    # continuous targets = the matrix values themselves -> spearman 1
    a = np.maximum(pairs[:, 0], pairs[:, 1])
    b = np.minimum(pairs[:, 0], pairs[:, 1])
    rows = np.column_stack([pairs, mat[a, b]])
    np.savetxt(tmp_path / "valc.csv", rows)
    main(["--tensor", str(tpath), "--label", "2",
          "--validate", str(tmp_path / "valc.csv")])
    out = json.loads(capsys.readouterr().out)
    np.testing.assert_allclose(out["validation"]["spearman"], 1.0)

    # cv_auroc over two labels' values as features
    rows = np.column_stack([pairs, targets])
    np.savetxt(tmp_path / "val.csv", rows, fmt="%.1f")
    main(["--tensor", str(tpath), "--labels", "0,2", "--cv_auroc",
          "--validate", str(tmp_path / "val.csv")])
    out = json.loads(capsys.readouterr().out)
    assert out["cv_auroc"]["labels"] == [0, 2]
    assert 0.0 <= out["cv_auroc"]["auroc"] <= 1.0
    assert out["cv_auroc"]["folds"] >= 2


def test_outcome_mapper(tmp_path):
    mapper = {"neutropenia": {"drugbank": ["neutropenia, increase"],
                              "twosides": ["Neutropenia", "Leukopenia"]}}
    p = tmp_path / "mapper.json"
    p.write_text(json.dumps(mapper))
    m = load_outcome_mapper(str(p))
    labels = ["headache", "neutropenia", "leukopenia", "nausea"]
    idx = map_outcome_labels(m, "neutropenia", "twosides", labels)
    assert idx == [1, 2]
    assert map_outcome_labels(m, "neutropenia", "drugbank", labels) == []

    # the real reference mapper parses when available
    import os

    real = "/root/reference/notebooks/outcome_mapper.json"
    if os.path.exists(real):
        rm = load_outcome_mapper(real)
        assert "neutropenia" in rm
        assert isinstance(rm["neutropenia"]["twosides"], list)
