"""Rank-normalization parity vs the reference's numpy pipeline
(notebooks/normalize_scores.py:36-90) + sharded label-parallel execution on
the 8-device virtual mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from madrigal_tpu.eval.ranks import (
    normalized_rank_matrix,
    normalized_ranks_for_outcomes,
    rank_tensor,
)


def reference_normalize(raw_scores):
    """Faithful numpy re-implementation of classwise_normalized_rank_3d
    (normalize_scores.py:36-74) for the oracle."""
    raw = raw_scores.copy()
    L, N, _ = raw.shape
    iu = np.triu_indices(N, k=0)
    raw[:, iu[0], iu[1]] = 1e7
    flat = raw.reshape(L, -1)
    rank = flat.argsort(axis=1, kind="stable").argsort(
        axis=1, kind="stable") + 1
    norm = (rank / (N * (N - 1) / 2)).reshape(raw.shape)
    norm[:, iu[0], iu[1]] = 0
    return norm + norm.swapaxes(1, 2)


def test_rank_matrix_matches_reference(rng):
    N = 30
    scores = rng.randn(3, N, N).astype(np.float32)
    ref = reference_normalize(scores.astype(np.float64)).astype(np.float32)
    for l in range(3):
        out = np.asarray(normalized_rank_matrix(jnp.asarray(scores[l])))
        np.testing.assert_allclose(out, ref[l], atol=1e-6)


@pytest.mark.parametrize("n", [30, 130, 300])
def test_rank_matrix_compact_matches_flat(rng, n):
    """The tri-tile-compacted sort path (round-4: sorts 52% of n^2
    instead of ~half +inf sentinels) is bit-identical to the flat path
    for distinct scores, across n < tile, n % tile != 0, n > 2*tile.
    (Distinct by construction: f32 randn at n=300 draws ~18 exact
    duplicates, and under ties the two layouts assign the tied ranks in
    a different -- equally arbitrary -- order.)"""
    scores = (rng.permutation(n * n).astype(np.float32)
              .reshape(n, n) - n * n / 2) / n
    flat = np.asarray(normalized_rank_matrix(
        jnp.asarray(scores), stable=False, compact=False))
    comp = np.asarray(normalized_rank_matrix(
        jnp.asarray(scores), stable=False, compact=True))
    np.testing.assert_array_equal(comp, flat)
    # and against the reference oracle
    ref = reference_normalize(
        scores[None].astype(np.float64)).astype(np.float32)[0]
    np.testing.assert_allclose(comp, ref, atol=1e-6)


def test_rank_tensor_from_embeddings(rng):
    N, D, L = 24, 16, 5
    z = rng.randn(N, D).astype(np.float32)
    w = rng.randn(L, D, D).astype(np.float32)
    w_sym = np.triu(w) + np.transpose(np.triu(w, 1), (0, 2, 1))

    out = rank_tensor(z, w_sym, chunk=2)
    scores = np.einsum("nd,lde,me->lnm", z, w_sym, z)
    ref = reference_normalize(scores.astype(np.float64)).astype(np.float32)
    np.testing.assert_allclose(out, ref, atol=1e-5)

    # symmetry + range invariants
    for l in range(L):
        np.testing.assert_allclose(out[l], out[l].T, atol=0)
        assert out[l].max() <= 1.0 + 1e-6
        assert np.all(np.diag(out[l]) == 0)


def test_sharded_rank_tensor_matches_single(rng):
    from madrigal_tpu.parallel.allpairs import sharded_rank_tensor
    from madrigal_tpu.parallel.mesh import make_mesh

    N, D, L = 24, 16, 10
    z = rng.randn(N, D).astype(np.float32)
    w = rng.randn(L, D, D).astype(np.float32)
    w_sym = np.triu(w) + np.transpose(np.triu(w, 1), (0, 2, 1))

    mesh = make_mesh(("label",))
    assert mesh.shape["label"] == 8
    out = sharded_rank_tensor(mesh, z, w_sym, chunk_per_device=1,
                              compute_dtype=jnp.float32)
    ref = rank_tensor(z, w_sym, chunk=4)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_ensemble_gmean_rerank(rng):
    from madrigal_tpu.eval.ranks import ensemble_normalized_ranks

    N = 16
    r1 = np.asarray(normalized_rank_matrix(
        jnp.asarray(rng.randn(N, N).astype(np.float32))))
    r2 = np.asarray(normalized_rank_matrix(
        jnp.asarray(rng.randn(N, N).astype(np.float32))))
    out = ensemble_normalized_ranks([r1[None], r2[None]])
    assert out.shape == (1, N, N)
    np.testing.assert_allclose(out[0], out[0].T)
    assert out[0].max() <= 1.0 + 1e-6
