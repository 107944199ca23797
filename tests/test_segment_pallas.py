"""ops/segment_pallas.py + the src-sorted HGT backward (gather_rows_mxu).

On CPU the Pallas kernel runs in interpreter mode (same code path the
TPU compiles), so these tests exercise the production backward layout
end to end: kernel vs jax.ops.segment_sum, the gather op's gradient vs
the plain-gather gradient, the build_kg_batch(src_sort=True) layout
invariants, and full-model HGT gradient parity with the layout on/off.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from madrigal_tpu.config import HGTConfig

# Interpreter-mode Pallas is minutes-heavy on the 1-core host; the fast
# lane (-m "not slow") skips this file, the full suite keeps it.
pytestmark = pytest.mark.slow
from madrigal_tpu.data.kg import build_kg_batch
from madrigal_tpu.models.hgt import HGTEncoder
from madrigal_tpu.ops.gather import gather_rows_mxu
from madrigal_tpu.ops.segment_pallas import (
    segment_starts_np,
    sorted_segment_sum_mxu,
    supports_mxu_segment_sum,
)


@pytest.mark.parametrize("e,n,w", [(2048, 300, 128), (4096, 37, 256),
                                   (512, 5, 128), (1024, 1000, 128)])
def test_kernel_matches_segment_sum(e, n, w):
    rng = np.random.RandomState(0)
    ids = np.sort(rng.randint(0, n, e)).astype(np.int32)
    data = rng.randn(e, w).astype(np.float32)
    ref = jax.ops.segment_sum(jnp.asarray(data), jnp.asarray(ids),
                              num_segments=n)
    got = sorted_segment_sum_mxu(
        jnp.asarray(data), jnp.asarray(segment_starts_np(ids, n)), n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-6, atol=1e-5)


def test_kernel_ignores_trailing_padding_rows():
    rng = np.random.RandomState(1)
    e, real, n, w = 1024, 900, 64, 128
    ids = np.sort(rng.randint(0, n, real)).astype(np.int32)
    data = rng.randn(e, w).astype(np.float32)  # rows >= real are garbage
    starts = segment_starts_np(ids, n, total_rows=real)
    ref = jax.ops.segment_sum(jnp.asarray(data[:real]), jnp.asarray(ids),
                              num_segments=n)
    got = sorted_segment_sum_mxu(jnp.asarray(data), jnp.asarray(starts), n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-6, atol=1e-5)


def test_kernel_bf16_accumulates_f32():
    rng = np.random.RandomState(2)
    e, n, w = 2048, 100, 128
    ids = np.sort(rng.randint(0, n, e)).astype(np.int32)
    data = rng.randn(e, w).astype(np.float32)
    d16 = jnp.asarray(data).astype(jnp.bfloat16)
    got = sorted_segment_sum_mxu(
        d16, jnp.asarray(segment_starts_np(ids, n)), n)
    assert got.dtype == jnp.float32
    ref = jax.ops.segment_sum(d16.astype(jnp.float32), jnp.asarray(ids),
                              num_segments=n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_supports_gate():
    assert supports_mxu_segment_sum(jnp.float32, 128)
    assert supports_mxu_segment_sum(jnp.bfloat16, 256)
    assert not supports_mxu_segment_sum(jnp.float64, 128)
    assert not supports_mxu_segment_sum(jnp.float32, 96)


def test_gather_rows_mxu_grad_matches_plain_gather():
    rng = np.random.RandomState(3)
    n, e, w = 50, 600, 128
    idx = rng.randint(0, n, e).astype(np.int32)
    order = np.argsort(idx, kind="stable").astype(np.int32)
    starts = segment_starts_np(idx[order], n)
    table = rng.randn(n, w).astype(np.float32)
    cot = rng.randn(e, w).astype(np.float32)

    def loss_mxu(t):
        return jnp.vdot(gather_rows_mxu(
            t, jnp.asarray(idx), jnp.asarray(order), jnp.asarray(starts)),
            jnp.asarray(cot))

    def loss_plain(t):
        return jnp.vdot(t[jnp.asarray(idx)], jnp.asarray(cot))

    t = jnp.asarray(table)
    np.testing.assert_allclose(loss_mxu(t), loss_plain(t), rtol=1e-6)
    g_mxu = jax.grad(loss_mxu)(t)
    g_plain = jax.grad(loss_plain)(t)
    np.testing.assert_allclose(np.asarray(g_mxu), np.asarray(g_plain),
                               rtol=2e-6, atol=1e-5)


def _tiny_kg(src_sort, edge_chunk, n_drug=9, n_gene=7, seed=0):
    rng = np.random.RandomState(seed)
    feats = {"drug": rng.randn(n_drug, 128).astype(np.float32),
             "gene": rng.randn(n_gene, 128).astype(np.float32)}
    edges = {
        ("drug", "targets", "gene"): np.stack([
            rng.randint(0, n_drug, 23), rng.randint(0, n_gene, 23)]),
        ("gene", "ppi", "gene"): np.stack([
            rng.randint(0, n_gene, 31), rng.randint(0, n_gene, 31)]),
        ("drug", "interacts", "drug"): np.stack([
            rng.randint(0, n_drug, 17), rng.randint(0, n_drug, 17)]),
    }
    return build_kg_batch(feats, edges, list(range(n_drug)),
                          pad_multiple=8, edge_chunk=edge_chunk,
                          src_sort=src_sort)


def test_src_sort_layout_invariants():
    g = _tiny_kg(src_sort=True, edge_chunk=8)
    for ek, order in g.edge_src_order.items():
        src = np.asarray(g.edge_src[ek])
        msk = np.asarray(g.edge_mask[ek])
        order = np.asarray(order)
        starts = np.asarray(g.edge_src_starts[ek])
        n_real = int(msk.sum())
        assert starts[-1] == n_real
        # real edges first, sorted by src; each segment span holds exactly
        # the positions of that src's real edges
        real = order[:n_real]
        assert msk[real].all()
        assert (np.diff(src[real]) >= 0).all()
        for s in range(starts.shape[0] - 1):
            span = real[starts[s]:starts[s + 1]]
            assert (src[span] == s).all()
        assert not msk[order[n_real:]].any()


@pytest.mark.parametrize("edge_chunk", [0, 8])
@pytest.mark.parametrize("scope", ["per_edge_type", "global"])
def test_hgt_grads_match_with_src_sort(edge_chunk, scope):
    g_plain = _tiny_kg(src_sort=False, edge_chunk=edge_chunk)
    g_sort = _tiny_kg(src_sort=True, edge_chunk=edge_chunk)
    cfg = HGTConfig(hidden_dim=128, num_layers=2, att_heads=4,
                    softmax_scope=scope)
    enc = HGTEncoder(cfg=cfg, embed_dim=128)
    params = enc.init(jax.random.PRNGKey(0), g_plain)

    def loss(p, g):
        out = enc.apply(p, g)
        return sum(jnp.sum(v ** 2) for v in out.values())

    l0, g0 = jax.value_and_grad(loss)(params, g_plain)
    l1, g1 = jax.value_and_grad(loss)(params, g_sort)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=1e-5)
