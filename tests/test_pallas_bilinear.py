"""Pallas bilinear scorer: parity with the XLA path (interpret mode on CPU;
the compiled kernel runs in bench/TPU environments)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from madrigal_tpu.ops.bilinear_pallas import (
    bilinear_scores_pallas,
    bilinear_scores_xla,
)


def test_pallas_matches_xla_interpret(rng):
    L, D, M, N = 3, 128, 256, 1024
    z1 = rng.randn(M, D).astype(np.float32)
    z2 = rng.randn(N, D).astype(np.float32)
    w = rng.randn(L, D, D).astype(np.float32)
    ref = np.asarray(bilinear_scores_xla(z1, z2, w, out_dtype=jnp.float32,
                                         compute_dtype=jnp.float32))
    out = np.asarray(bilinear_scores_pallas(
        z1, z2, w, tile_m=128, tile_n=256, out_dtype=jnp.float32,
        compute_dtype=jnp.float32, interpret=True,
    ))
    np.testing.assert_allclose(out, ref, atol=1e-3, rtol=1e-3)


def test_pallas_padding_roundtrip(rng):
    """Non-tile-multiple N: padded compute, sliced back."""
    L, D = 2, 128
    z = rng.randn(300, D).astype(np.float32)  # not a multiple of tiles
    w = rng.randn(L, D, D).astype(np.float32)
    ref = np.asarray(bilinear_scores_xla(z, z, w, out_dtype=jnp.float32,
                                         compute_dtype=jnp.float32))
    out = np.asarray(bilinear_scores_pallas(
        z, z, w, tile_m=128, tile_n=128, out_dtype=jnp.float32,
        compute_dtype=jnp.float32, interpret=True,
    ))
    assert out.shape == ref.shape == (L, 300, 300)
    np.testing.assert_allclose(out, ref, atol=1e-3, rtol=1e-3)


def test_triples_chunked_matches_direct(rng, monkeypatch):
    """The scanned chunked triple scorer (big-T memory path) is numerically
    identical to the direct gather and differentiates correctly."""
    import jax
    import jax.numpy as jnp

    from madrigal_tpu.models.decoder import BilinearDDIScorer

    T, D, L = 50, 8, 6
    dec = BilinearDDIScorer(num_labels=L, input_dim1=D, input_dim2=D)
    zh = jnp.asarray(rng.randn(T, D).astype(np.float32))
    zt = jnp.asarray(rng.randn(T, D).astype(np.float32))
    lb = jnp.asarray(rng.randint(0, L, T), jnp.int32)
    variables = dec.init(jax.random.PRNGKey(0), zh, zt)

    direct = dec.apply(variables, zh, zt, lb,
                       method=BilinearDDIScorer.triples)

    monkeypatch.setattr(BilinearDDIScorer, "TRIPLE_CHUNK", 16)  # force scan
    chunked = dec.apply(variables, zh, zt, lb,
                        method=BilinearDDIScorer.triples)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(direct),
                               atol=1e-6)

    # gradients agree (incl. wrt the decoder weight through the remat)
    def loss(vs, fn_chunk):
        monkeypatch.setattr(BilinearDDIScorer, "TRIPLE_CHUNK",
                            16 if fn_chunk else 10 ** 9)
        return jnp.sum(dec.apply(vs, zh, zt, lb,
                                 method=BilinearDDIScorer.triples) ** 2)

    g1 = jax.grad(lambda v: loss(v, False))(variables)
    g2 = jax.grad(lambda v: loss(v, True))(variables)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_label_chunked_scan_matches_direct(rng, monkeypatch):
    """The label-chunked triple scorer's scan path (T > TRIPLE_CHUNK *
    label_chunk, incl. a non-divisible tail that pads) matches the direct
    label-chunked evaluation and differentiates identically."""
    import jax
    import jax.numpy as jnp

    from madrigal_tpu.models.decoder import BilinearDDIScorer

    lc, D, L = 4, 8, 6
    T = 56  # scan chunk C = 4*4 = 16 -> 3 full chunks + padded tail
    dec = BilinearDDIScorer(num_labels=L, input_dim1=D, input_dim2=D)
    zh = jnp.asarray(rng.randn(T, D).astype(np.float32))
    zt = jnp.asarray(rng.randn(T, D).astype(np.float32))
    # label-chunked layout: chunk-constant labels
    cl = jnp.asarray(rng.randint(0, L, T // lc), jnp.int32)
    lb = jnp.repeat(cl, lc)
    variables = dec.init(jax.random.PRNGKey(0), zh, zt)

    def run(vs, triple_chunk):
        monkeypatch.setattr(BilinearDDIScorer, "TRIPLE_CHUNK", triple_chunk)
        # scan chunk C = max(TRIPLE_CHUNK, SCAN_WEIGHT_ROWS * lc) = 16
        # -> 3 full chunks + padded tail
        monkeypatch.setattr(BilinearDDIScorer, "SCAN_WEIGHT_ROWS", 4)
        return dec.apply(vs, zh, zt, lb, chunk_labels=cl, label_chunk=lc,
                         method=BilinearDDIScorer.triples)

    direct = run(variables, 10 ** 9)
    scanned = run(variables, 4)
    assert scanned.shape == (T,)
    np.testing.assert_allclose(np.asarray(scanned), np.asarray(direct),
                               atol=1e-6)
    # against the per-triple gather path too
    monkeypatch.setattr(BilinearDDIScorer, "TRIPLE_CHUNK", 10 ** 9)
    per_triple = dec.apply(variables, zh, zt, lb,
                           method=BilinearDDIScorer.triples)
    np.testing.assert_allclose(np.asarray(scanned),
                               np.asarray(per_triple), atol=1e-6)

    g1 = jax.grad(lambda v: jnp.sum(run(v, 10 ** 9) ** 2))(variables)
    g2 = jax.grad(lambda v: jnp.sum(run(v, 4) ** 2))(variables)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
