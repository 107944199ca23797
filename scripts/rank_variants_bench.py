"""Micro-benchmark: rank-normalization kernel variants on the real chip.

Variants of the per-outcome [N, N] double-argsort (eval/ranks.py):
  A. current: jnp.argsort twice (stable)
  B. lax.sort unstable, explicit iota payloads (first sort f32 keys,
     second sort int32 keys) -- ranks identical for distinct scores
  C. B but second inversion via one sort with (order, iota) payload

Usage: python scripts/rank_variants_bench.py
"""
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
from jax import lax

N = 6843
REPS = 3


def lower_tri_vals(scores):
    n = scores.shape[0]
    rows = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    tril = rows > cols
    return tril, jnp.where(tril, scores, jnp.inf).reshape(-1)


@jax.jit
def variant_a(scores):
    n = scores.shape[0]
    m = n * (n - 1) // 2
    tril, vals = lower_tri_vals(scores)
    order = jnp.argsort(vals)
    ranks = jnp.argsort(order).astype(jnp.float32) + 1.0
    out = jnp.where(tril, ranks.reshape(n, n) / m, 0.0)
    return out + out.T


@jax.jit
def variant_b(scores):
    n = scores.shape[0]
    m = n * (n - 1) // 2
    tril, vals = lower_tri_vals(scores)
    iota = lax.iota(jnp.int32, vals.shape[0])
    _, order = lax.sort((vals, iota), is_stable=False, num_keys=1)
    _, inv = lax.sort((order, iota), is_stable=False, num_keys=1)
    ranks = inv.astype(jnp.float32) + 1.0
    out = jnp.where(tril, ranks.reshape(n, n) / m, 0.0)
    return out + out.T


@jax.jit
def variant_c(scores):
    # one combined sort carrying both payloads through the first pass
    n = scores.shape[0]
    m = n * (n - 1) // 2
    tril, vals = lower_tri_vals(scores)
    iota = lax.iota(jnp.int32, vals.shape[0])
    _, order = lax.sort((vals, iota), is_stable=False, num_keys=1)
    # invert: scatter-free via sort of (order, iota)
    _, inv = lax.sort((order, iota), is_stable=True, num_keys=1)
    ranks = inv.astype(jnp.float32) + 1.0
    out = jnp.where(tril, ranks.reshape(n, n) / m, 0.0)
    return out + out.T


def timeit(fn, x):
    out = fn(x)
    float(jnp.max(out[0, :8]))  # compile + completion read
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(x)
    float(jnp.max(out[0, :8]))
    return (time.perf_counter() - t0) / REPS


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N, N).astype(np.float32))

    # correctness cross-check on a small case
    xs = jnp.asarray(rng.randn(256, 256).astype(np.float32))
    a = np.asarray(variant_a(xs))
    for name, fn in (("b", variant_b), ("c", variant_c)):
        np.testing.assert_allclose(np.asarray(fn(xs)), a, atol=1e-6,
                                   err_msg=name)
    print("variants agree on 256x256")

    for name, fn in (("a_stable_argsort", variant_a),
                     ("b_unstable_laxsort", variant_b),
                     ("c_mixed", variant_c)):
        dt = timeit(fn, x)
        print(f"{name}: {dt * 1e3:.1f} ms/outcome")


if __name__ == "__main__":
    main()
