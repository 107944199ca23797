"""Triple-decoder scan granularity at reference scale on the real chip.

The label-chunked triple scorer (models/decoder.py `triples`) scans the
T=1M-triple full batch in chunks whose size bounds the gathered
[C/lc, D, D] weight slice. The original TRIPLE_CHUNK=8192 was sized for
the PER-TRIPLE path's [8192, D, D] = 512 MB gather; applied verbatim to
the label-chunked layout it yields 128 serialized scan steps of only 8 MB
each. Scaling the chunk by label_chunk restores the 512 MB envelope with
2 steps. This measures fwd and fwd+bwd of both (plus scan-free), standalone.

Usage: python scripts/decoder_bench.py [--triples 1048576] [--lc 64]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

from madrigal_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax.numpy as jnp

from madrigal_tpu.models.decoder import BilinearDDIScorer


def timeit(fn, *args, reps=3):
    out = fn(*args)
    first = jax.tree_util.tree_leaves(out)[0]
    float(jnp.max(jnp.ravel(first)[:8]))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        first = jax.tree_util.tree_leaves(out)[0]
        float(jnp.max(jnp.ravel(first)[:8]))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--triples", type=int, default=1 << 20)
    ap.add_argument("--lc", type=int, default=64)
    ap.add_argument("--labels", type=int, default=960)
    ap.add_argument("--dim", type=int, default=128)
    args = ap.parse_args()
    T, lc, L, D = args.triples, args.lc, args.labels, args.dim

    rng = np.random.RandomState(0)
    zh = jnp.asarray(rng.randn(T, D).astype(np.float32))
    zt = jnp.asarray(rng.randn(T, D).astype(np.float32))
    cl = jnp.asarray(rng.randint(0, L, T // lc), jnp.int32)
    dec = BilinearDDIScorer(num_labels=L, input_dim1=D, input_dim2=D)
    variables = jax.jit(
        lambda: dec.init(jax.random.PRNGKey(0), zh[:8], zt[:8]))()

    # TRIPLE_CHUNK values -> effective label-chunked scan chunk C = tc*lc
    for name, tc in (("steps128_Ceff8192", 8192 // lc),
                     ("steps2_Ceff512k", 8192),
                     ("noscan", 10 ** 9)):
        BilinearDDIScorer.TRIPLE_CHUNK = tc

        @jax.jit
        def fwd(v, zh, zt, cl):
            return dec.apply(v, zh, zt, None, chunk_labels=cl,
                             label_chunk=lc,
                             method=BilinearDDIScorer.triples)

        @jax.jit
        def fwd_bwd(v, zh, zt, cl):
            def f(vv):
                s = dec.apply(vv, zh, zt, None, chunk_labels=cl,
                              label_chunk=lc,
                              method=BilinearDDIScorer.triples)
                return jnp.sum(s ** 2)
            return jax.value_and_grad(f)(v)

        dt_f = timeit(fwd, variables, zh, zt, cl)
        dt_fb = timeit(fwd_bwd, variables, zh, zt, cl)
        print(f"{name}: fwd {dt_f * 1e3:.1f} ms, fwd+bwd "
              f"{dt_fb * 1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
