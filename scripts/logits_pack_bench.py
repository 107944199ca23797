"""Probe: cost of materializing [E, H] attention logits/alpha on TPU.

XLA/TPU pads HBM buffer layouts to (8, 128) tiles, so an [E, H=4] f32
array physically occupies E x 128 x 4 bytes -- 32x its logical size (the
"28% program utilization" seen in full-scale HGT OOM dumps). The HGT's
per-head logits and alpha are exactly such arrays (models/hgt.py).

Variants (E = 8.3M, F = 128, H = 4; each ends in a chunk-partial reduce so
the value is consumed):

  a_eh_reduce     logits = x.reshape(E, H, D).sum(-1)        ([E, H] buffer)
                  y = repeat(logits, D) * x; chunk-partial sum
  b_packed_dot    logits_p = x.reshape(E/32, 32F) @ W_sum    ([E/32, 128])
                  y = broadcast-from-packed * x; chunk-partial sum
  c_stream_bound  y = x * 2; chunk-partial sum               (no logits)

If (a) pays the padded write+read, a >> c and b ~ c + matmul.

Usage: python scripts/logits_pack_bench.py [--bf16]
"""
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

E = 8_294_400  # multiple of 32*8
F = 128
H = 4
D = F // H
PACK = 128 // H  # edges per packed row


def pack_weight(dtype):
    """[PACK*F, PACK*H] block-diagonal sum matrix: row (i*F + h*D + d),
    col (i*H + h) = 1 -- one MXU pass turns [E/PACK, PACK*F] into packed
    per-head sums [E/PACK, PACK*H=128]."""
    w = np.zeros((PACK * F, PACK * H), np.float32)
    for i in range(PACK):
        for h in range(H):
            w[i * F + h * D:(i * F + h * D) + D, i * H + h] = 1.0
    return jnp.asarray(w, dtype)


def timeit(fn, *args, reps=3):
    out = fn(*args)
    float(jnp.max(out.reshape(-1)[:8]))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.max(out.reshape(-1)[:8]))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    dtype = jnp.bfloat16 if "--bf16" in sys.argv else jnp.float32
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(E, F).astype(np.float32)).astype(dtype)
    w = pack_weight(dtype)

    @jax.jit
    def a_eh_reduce(x):
        logits = x.reshape(E, H, D).sum(-1)  # [E, H] materializes
        y = jnp.repeat(logits, D, axis=-1) * x
        return y.reshape(-1, 8, F).sum(1)

    @jax.jit
    def b_packed_dot(x):
        logits_p = x.reshape(E // PACK, PACK * F) @ w  # [E/32, 128]
        rep = logits_p.reshape(E, H)  # consumed fused (index math only)
        y = jnp.repeat(rep, D, axis=-1) * x
        return y.reshape(-1, 8, F).sum(1)

    @jax.jit
    def b2_packed_dot_exact(x):
        # f32-exact variant: TPU f32 matmuls default to bf16 inputs, so
        # the 0/1 sum matrix needs precision=HIGHEST for parity
        logits_p = jax.lax.dot_general(
            x.reshape(E // PACK, PACK * F), w,
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)
        rep = logits_p.reshape(E, H)
        y = jnp.repeat(rep, D, axis=-1) * x
        return y.reshape(-1, 8, F).sum(1)

    @jax.jit
    def b3_packed_reduce(x):
        # reduce straight into the packed layout; exact f32 sums. Whether
        # the [E/32, 32, H] reduce output fuses into the reshape-copy (one
        # dense [E/32, 128] buffer) or materializes lane-padded decides
        # a-vs-b3.
        logits_p = (x.reshape(E // PACK, PACK, H, D).sum(-1)
                    .reshape(E // PACK, PACK * H))
        rep = logits_p.reshape(E, H)
        y = jnp.repeat(rep, D, axis=-1) * x
        return y.reshape(-1, 8, F).sum(1)

    @jax.jit
    def c_stream_bound(x):
        return (x * 2).reshape(-1, 8, F).sum(1)

    # agreement check on a slice
    ga = np.asarray(a_eh_reduce(x)[:64], np.float32)
    gb = np.asarray(b_packed_dot(x)[:64], np.float32)
    err = np.max(np.abs(ga - gb)) / max(np.max(np.abs(ga)), 1e-9)
    print(f"a vs b rel err: {err:.2e} (dtype={dtype.__name__ if hasattr(dtype, '__name__') else dtype})")

    for name, fn in (("a_eh_reduce", a_eh_reduce),
                     ("b_packed_dot", b_packed_dot),
                     ("b2_packed_dot_exact", b2_packed_dot_exact),
                     ("b3_packed_reduce", b3_packed_reduce),
                     ("c_stream_bound", c_stream_bound)):
        dt = timeit(fn, x)
        print(f"{name}: {dt * 1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
