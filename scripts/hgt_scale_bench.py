"""Full-KG HGT forward at PrimeKG scale on the real chip, both
attention-softmax scopes (per-edge-type = PyG <=2.2 semantics, global =
PyG 2.3 semantics). The full-graph message pass runs once per train step
(shared drug table), so this is the encoder-side step-time anchor.

`--bwd` instead times value_and_grad of a scalar loss over the drug
table, A/B-ing the source-transpose backward arenas (ops/gather.py):
src_arena=True routes the src-gather transposes through sorted-chunk
scatters; False leaves XLA's unsorted [E]-row scatter-adds.

Usage: python scripts/hgt_scale_bench.py [--small] [--bwd]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

if "--platform_cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from madrigal_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax.numpy as jnp

from madrigal_tpu.config import HGTConfig
from madrigal_tpu.data.kg import build_kg_batch
from madrigal_tpu.models.hgt import HGTEncoder

# the canonical PrimeKG-scale spec now lives with the data layer
# (data/synthetic.py, shared with make_reference_scale_dataset); these
# module-level aliases keep the other scale benches' imports working
from madrigal_tpu.data.synthetic import (  # noqa: E402
    PRIMEKG_EDGE_SPEC as EDGE_SPEC,
    PRIMEKG_NODE_TYPES as NODE_TYPES,
)


def bwd_bench(node_feats, edges, drug_ids):
    """fwd+bwd A/B of the source-transpose backward (ops/gather.py)."""
    variants = [
        ("chunk8+src_mxu",
         build_kg_batch(node_feats, edges, drug_ids=drug_ids, edge_chunk=8,
                        src_sort=True)),
        ("chunk8_plain",
         build_kg_batch(node_feats, edges, drug_ids=drug_ids, edge_chunk=8)),
        ("unchunked",
         build_kg_batch(node_feats, edges, drug_ids=drug_ids)),
    ]
    if "--src_arena" in sys.argv:
        variants.insert(1, (
            "chunk8+src_arena",
            build_kg_batch(node_feats, edges, drug_ids=drug_ids,
                           edge_chunk=8, src_arena=True)))
    combos = (("per_edge_type", "float32"),
              ("per_edge_type", "bfloat16"),
              ("global", "float32"),
              ("global", "bfloat16"))
    if "--production" in sys.argv:  # only the training-recipe scope
        combos = combos[:2]
    for scope, dtype in combos:
        for vname, kg in variants:
            # remat_edge_types: full-scale f32 fwd+bwd without it OOMs a
            # single v5e chip (15.84/15.75 G HBM); production training
            # always sets it, so the A/B runs the production config
            cfg = HGTConfig(hidden_dim=128, num_layers=2, att_heads=4,
                            softmax_scope=scope, compute_dtype=dtype,
                            remat_edge_types=True)
            model = HGTEncoder(cfg=cfg, embed_dim=128, drug_only_head=True)
            variables = jax.jit(
                lambda: model.init(jax.random.PRNGKey(0), kg, train=False)
            )()

            def loss(v, g):
                return jnp.sum(model.apply(v, g, train=False)["drug"] ** 2)

            step = jax.jit(jax.value_and_grad(loss))
            t0 = time.perf_counter()
            val, grads = step(variables, kg)
            float(val)  # compile + completion read
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                val, grads = step(variables, kg)
            float(val)
            dt = (time.perf_counter() - t0) / reps
            print(f"scope={scope} dtype={dtype} {vname}: "
                  f"{dt * 1e3:.0f} ms/fwd+bwd "
                  f"(first call incl. compile {compile_s:.0f} s)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="1/16-scale sanity run")
    ap.add_argument("--bwd", action="store_true",
                    help="time fwd+bwd, A/B the src-transpose backward")
    ap.add_argument("--src_arena", action="store_true",
                    help="also A/B the (measured-slower) src-transpose "
                         "backward arenas")
    ap.add_argument("--platform_cpu", action="store_true",
                    help="force the CPU backend (sanity runs)")
    ap.add_argument("--production", action="store_true",
                    help="--bwd: only the per_edge_type (training-recipe) "
                         "scope combos")
    args = ap.parse_args()
    scale = 16 if args.small else 1

    rng = np.random.RandomState(0)
    node_feats = {
        nt: rng.randn(max(n // scale, 8), 128).astype(np.float32)
        for nt, n in NODE_TYPES.items()
    }
    edges = {}
    for src, rel, dst, e in EDGE_SPEC:
        e = max(e // scale, 16)
        edges[(src, rel, dst)] = np.stack([
            rng.randint(0, node_feats[src].shape[0], e),
            rng.randint(0, node_feats[dst].shape[0], e),
        ]).astype(np.int32)
    total_e = sum(v.shape[1] for v in edges.values())
    total_n = sum(v.shape[0] for v in node_feats.values())
    print(f"KG: {total_n} nodes, {total_e} edges, {len(edges)} edge types")

    drug_ids = np.arange(node_feats["drug"].shape[0])
    if args.bwd:
        bwd_bench(node_feats, edges, drug_ids)
        return
    variants = [
        ("unsorted", build_kg_batch(node_feats, edges, drug_ids=drug_ids)),
        ("chunked8", build_kg_batch(node_feats, edges, drug_ids=drug_ids,
                                    edge_chunk=8)),
    ]

    for scope, dtype in (("per_edge_type", "float32"),
                         ("per_edge_type", "bfloat16"),
                         ("global", "float32"),
                         ("global", "bfloat16")):
        for vname, kg in variants:
            cfg = HGTConfig(hidden_dim=128, num_layers=2, att_heads=4,
                            softmax_scope=scope, compute_dtype=dtype)
            model = HGTEncoder(cfg=cfg, embed_dim=128, drug_only_head=True)
            t0 = time.perf_counter()
            variables = jax.jit(
                lambda: model.init(jax.random.PRNGKey(0), kg, train=False)
            )()
            fwd = jax.jit(lambda v, g: model.apply(v, g, train=False)["drug"])
            out = fwd(variables, kg)
            float(jnp.max(out[0, :8]))  # compile + completion read
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                out = fwd(variables, kg)
            float(jnp.max(out[0, :8]))
            dt = (time.perf_counter() - t0) / reps
            print(f"scope={scope} edges={vname}: {dt * 1e3:.0f} ms/forward "
                  f"(first call incl. compile {compile_s:.0f} s)")


if __name__ == "__main__":
    main()
