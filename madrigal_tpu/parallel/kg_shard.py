"""Graph-parallel KG message passing: edge arrays sharded over a mesh axis.

The full-KG HGT forward is the dominant encoder cost at PrimeKG scale
(8.3M directed edges, 17 edge types -> ~740 ms/chip/pass; the reference
clones and processes the FULL graph every forward on one GPU,
madrigal/data/data_utils.py:330-332, models/models.py:724-738). Under plain
data parallelism every chip would redo that identical pass. Here the edge
axis of every edge type shards over a mesh axis instead: each chip gathers,
scores and aggregates only its edge shard, and the per-destination-node
softmax statistics and message sums merge with psum/pmax collectives over
ICI (ops/segment.py `axis_name`). Node-feature tables and weights stay
replicated -- node-level transforms are tiny next to the edge gathers, so
this is bandwidth-parallel where the bandwidth is actually spent.

Composes with autodiff (shard_map transposes psum/replication correctly),
so the finetune/pretrain steps can train the HGT graph-parallel; see
`shard_finetune_trainer(..., kg_shard_axis=...)` in train_step.py.
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.kg import HeteroKGBatch


def strip_src_arenas(kg: HeteroKGBatch) -> HeteroKGBatch:
    """Drop the source-transpose (backward) layouts before sharding: they
    index the GLOBAL edge axis, which no longer exists once edges are
    split over a mesh axis (the HGT falls back to the plain gather whose
    transpose shard_map handles locally)."""
    if (kg.edge_src_perm or kg.edge_src_chunk or kg.edge_src_order
            or kg.edge_src_starts):
        return dataclasses.replace(kg, edge_src_perm={}, edge_src_chunk={},
                                   edge_src_order={}, edge_src_starts={})
    return kg


def pad_kg_edges_to_multiple(kg: HeteroKGBatch, m: int) -> HeteroKGBatch:
    """Re-pad every edge type's arrays so each device shard is non-ragged.

    Plain layout: pad the edge axis to a multiple of `m`. Degree-chunked
    layout (metadata.edge_chunk > 0): pad to a multiple of chunk*m so
    shard boundaries stay chunk-aligned, and extend edge_chunk_dst with
    the drop sentinel. Padding entries carry src=dst=0 with mask=False;
    the segment ops drop them, so numerics are unchanged. Also strips the
    source-transpose arenas (see strip_src_arenas).
    """
    kg = strip_src_arenas(kg)
    chunk = kg.metadata.edge_chunk
    unit = m * max(chunk, 1)
    if unit <= 1:
        return kg
    src_d, dst_d, mask_d, cdst_d = {}, {}, {}, {}
    dst_type = {  # edge key -> dst node count (for the chunk sentinel)
        "__".join(et): kg.num_nodes(et[2]) for et in kg.metadata.edge_types
    }
    for k, src in kg.edge_src.items():
        e = src.shape[0]
        pad = (-e) % unit
        if pad:
            src_d[k] = jnp.concatenate(
                [src, jnp.zeros((pad,), src.dtype)])
            dst_d[k] = jnp.concatenate(
                [kg.edge_dst[k], jnp.zeros((pad,), kg.edge_dst[k].dtype)])
            mask_d[k] = jnp.concatenate(
                [kg.edge_mask[k], jnp.zeros((pad,), bool)])
            if chunk > 0:
                cdst_d[k] = jnp.concatenate([
                    kg.edge_chunk_dst[k],
                    jnp.full((pad // chunk,), dst_type[k], jnp.int32),
                ])
        else:
            src_d[k] = src
            dst_d[k] = kg.edge_dst[k]
            mask_d[k] = kg.edge_mask[k]
            if chunk > 0:
                cdst_d[k] = kg.edge_chunk_dst[k]
    return dataclasses.replace(
        kg, edge_src=src_d, edge_dst=dst_d, edge_mask=mask_d,
        edge_chunk_dst=cdst_d,
    )


def kg_partition_specs(kg: HeteroKGBatch, axis: str) -> HeteroKGBatch:
    """A HeteroKGBatch-shaped pytree of PartitionSpecs: edge arrays split
    over `axis`, node tables and the drug index map replicated."""
    return HeteroKGBatch(
        node_feats={k: P() for k in kg.node_feats},
        edge_src={k: P(axis) for k in kg.edge_src},
        edge_dst={k: P(axis) for k in kg.edge_dst},
        edge_mask={k: P(axis) for k in kg.edge_mask},
        drug_index_map=P(),
        metadata=kg.metadata,
        edge_chunk_dst={k: P(axis) for k in kg.edge_chunk_dst},
    )


def device_put_kg_sharded(kg: HeteroKGBatch, mesh: Mesh,
                          axis: str) -> HeteroKGBatch:
    """Place a (pre-padded) KG batch with edges sharded over `axis`."""
    kg = strip_src_arenas(kg)
    specs = kg_partition_specs(kg, axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), kg, specs
    )


def sharded_kg_apply(
    mesh: Mesh,
    apply_fn: Callable,
    axis: str = "dp",
) -> Callable:
    """Wrap `apply_fn(variables, kg) -> pytree` to run graph-parallel.

    `apply_fn` must be built from a model whose HGTConfig.shard_axis equals
    `axis` (the conv then merges its segment reductions over that mesh
    axis). The returned callable takes (variables, kg) where kg's edge
    budgets divide mesh.shape[axis] (see pad_kg_edges_to_multiple); its
    output is replicated. Differentiable: the psum/replication pair
    transposes to the correct cross-shard gradient reduction, so encoder
    weights receive exact full-graph gradients.
    """
    shard_map = jax.shard_map

    def wrapped(variables, kg):
        kg = strip_src_arenas(kg)
        specs = kg_partition_specs(kg, axis)
        fn = shard_map(
            apply_fn,
            mesh=mesh,
            in_specs=(P(), specs),
            out_specs=P(),
            check_vma=False,
        )
        return fn(variables, kg)

    return wrapped


def make_sharded_kg_table_fn(model, mesh: Mesh, axis: str = "dp",
                             encoder_attr: str = "encoder"):
    """Graph-parallel `kg_drug_table` for a model wrapping MadrigalEncoder.

    Returns fn(params, kg) -> [N_kg_drugs, D] replicated drug-node table,
    where the HGT message passing inside ran edge-sharded over `axis`.
    Builds a config twin of `model` with hgt.shard_axis set -- parameter
    structure is identical, so the caller's params apply unchanged.

    encoder_attr: the model attribute holding the MadrigalEncoder
    ('encoder' for MadrigalMultilabel, 'base_encoder' for SimCLRModel).
    """
    if model.enc_cfg.kg_encoder != "hgt":
        # Only the HGT conv threads `shard_axis` into its segment
        # reductions (psum/pmax across edge shards). HAN/RGCN would
        # silently aggregate each device's partial graph and return wrong
        # drug tables under shard_map(out_specs=P(), check_vma=False).
        raise ValueError(
            "graph-parallel KG sharding requires kg_encoder='hgt' "
            f"(got '{model.enc_cfg.kg_encoder}': HAN/RGCN segment ops "
            "do not merge across edge shards)"
        )
    enc_cfg = dataclasses.replace(
        model.enc_cfg,
        hgt=dataclasses.replace(model.enc_cfg.hgt, shard_axis=axis),
    )
    model_sh = model.clone(enc_cfg=enc_cfg)

    def apply_fn(params, kg):
        return model_sh.apply(
            {"params": params}, kg,
            method=lambda m, k: getattr(m, encoder_attr).kg_drug_table(
                k, train=False),
        )

    return sharded_kg_apply(mesh, apply_fn, axis=axis)


def sharded_kg_drug_table(mesh: Mesh, model, variables, kg,
                          axis: str = "dp") -> np.ndarray:
    """One-shot graph-parallel drug-table forward (serving path)."""
    kg = pad_kg_edges_to_multiple(kg, int(mesh.shape[axis]))
    kg = device_put_kg_sharded(kg, mesh, axis)
    params = jax.device_put(
        jax.tree_util.tree_map(np.asarray, variables["params"]),
        NamedSharding(mesh, P()),
    )
    fn = jax.jit(make_sharded_kg_table_fn(model, mesh, axis=axis))
    return np.asarray(fn(params, kg))
