"""DDI collators: long-format edge batches -> device-ready arrays.

TPU-native equivalent of the reference's LongDDIDataCollator
(reference: madrigal/data/data.py:759-1012): unique-head/tail dedup with
inverse indices, train-edge undirecting, fixed or on-the-fly structured
negatives, per-drug modality gathers (molecules, KG row lookup, cv/tx
signature rows with zero-fill for missing), and the (head_idx, tail_idx,
label, pos/neg) index arrays the loss consumes.

Deviation from the reference (documented): missing cv/tx rows are filled
with zeros up front rather than randn-then-overwrite (data.py:897-902) --
the values are masked downstream either way, and zeros are deterministic.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .batch import DrugModalityBatch
from .kg import HeteroKGBatch, build_kg_batch, drug_row_lookup
from .molgraph import pack_molecules
from .negative_sampling import structured_negative_sampling_multilabel
from .synthetic import SyntheticDataset


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DDIBatch:
    """One collated DDI batch (reference collator output dict,
    data.py:948-974)."""

    head: DrugModalityBatch
    tail: DrugModalityBatch
    head_idx: jnp.ndarray  # [T] index into head.drugs
    tail_idx: jnp.ndarray  # [T] index into tail.drugs
    labels: jnp.ndarray  # [T]
    pos_neg: jnp.ndarray  # [T] 1=positive, 0=negative
    mask: jnp.ndarray  # [T] bool; False rows are padding


class DDICollator:
    """Host-side collator over a drug store (synthetic or loaded)."""

    def __init__(
        self,
        ds: SyntheticDataset,
        split: str = "train",
        num_negative_samples_per_pair: Optional[int] = None,
        negative_sampling_probs_type: str = "uniform",
        node_budget: Optional[int] = None,
        edge_budget: Optional[int] = None,
        pair_budget: Optional[int] = None,
        seed: int = 0,
        kg_edge_chunk: int = 0,
        kg_src_sort: bool = False,
        drug_table_cache: Optional[dict] = None,
        full_drug_table: bool = False,
    ):
        self.ds = ds
        self.split = split
        # optional cross-collator memo for drug_batch device arrays: at
        # reference scale every split's unique head/tail set is all N
        # drugs, so without sharing, train + val + test batches each pin
        # their own copy of the full modality tables in HBM (tx_sigs
        # alone is [S, N, G] ~ 0.4 GB) -- enough to OOM the production
        # finetune recipe. Pass ONE dict to every collator of a run;
        # entries are read-only device arrays keyed by the exact drug-id
        # set, so sharing is numerics-identical.
        self.drug_table_cache = drug_table_cache
        # full_drug_table=True collates every batch against the FULL
        # [0, N) drug table instead of the batch's unique head/tail sets:
        # head_idx/tail_idx become global drug ids, numerics are
        # unchanged (the encoder just embeds every drug), and -- the
        # point -- every split's head AND tail DrugModalityBatch is the
        # SAME drug_table_cache entry, so one run pins exactly one copy
        # of the modality tables in HBM. At reference scale the unique
        # sets are ~all N drugs anyway (so no extra encode cost), but
        # they differ by a few drugs split-to-split, which would defeat
        # the exact-key cache.
        self.full_drug_table = full_drug_table
        if full_drug_table and self.drug_table_cache is None:
            # without a memo, head and tail would each build their own
            # identical full-table copy -- worse than the unique path
            self.drug_table_cache = {}
        self.num_neg = num_negative_samples_per_pair
        self.rng = np.random.RandomState(seed)
        self.node_budget = node_budget
        self.edge_budget = edge_budget
        self.pair_budget = pair_budget
        # degree-chunked KG arenas (data/kg.py KGMetadata.edge_chunk):
        # numerics-identical, ~3x faster HGT message passing on TPU
        self.kg_edge_chunk = kg_edge_chunk
        # source-sorted transpose layout for the HGT backward (data/kg.py
        # edge_src_order; ops/segment_pallas.py MXU segment sum)
        self.kg_src_sort = kg_src_sort
        self.kg_row_lut = drug_row_lookup(ds.kg_drug_ids, ds.num_drugs)

        if self.num_neg:
            df = ds.edge_df
            self.valid_indices = np.unique(df[["head", "tail"]].values)
            self.gt_edges = df[["head", "tail"]].values
            self.gt_labels = df["label_indexed"].values
            if negative_sampling_probs_type == "uniform":
                self.neg_probs = None
            elif negative_sampling_probs_type in ("degree", "degree_w2v"):
                counts = np.bincount(
                    self.gt_edges.flatten(),
                    minlength=int(self.valid_indices.max()) + 1,
                ).astype(np.float64)
                if negative_sampling_probs_type == "degree_w2v":
                    counts = counts ** 0.75
                self.neg_probs = counts / counts.sum()
            else:
                raise ValueError(negative_sampling_probs_type)

    # -- modality gathers ---------------------------------------------------

    def drug_batch(self, drug_ids: np.ndarray) -> DrugModalityBatch:
        ds = self.ds
        drug_ids = np.asarray(drug_ids, np.int64)
        cache = self.drug_table_cache
        # key carries every shape-affecting knob baked into the cached
        # batch (pack_molecules budgets), not just the drug-id set: two
        # collators sharing one cache with different budgets must NOT
        # alias entries (wrong arena shapes -> recompiles / truncation)
        key = (
            (drug_ids.tobytes(), self.node_budget, self.edge_budget)
            if cache is not None else None
        )
        if cache is not None and key in cache:
            return cache[key]
        mols = pack_molecules(
            [ds.molecules[int(i)] for i in drug_ids],
            node_budget=self.node_budget,
            edge_budget=self.edge_budget,
        )
        masks = ds.masks[drug_ids]
        extra = {
            mod: jnp.asarray(tab[drug_ids])
            for mod, tab in getattr(ds, "extra_tabular", {}).items()
        }
        out = DrugModalityBatch(
            drugs=jnp.asarray(drug_ids.astype(np.int32)),
            mols=mols,
            kg_rows=jnp.asarray(self.kg_row_lut[drug_ids]),
            cv=jnp.asarray(ds.cv_table[drug_ids]),
            tx_sigs=jnp.asarray(ds.tx_table[:, drug_ids]),
            tx_dosages=jnp.asarray(ds.tx_dosages[:, drug_ids]),
            masks=jnp.asarray(masks),
            extra_tabular=extra,
        )
        if cache is not None:
            cache[key] = out
        return out

    def kg_batch(self, seed_drug_ids=None,
                 kg_sampling_num_neighbors: Optional[int] = None,
                 kg_sampling_num_layers: int = 2, **kw) -> HeteroKGBatch:
        """Full-KG batch by default (the reference's default path,
        data_utils.py:330-332); with `kg_sampling_num_neighbors`, a
        drug-rooted sampled subgraph (sample_kg_data analog). Note the
        sampled variant changes kg_rows: use the returned batch's
        drug_index_map with drug_row_lookup for gathers."""
        ds = self.ds
        if kg_sampling_num_neighbors:
            from .kg_sampling import sample_kg_subgraph

            seeds = (
                np.nonzero(np.isin(ds.kg_drug_ids, seed_drug_ids))[0]
                if seed_drug_ids is not None
                else np.arange(len(ds.kg_drug_ids))
            )
            sub, _ = sample_kg_subgraph(
                ds.kg_node_feats, ds.kg_edge_indices, ds.kg_drug_ids,
                seeds, kg_sampling_num_neighbors, kg_sampling_num_layers,
                rng=self.rng,
            )
            return sub
        kw.setdefault("edge_chunk", self.kg_edge_chunk)
        kw.setdefault("src_sort", self.kg_src_sort)
        return build_kg_batch(
            ds.kg_node_feats, ds.kg_edge_indices, ds.kg_drug_ids, **kw
        )

    # -- edge batch ---------------------------------------------------------

    def __call__(
        self, rows: "object" = None, build_kg: bool = True,
    ) -> Tuple[DDIBatch, Optional[HeteroKGBatch]]:
        """Collate an edge-table slice (defaults to the full table --
        full-batch training, reference data.py:435-437).

        `build_kg=False` skips the KG arena build and returns None in
        its slot: eval/test splits score against the TRAIN collator's KG
        (the graph is split-independent), and at reference scale each
        redundant build costs minutes of host->device transfer and a
        transient multi-hundred-MB arena in HBM."""
        df = self.ds.edge_df if rows is None else rows
        pos = df[["head", "tail"]].values.astype(np.int64)
        labels = df["label_indexed"].values.astype(np.int64)

        if self.num_neg:
            nh, nt = structured_negative_sampling_multilabel(
                pos.T, labels, self.valid_indices, self.gt_edges.T,
                self.gt_labels, probs=self.neg_probs, rng=self.rng,
            )
            neg = np.concatenate(
                [np.stack([pos[:, 0], nt], 1), np.stack([nh, pos[:, 1]], 1)]
            )
            neg_labels = np.tile(labels, 2)
        elif self.split in ("val_between", "test_between"):
            # between splits corrupt only the train-side tail, twice
            # (reference data.py:850-854: neg_tail_1 / neg_tail_2)
            neg = np.concatenate(
                [
                    np.stack([pos[:, 0], df["neg_tail_1"].values], 1),
                    np.stack([pos[:, 0], df["neg_tail_2"].values], 1),
                ]
            )
            neg_labels = np.tile(labels, 2)
        else:
            neg = np.concatenate(
                [
                    np.stack([pos[:, 0], df["neg_tail"].values], 1),
                    np.stack([df["neg_head"].values, pos[:, 1]], 1),
                ]
            )
            neg_labels = np.tile(labels, 2)

        if self.split == "train":
            # undirect (reference data.py:863-867)
            pos = np.concatenate([pos, pos[:, ::-1]])
            neg = np.concatenate([neg, neg[:, ::-1]])
            labels = np.tile(labels, 2)
            neg_labels = np.tile(neg_labels, 2)

        all_heads = np.concatenate([pos[:, 0], neg[:, 0]])
        all_tails = np.concatenate([pos[:, 1], neg[:, 1]])
        all_labels = np.concatenate([labels, neg_labels])
        pos_neg = np.concatenate(
            [np.ones_like(labels), np.zeros_like(neg_labels)]
        )

        if self.full_drug_table:
            uniq_heads = uniq_tails = np.arange(self.ds.num_drugs,
                                                dtype=np.int64)
            head_inv, tail_inv = all_heads, all_tails
        else:
            uniq_heads, head_inv = np.unique(all_heads, return_inverse=True)
            uniq_tails, tail_inv = np.unique(all_tails, return_inverse=True)

        T = len(all_labels)
        budget = self.pair_budget or T
        if T > budget:
            raise ValueError(f"pair budget too small: {T} > {budget}")
        pad = budget - T

        def pad1(x, fill=0):
            return np.concatenate([x, np.full(pad, fill, dtype=x.dtype)])

        batch = DDIBatch(
            head=self.drug_batch(uniq_heads),
            tail=self.drug_batch(uniq_tails),
            head_idx=jnp.asarray(pad1(head_inv.astype(np.int32))),
            tail_idx=jnp.asarray(pad1(tail_inv.astype(np.int32))),
            labels=jnp.asarray(pad1(all_labels.astype(np.int32))),
            pos_neg=jnp.asarray(pad1(pos_neg.astype(np.int32))),
            mask=jnp.asarray(
                np.concatenate([np.ones(T, bool), np.zeros(pad, bool)])
            ),
        )
        return batch, (self.kg_batch() if build_kg else None)
