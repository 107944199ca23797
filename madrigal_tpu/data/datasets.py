"""Reference-format dataset loading.

Reads the on-disk layout the reference consumes
(reference: madrigal/data/data.py:377-444 get_train_data):
  <root>/views_features_new/combined_metadata_ddi.{pkl,csv}
      -- per-drug metadata: canonical_smiles, view_str/view_kg/view_cv/
         view_tx_<cell> availability columns, <mod>_sig_id columns,
         <cell>_max_dose_averaged_sig_id, <cell>_pert_dose
  <root>/views_features_new/cv/cv.csv            -- [sig_dim x sigs] table
  <root>/views_features_new/tx/tx.csv            -- LINCS signatures
  <root>/views_features_new/kg/kg_edges.npz      -- per-edge-type indices
         (exported from the PyG HeteroData .pt; PyG itself is not a
         dependency here -- see `convert_pyg_kg` for the one-time export)
  <root>/polypharmacy_new/<source>/<split_method>/<split>_df.csv
      -- long-format DDI tables (head, tail, label_indexed, neg_*)

Everything loads into the same `SyntheticDataset` container the collators
consume, so synthetic and real data share one code path.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..constants import (
    CELL_LINES,
    CV_INPUT_DIM,
    NUM_CELL_LINES,
    NUM_MODALITIES,
    NUM_NON_TX_MODALITIES,
    TX_INPUT_DIM,
)
from .featurize import featurize_many
from .synthetic import SyntheticDataset


def _read_metadata(root: str):
    import pandas as pd

    for name in ("combined_metadata_ddi.pkl", "combined_metadata_ddi.csv"):
        p = os.path.join(root, "views_features_new", name)
        if os.path.exists(p):
            return (pd.read_pickle(p) if name.endswith("pkl")
                    else pd.read_csv(p, index_col=0))
    raise FileNotFoundError(
        f"no combined_metadata_ddi.(pkl|csv) under {root}/views_features_new"
    )


def load_kg_npz(path: str):
    """kg_edges.npz layout: 'node_types' (list), per node type
    'x__<type>' feature matrices, per edge type
    'edge__<src>__<rel>__<dst>' [2, E] arrays, 'drug_ids' global drug id
    per KG drug-node row."""
    data = np.load(path, allow_pickle=True)
    node_feats = {}
    edges = {}
    for k in data.files:
        if k.startswith("x__"):
            node_feats[k[3:]] = data[k].astype(np.float32)
        elif k.startswith("edge__"):
            _, src, rel, dst = k.split("__")
            edges[(src, rel, dst)] = data[k].astype(np.int64)
    return node_feats, edges, data["drug_ids"].astype(np.int64)


def convert_pyg_kg(pt_path: str, out_path: str, drug_ids=None):
    """One-time export: PyG HeteroData .pt -> kg_edges.npz (run in an
    environment with torch_geometric; reference KG format
    data_utils.py:296-337)."""
    import torch

    g = torch.load(pt_path, map_location="cpu", weights_only=False)
    arrays = {}
    for nt in g.node_types:
        arrays[f"x__{nt}"] = g[nt].x.numpy()
    for et in g.edge_types:
        src, rel, dst = et
        arrays[f"edge__{src}__{rel}__{dst}"] = g[et].edge_index.numpy()
    n_drug = arrays["x__drug"].shape[0]
    arrays["drug_ids"] = (
        np.asarray(drug_ids) if drug_ids is not None else np.arange(n_drug)
    )
    np.savez_compressed(out_path, **arrays)


def load_reference_dataset(
    root: str,
    data_source: str = "TWOSIDES",
    split_method: str = "split_by_triplets",
    split: str = "train",
    repeat: Optional[str] = None,
    featurizer_backend: Optional[str] = None,
) -> SyntheticDataset:
    import pandas as pd

    meta = _read_metadata(root)
    n = len(meta)

    # molecules from SMILES
    smiles = meta["canonical_smiles"].astype(str).tolist()
    mols = featurize_many(smiles, backend=featurizer_backend)
    empty = {
        "node_feats": np.zeros((1, 67), np.float32),
        "edge_index": np.zeros((0, 2), np.int32),
        "edge_feats": np.zeros((0, 18), np.float32),
    }
    mols = [m if m is not None else empty for m in mols]

    # availability mask matrix
    view_cols = (
        ["view_str", "view_kg", "view_cv"]
        + (["view_bs"] if NUM_NON_TX_MODALITIES >= 4 else [])
        + [f"view_tx_{c}" for c in CELL_LINES]
    )
    mod_avail = meta[view_cols].fillna(0).astype(np.int64).values

    # cv table: columns are sig ids; gather per-drug rows by cv_sig_id
    cv_path = os.path.join(root, "views_features_new", "cv", "cv.csv")
    cv_table = np.zeros((n, CV_INPUT_DIM), np.float32)
    if os.path.exists(cv_path):
        cv_df = pd.read_csv(cv_path, index_col=0)
        avail = mod_avail[:, 2] == 1
        ids = meta.loc[avail, "cv_sig_id"].values
        cv_table[avail] = cv_df[ids].values.T.astype(np.float32)

    # tx signatures per cell line
    tx_path = os.path.join(root, "views_features_new", "tx", "tx.csv")
    tx_table = np.zeros((NUM_CELL_LINES, n, TX_INPUT_DIM), np.float32)
    tx_dosages = np.zeros((NUM_CELL_LINES, n), np.float32)
    if os.path.exists(tx_path):
        tx_df = pd.read_csv(tx_path, index_col=0)
        for ci, cell in enumerate(CELL_LINES):
            col = f"view_tx_{cell}"
            avail = meta[col].fillna(0).astype(int).values == 1
            sig_ids = meta.loc[avail, f"{cell}_max_dose_averaged_sig_id"].values
            tx_table[ci, avail] = tx_df[sig_ids].values.T.astype(np.float32)
            dose_col = f"{cell}_pert_dose"
            if dose_col in meta:
                tx_dosages[ci] = meta[dose_col].fillna(0).values

    # KG
    kg_npz = os.path.join(root, "views_features_new", "kg", "kg_edges.npz")
    if os.path.exists(kg_npz):
        kg_node_feats, kg_edges, kg_drug_ids = load_kg_npz(kg_npz)
    else:
        kg_drug_ids = np.where(mod_avail[:, 1] == 1)[0]
        kg_node_feats = {
            "drug": np.zeros((max(len(kg_drug_ids), 1), 1), np.float32)
        }
        kg_edges = {}

    # DDI edge table
    parts = [root, "polypharmacy_new", data_source, split_method]
    if repeat:
        parts.append(repeat)
    edge_path = os.path.join(*parts, f"{split}_df.csv")
    edge_df = pd.read_csv(edge_path)
    # directedness invariant (reference data.py:594-596)
    tmp = edge_df[["head", "tail", "label_indexed"]]
    rev = tmp.rename(columns={"head": "tail", "tail": "head"})
    assert pd.concat([tmp, rev]).drop_duplicates().shape[0] == 2 * len(tmp), \
        "DDI edge table must be strictly directed"

    num_labels = int(edge_df["label_indexed"].max()) + 1

    return SyntheticDataset(
        num_drugs=n,
        num_labels=num_labels,
        molecules=mols,
        mod_avail=mod_avail,
        cv_table=cv_table,
        tx_table=tx_table,
        tx_dosages=tx_dosages,
        kg_node_feats=kg_node_feats,
        kg_edge_indices=kg_edges,
        kg_drug_ids=kg_drug_ids,
        edge_df=edge_df,
    )


def export_synthetic_as_reference_layout(ds: SyntheticDataset, root: str,
                                         data_source: str = "TWOSIDES",
                                         split_method: str = "split_by_triplets"):
    """Write a SyntheticDataset to disk in the reference's layout (used by
    tests to round-trip the loader, and as format documentation)."""
    import pandas as pd

    vf = os.path.join(root, "views_features_new")
    os.makedirs(os.path.join(vf, "cv"), exist_ok=True)
    os.makedirs(os.path.join(vf, "tx"), exist_ok=True)
    os.makedirs(os.path.join(vf, "kg"), exist_ok=True)

    n = ds.num_drugs
    meta = pd.DataFrame(index=range(n))
    # synthetic drugs have no real SMILES; emit simple alkanes sized by atom
    # count so featurization round-trips structurally
    meta["canonical_smiles"] = [
        "C" * max(2, min(g["node_feats"].shape[0], 20)) for g in ds.molecules
    ]
    view_cols = (["view_str", "view_kg", "view_cv"]
                 + [f"view_tx_{c}" for c in CELL_LINES])
    for j, c in enumerate(view_cols):
        meta[c] = ds.mod_avail[:, j]
    meta["cv_sig_id"] = [f"cv_{i}" for i in range(n)]
    cv_cols = {}
    for i in range(n):
        cv_cols[f"cv_{i}"] = ds.cv_table[i]
    pd.DataFrame(cv_cols).to_csv(os.path.join(vf, "cv", "cv.csv"))

    tx_cols = {}
    for ci, cell in enumerate(CELL_LINES):
        meta[f"{cell}_max_dose_averaged_sig_id"] = [
            f"tx_{cell}_{i}" for i in range(n)
        ]
        meta[f"{cell}_pert_dose"] = ds.tx_dosages[ci]
        for i in range(n):
            tx_cols[f"tx_{cell}_{i}"] = ds.tx_table[ci, i]
    pd.DataFrame(tx_cols).to_csv(os.path.join(vf, "tx", "tx.csv"))

    meta.to_csv(os.path.join(vf, "combined_metadata_ddi.csv"))

    arrays = {}
    for nt, x in ds.kg_node_feats.items():
        arrays[f"x__{nt}"] = x
    for (src, rel, dst), ei in ds.kg_edge_indices.items():
        arrays[f"edge__{src}__{rel}__{dst}"] = ei
    arrays["drug_ids"] = ds.kg_drug_ids
    np.savez_compressed(os.path.join(vf, "kg", "kg_edges.npz"), **arrays)

    ddi_dir = os.path.join(root, "polypharmacy_new", data_source,
                           split_method)
    os.makedirs(ddi_dir, exist_ok=True)
    ds.edge_df.to_csv(os.path.join(ddi_dir, "train_df.csv"), index=False)


def union_edge_tables(tables) -> "object":
    """Concatenate split edge tables for all-train scoring runs
    (reference LongDDIDatasetAllTrain, data.py:654-694: train+val+test of
    split_by_pairs, whose negative-sampling scheme matches train)."""
    import pandas as pd

    keep_cols = ["head", "tail", "label_indexed", "neg_head", "neg_tail"]
    frames = [t[keep_cols] for t in tables if all(
        c in t.columns for c in keep_cols)]
    return pd.concat(frames, axis=0, ignore_index=True)


def load_reference_all_train(root: str, data_source: str = "TWOSIDES",
                             **kw) -> SyntheticDataset:
    """All-train dataset: union of train/val/test edges over
    split_by_pairs (the reference's all-train entry uses exactly this
    layout, train_ddi_batch_all_train.py)."""
    ds = load_reference_dataset(root, data_source,
                                split_method="split_by_pairs",
                                split="train", **kw)
    import os as _os
    import pandas as pd

    tables = [ds.edge_df]
    base = _os.path.join(root, "polypharmacy_new", data_source,
                         "split_by_pairs")
    for split in ("val", "test"):
        p = _os.path.join(base, f"{split}_df.csv")
        if _os.path.exists(p):
            tables.append(pd.read_csv(p))
    ds.edge_df = union_edge_tables(tables)
    return ds
