"""ctypes bindings for the native C++ SMILES featurizer (native/featurizer.cpp).

Builds libmadrigal_native.so on first use (g++ is in the base image;
pybind11 is not, hence the C ABI + ctypes). The native path featurizes
SMILES batches without the Python-parser overhead -- it is the bulk host
data path for large drug tables (the role RDKit's C++ plays for the
reference; SURVEY.md section 2.1).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

from ..constants import BOND_DIM, MOL_DIM

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libmadrigal_native.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "featurizer.cpp")

_lib = None


def build_native(force: bool = False) -> str:
    """Compile the shared library if missing/stale. Returns the .so path."""
    if (not force) and os.path.exists(_SO_PATH) and (
        os.path.getmtime(_SO_PATH) >= os.path.getmtime(_SRC_PATH)
    ):
        return _SO_PATH
    subprocess.run(
        ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
         "-o", _SO_PATH, _SRC_PATH],
        check=True, capture_output=True,
    )
    return _SO_PATH


def _load():
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(build_native())
    lib.mtpu_featurize.restype = ctypes.c_int
    lib.mtpu_featurize.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int32,
    ]
    lib.mtpu_featurize_batch.restype = ctypes.c_int
    lib.mtpu_featurize_batch.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int32,
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def featurize_smiles_native(smiles: str, node_cap: int = 256,
                            edge_cap: int = 512) -> Optional[dict]:
    lib = _load()
    node_feats = np.zeros((node_cap, MOL_DIM), np.float32)
    edge_index = np.zeros((edge_cap, 2), np.int32)
    edge_feats = np.zeros((edge_cap, BOND_DIM), np.float32)
    na = ctypes.c_int32(0)
    ne = ctypes.c_int32(0)
    rc = lib.mtpu_featurize(
        smiles.encode(),
        node_feats.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(na),
        edge_index.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        edge_feats.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(ne), node_cap, edge_cap,
    )
    if rc != 0:
        return None
    n, e = na.value, ne.value
    return {
        "node_feats": node_feats[:n].copy(),
        "edge_index": edge_index[:e].copy(),
        "edge_feats": edge_feats[:e].copy(),
    }


def featurize_batch_native(smiles_list: List[str], node_cap: int = 256,
                           edge_cap: int = 512) -> List[Optional[dict]]:
    """Bulk featurization in one native call."""
    lib = _load()
    count = len(smiles_list)
    enc = [s.encode() for s in smiles_list]
    offsets = np.zeros(count, np.int32)
    buf = bytearray()
    for i, b in enumerate(enc):
        offsets[i] = len(buf)
        buf += b + b"\0"
    buf_c = bytes(buf)
    node_feats = np.zeros((count, node_cap, MOL_DIM), np.float32)
    edge_index = np.zeros((count, edge_cap, 2), np.int32)
    edge_feats = np.zeros((count, edge_cap, BOND_DIM), np.float32)
    n_atoms = np.zeros(count, np.int32)
    n_edges = np.zeros(count, np.int32)
    lib.mtpu_featurize_batch(
        buf_c,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        count,
        node_feats.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_atoms.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        edge_index.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        edge_feats.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_edges.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        node_cap, edge_cap,
    )
    out: List[Optional[dict]] = []
    for m in range(count):
        if n_atoms[m] == 0:
            out.append(None)
            continue
        n, e = int(n_atoms[m]), int(n_edges[m])
        out.append({
            "node_feats": node_feats[m, :n].copy(),
            "edge_index": edge_index[m, :e].copy(),
            "edge_feats": edge_feats[m, :e].copy(),
        })
    return out


def featurize_pack_native(smiles_list: List[str],
                          node_budget: Optional[int] = None,
                          edge_budget: Optional[int] = None,
                          pad_multiple: int = 128):
    """Featurize + pack a SMILES batch into one padded arena in a single
    native call (the fully-native molecule data path). Returns a
    MolGraphBatch. Unparseable molecules become single-dummy-atom graphs
    so graph ids stay aligned."""
    import ctypes as C

    import jax.numpy as jnp

    from .molgraph import MolGraphBatch, round_up

    lib = _load()
    if not hasattr(lib, "_pack_configured"):
        lib.mtpu_featurize_pack.restype = C.c_int
        lib.mtpu_featurize_pack.argtypes = [
            C.c_char_p, C.POINTER(C.c_int32), C.c_int32,
            C.POINTER(C.c_float), C.POINTER(C.c_uint8),
            C.POINTER(C.c_int32), C.POINTER(C.c_int32),
            C.POINTER(C.c_int32), C.POINTER(C.c_float),
            C.POINTER(C.c_uint8), C.c_int32, C.c_int32,
            C.POINTER(C.c_int32), C.POINTER(C.c_int32),
        ]
        lib._pack_configured = True

    count = len(smiles_list)
    enc = [s.encode() for s in smiles_list]
    offsets = np.zeros(count, np.int32)
    buf = bytearray()
    for i, b in enumerate(enc):
        offsets[i] = len(buf)
        buf += b + b"\0"
    # conservative default budgets: ~3 heavy atoms + 8 directed edges per
    # char is far above real molecules; callers pass budgets for tight fits
    nb = node_budget or round_up(max(sum(len(s) for s in smiles_list), 16),
                                 pad_multiple)
    eb = edge_budget or round_up(nb * 4, pad_multiple)

    node_feats = np.zeros((nb, MOL_DIM), np.float32)
    node_mask = np.zeros(nb, np.uint8)
    node_graph = np.zeros(nb, np.int32)
    edge_src = np.zeros(eb, np.int32)
    edge_dst = np.zeros(eb, np.int32)
    edge_feats = np.zeros((eb, BOND_DIM), np.float32)
    edge_mask = np.zeros(eb, np.uint8)
    nn = C.c_int32(0)
    ne = C.c_int32(0)
    rc = lib.mtpu_featurize_pack(
        bytes(buf), offsets.ctypes.data_as(C.POINTER(C.c_int32)), count,
        node_feats.ctypes.data_as(C.POINTER(C.c_float)),
        node_mask.ctypes.data_as(C.POINTER(C.c_uint8)),
        node_graph.ctypes.data_as(C.POINTER(C.c_int32)),
        edge_src.ctypes.data_as(C.POINTER(C.c_int32)),
        edge_dst.ctypes.data_as(C.POINTER(C.c_int32)),
        edge_feats.ctypes.data_as(C.POINTER(C.c_float)),
        edge_mask.ctypes.data_as(C.POINTER(C.c_uint8)),
        nb, eb, C.byref(nn), C.byref(ne),
    )
    if rc != 0:
        raise ValueError(f"arena budgets too small (rc={rc}): "
                         f"nodes {nb}, edges {eb}")
    return MolGraphBatch(
        node_feats=jnp.asarray(node_feats),
        node_mask=jnp.asarray(node_mask.astype(bool)),
        node_graph=jnp.asarray(node_graph),
        edge_src=jnp.asarray(edge_src),
        edge_dst=jnp.asarray(edge_dst),
        edge_feats=jnp.asarray(edge_feats),
        edge_mask=jnp.asarray(edge_mask.astype(bool)),
        num_graphs=count,
    )
