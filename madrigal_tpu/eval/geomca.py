"""Geometric Component Analysis (GeomCA) for embedding-space diagnostics.

Pure numpy/scipy re-implementation of the reference's vendored gudhi/
networkx GeomCA (reference: madrigal/evaluate/GeomCA.py:34-474; Poklukar
et al. 2022 definitions):

  * epsilon graph on R (reference set) union E (evaluated set): edge iff
    pairwise distance <= epsilon (Vietoris-Rips 1-skeleton; here via
    scipy.spatial.cKDTree sparse distance matrix)
  * component consistency (Def 2.2): 1 - ||R_i| - |E_i|| / (|R_i| + |E_i|)
  * component quality (Def 2.3): heterogeneous-edge fraction --
    (|edges(RE)| - |edges(R)| - |edges(E)|) / |edges(RE)|
  * network precision/recall (Def 2.5): fraction of E (resp. R) points in
    components passing both thresholds
  * epsilon estimated from a percentile of R's pairwise distances scaled
    by `gamma` (GeomCA.py:250-282 estimate_distance semantics)
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np
from scipy.sparse import csr_matrix
from scipy.sparse.csgraph import connected_components
from scipy.spatial import cKDTree


@dataclasses.dataclass
class GeomCAResult:
    epsilon: float
    network_consistency: float
    network_quality: float
    precision: float
    recall: float
    num_components: int
    components: Dict[int, dict]


def estimate_epsilon(R: np.ndarray, percentile: float = 5.0,
                     gamma: float = 1.0, max_pairs: int = 200_000,
                     seed: int = 0) -> float:
    """gamma * percentile of R's pairwise distances (subsampled)."""
    rng = np.random.RandomState(seed)
    n = len(R)
    n_pairs = min(max_pairs, n * (n - 1) // 2)
    i = rng.randint(0, n, n_pairs)
    j = rng.randint(0, n, n_pairs)
    keep = i != j
    d = np.linalg.norm(R[i[keep]] - R[j[keep]], axis=1)
    return float(gamma * np.percentile(d, percentile))


def _epsilon_edges(points: np.ndarray, epsilon: float):
    tree = cKDTree(points)
    coo = tree.sparse_distance_matrix(tree, epsilon, output_type="coo_matrix")
    mask = coo.row < coo.col  # unique undirected edges, no self loops
    return coo.row[mask], coo.col[mask]


def geomca(
    R: np.ndarray,
    E: np.ndarray,
    epsilon: Optional[float] = None,
    gamma: float = 1.0,
    percentile: float = 5.0,
    comp_consistency_threshold: float = 0.75,
    comp_quality_threshold: float = 0.45,
) -> GeomCAResult:
    R = np.asarray(R, np.float64)
    E = np.asarray(E, np.float64)
    nR, nE = len(R), len(E)
    if epsilon is None:
        epsilon = estimate_epsilon(R, percentile, gamma)

    pts = np.concatenate([R, E])
    src, dst = _epsilon_edges(pts, epsilon)

    n = nR + nE
    adj = csr_matrix(
        (np.ones(len(src) * 2),
         (np.concatenate([src, dst]), np.concatenate([dst, src]))),
        shape=(n, n),
    )
    n_comp, labels = connected_components(adj, directed=False)

    is_R_edge = (src < nR) & (dst < nR)
    is_E_edge = (src >= nR) & (dst >= nR)
    edge_comp = labels[src]  # both endpoints share a component

    comps: Dict[int, dict] = {}
    in_quality_R = 0
    in_quality_E = 0
    # order components by size descending like the reference
    sizes = np.bincount(labels, minlength=n_comp)
    order = np.argsort(-sizes)
    for rank, c in enumerate(order):
        nodes = np.nonzero(labels == c)[0]
        r_nodes = nodes[nodes < nR]
        e_nodes = nodes[nodes >= nR] - nR
        denom = len(r_nodes) + len(e_nodes)
        consistency = (
            1.0 - abs(len(r_nodes) - len(e_nodes)) / denom if denom else 0.0
        )
        sel = edge_comp == c
        total_edges = int(sel.sum())
        homo = int((sel & (is_R_edge | is_E_edge)).sum())
        quality = (total_edges - homo) / total_edges if total_edges else 0.0
        comps[rank] = {
            "Ridx": r_nodes,
            "Eidx": e_nodes,
            "comp_consistency": consistency,
            "comp_quality": quality,
        }
        if (consistency > comp_consistency_threshold
                and quality > comp_quality_threshold):
            in_quality_R += len(r_nodes)
            in_quality_E += len(e_nodes)

    network_consistency = 1.0 - abs(nR - nE) / (nR + nE)
    total_edges = len(src)
    homo_edges = int(is_R_edge.sum() + is_E_edge.sum())
    network_quality = (
        (total_edges - homo_edges) / total_edges if total_edges else 0.0
    )
    return GeomCAResult(
        epsilon=float(epsilon),
        network_consistency=network_consistency,
        network_quality=network_quality,
        precision=in_quality_E / nE if nE else 0.0,
        recall=in_quality_R / nR if nR else 0.0,
        num_components=n_comp,
        components=comps,
    )
