"""SMILES parser + featurizer tests (built-in backend; RDKit absent here)."""
import numpy as np
import pytest

from madrigal_tpu.constants import BOND_DIM, MOL_DIM
from madrigal_tpu.data.featurize import featurize_smiles
from madrigal_tpu.data.smiles import parse_smiles


CASES = {
    "ethanol": ("CCO", 3, 2),
    "benzene": ("c1ccccc1", 6, 6),
    "aspirin": ("CC(=O)Oc1ccccc1C(=O)O", 13, 13),
    "caffeine": ("Cn1cnc2c1c(=O)n(C)c(=O)n2C", 14, 15),
    "charged": ("C[N+](C)(C)C", 5, 4),
    "ring_closure_pct": ("C%10CCCCC%10", 6, 6),
    "ibuprofen": ("CC(C)Cc1ccc(cc1)C(C)C(=O)O", 15, 15),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_parse_atom_bond_counts(name):
    smi, n_atoms, n_bonds = CASES[name]
    mol = parse_smiles(smi)
    assert mol.num_atoms == n_atoms, name
    assert len(mol.bonds) == n_bonds, name


def test_benzene_properties():
    mol = parse_smiles("c1ccccc1")
    for a in mol.atoms:
        assert a.aromatic and a.in_ring
        assert a.n_h == 1  # aromatic CH
    for b in mol.bonds:
        assert b.aromatic and b.in_ring and b.conjugated


def test_charges_and_hydrogens():
    mol = parse_smiles("C[N+](C)(C)C")
    n = mol.atoms[1]
    assert n.symbol == "N" and n.charge == 1
    assert n.n_h == 0  # quaternary
    mol = parse_smiles("CC(=O)[O-]")
    assert mol.atoms[-1].charge == -1
    mol = parse_smiles("N")
    assert mol.atoms[0].n_h == 3
    mol = parse_smiles("O")
    assert mol.atoms[0].n_h == 2
    mol = parse_smiles("C#N")
    assert mol.atoms[0].n_h == 1 and mol.atoms[1].n_h == 0


def test_ring_vs_chain():
    mol = parse_smiles("C1CC1CC")  # cyclopropane + ethyl tail
    ring_atoms = [a.in_ring for a in mol.atoms]
    assert ring_atoms == [True, True, True, False, False]
    assert sum(b.in_ring for b in mol.bonds) == 3


def test_feature_dims_and_content():
    g = featurize_smiles("CC(=O)Oc1ccccc1C(=O)O", backend="builtin")
    assert g["node_feats"].shape == (13, MOL_DIM)
    assert g["edge_feats"].shape[1] == BOND_DIM
    # both bond directions present
    assert g["edge_index"].shape[0] == 2 * 13
    # every atom feature row has exactly one symbol bit + one chiral bit...
    sym_block = g["node_feats"][:, :18]
    assert (sym_block.sum(axis=1) == 1).all()
    # aromatic flags: 6 ring carbons
    assert int(g["node_feats"][:, -2].sum()) == 6
    # aromatic bond type onehot at index 3 for ring bonds (x2 directions)
    assert int(g["edge_feats"][:, 3].sum()) == 12


def test_invalid_smiles_returns_none():
    assert featurize_smiles("C1CC", backend="builtin") is None  # open ring
    assert featurize_smiles("C(C", backend="builtin") is None
    assert featurize_smiles("Xx", backend="builtin") is None


def test_feature_pipeline_into_gin():
    """Featurized molecules flow through packing + the GIN encoder."""
    import jax
    from madrigal_tpu.data.molgraph import pack_molecules
    from madrigal_tpu.models.gin import GINEncoder

    graphs = [featurize_smiles(s, backend="builtin")
              for s, _, _ in CASES.values()]
    assert all(g is not None for g in graphs)
    batch = pack_molecules(graphs)
    model = GINEncoder(hidden_dims=(32, 32), num_mlp_layer=2)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    feat, _ = model.apply(variables, batch, train=False)
    assert feat.shape == (len(graphs), 32)
    assert np.isfinite(np.asarray(feat)).all()
