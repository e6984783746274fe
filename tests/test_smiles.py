"""Bond-graph construction oracles: the vendored SMILES parser and the
geometry fallback, checked against hand-derived molecular graphs (the
de-facto default QM9 graph construction, VERDICT item: the reference's
RDKit path /root/reference/preprocessing/preprocessing.py:239 must have a
tested equivalent even without RDKit installed)."""

import numpy as np
import pytest

from hgnn2_tpu.data import qm9, smiles


def adj_from(symbols, bonds):
    n = len(symbols)
    a = np.zeros((n, n), np.float32)
    for i, j, o in bonds:
        a[i, j] = a[j, i] = o
    return a


# hand-derived: (smiles, symbols heavy-then-H, {frozen bond: order})
CASES = [
    ("C", ["C", "H", "H", "H", "H"],
     {(0, 1): 1, (0, 2): 1, (0, 3): 1, (0, 4): 1}),
    ("O", ["O", "H", "H"], {(0, 1): 1, (0, 2): 1}),
    ("N", ["N", "H", "H", "H"], {(0, 1): 1, (0, 2): 1, (0, 3): 1}),
    ("C#N", ["C", "N", "H"], {(0, 1): 3, (0, 2): 1}),
    ("CCO", ["C", "C", "O", "H", "H", "H", "H", "H", "H"],
     {(0, 1): 1, (1, 2): 1, (0, 3): 1, (0, 4): 1, (0, 5): 1,
      (1, 6): 1, (1, 7): 1, (2, 8): 1}),
    ("C=O", ["C", "O", "H", "H"], {(0, 1): 2, (0, 2): 1, (0, 3): 1}),
    # acetic acid: explicit branch
    ("CC(=O)O", ["C", "C", "O", "O", "H", "H", "H", "H"],
     {(0, 1): 1, (1, 2): 2, (1, 3): 1, (0, 4): 1, (0, 5): 1, (0, 6): 1,
      (3, 7): 1}),
    # benzene: aromatic ring, order 1.5, 1 H per carbon
    ("c1ccccc1", ["C"] * 6 + ["H"] * 6,
     {**{(i, (i + 1) % 6): 1.5 for i in range(6)},
      **{(i, 6 + i): 1 for i in range(6)}}),
    # pyridine: aromatic N gets no hydrogen
    ("c1ccncc1", ["C", "C", "C", "N", "C", "C", "H", "H", "H", "H", "H"],
     {**{(i, (i + 1) % 6): 1.5 for i in range(6)},
      (0, 6): 1, (1, 7): 1, (2, 8): 1, (4, 9): 1, (5, 10): 1}),
    # pyrrole C4H5N: [nH] explicit hydrogen + 1 H per aromatic carbon
    ("c1cc[nH]c1", ["C", "C", "C", "N", "C", "H", "H", "H", "H", "H"],
     {**{(i, (i + 1) % 5): 1.5 for i in range(5)},
      (0, 5): 1, (1, 6): 1, (2, 7): 1, (3, 8): 1, (4, 9): 1}),
    # nitromethane: charged bracket atoms, no implicit H on [N+]/[O-]
    ("C[N+](=O)[O-]", ["C", "N", "O", "O", "H", "H", "H"],
     {(0, 1): 1, (1, 2): 2, (1, 3): 1, (0, 4): 1, (0, 5): 1, (0, 6): 1}),
    # fluoromethane
    ("CF", ["C", "F", "H", "H", "H"],
     {(0, 1): 1, (0, 2): 1, (0, 3): 1, (0, 4): 1}),
    # allene: cumulated double bonds
    ("C=C=C", ["C", "C", "C", "H", "H", "H", "H"],
     {(0, 1): 2, (1, 2): 2, (0, 3): 1, (0, 4): 1, (2, 5): 1, (2, 6): 1}),
]


@pytest.mark.parametrize("smi,symbols,bond_map",
                         CASES, ids=[c[0] for c in CASES])
def test_smiles_parser_hand_derived(smi, symbols, bond_map):
    psyms, bonds = smiles.parse(smi)
    assert psyms == symbols, f"{smi}: atom ordering {psyms}"
    expected = np.zeros((len(symbols), len(symbols)), np.float32)
    for (i, j), o in bond_map.items():
        expected[i, j] = expected[j, i] = o
    np.testing.assert_array_equal(adj_from(psyms, bonds), expected, err_msg=smi)


def test_ring_closure_with_bond_symbol():
    # cyclobutadiene written kekulized with ring-closure double bond
    psyms, bonds = smiles.parse("C1=CC=C1")
    a = adj_from(psyms, bonds)
    assert a[0, 1] == 2 and a[1, 2] == 1 and a[2, 3] == 2 and a[3, 0] == 1


def test_unclosed_ring_raises():
    with pytest.raises(smiles.SmilesError):
        smiles.parse("C1CC")


# --- geometry fallback on ideal geometries --------------------------------

METHANE_XYZ = np.array([
    [0.0, 0.0, 0.0],
    [0.629, 0.629, 0.629],
    [-0.629, -0.629, 0.629],
    [-0.629, 0.629, -0.629],
    [0.629, -0.629, -0.629],
], np.float32)

ETHENE_XYZ = np.array([
    [0.0, 0.0, 0.667],
    [0.0, 0.0, -0.667],
    [0.0, 0.923, 1.238],
    [0.0, -0.923, 1.238],
    [0.0, 0.923, -1.238],
    [0.0, -0.923, -1.238],
], np.float32)


def test_geometry_fallback_methane():
    bonds = qm9.bonds_from_geometry(["C", "H", "H", "H", "H"], METHANE_XYZ)
    a = adj_from(["C", "H", "H", "H", "H"], bonds)
    assert (a[0, 1:] == 1).all() and a[1:, 1:].sum() == 0


def test_geometry_fallback_ethene_double_bond():
    bonds = qm9.bonds_from_geometry(["C", "C", "H", "H", "H", "H"],
                                    ETHENE_XYZ)
    a = adj_from(["C"] * 2 + ["H"] * 4, bonds)
    assert a[0, 1] == 2.0  # 1.334 A C=C
    assert a[0, 2] == a[0, 3] == a[1, 4] == a[1, 5] == 1.0


# --- end-to-end: dsgdb9nsd-format fixture through molecule_to_record ------

METHANE_DSGDB = """5
gdb 1\t157.7\t157.7\t157.7\t0.\t13.21\t-0.3877\t0.1171\t0.5048\t35.36\t0.044749\t-40.47893\t-40.476062\t-40.475117\t-40.498597\t6.469
C\t-0.0126981359\t1.0858041578\t0.0080009958\t-0.535689
H\t0.002150416\t-0.0060313176\t0.0019761204\t0.133921
H\t1.0117308433\t1.4637511618\t0.0002765748\t0.133922
H\t-0.540815069\t1.4475266138\t-0.8766437152\t0.133923
H\t-0.5238136345\t1.4379326443\t0.9063972942\t0.133923
1341.307\t1341.3284\t1341.365\t1562.6731\t1562.7453\t3038.3205\t3151.6034\t3151.6788\t3151.7078
C\tC
InChI=1S/CH4/h1H4\tInChI=1S/CH4/h1H4
"""


def test_molecule_to_record_smiles_path():
    mol = qm9.parse_xyz(METHANE_DSGDB)
    assert mol.na == 5 and mol.smiles == "C"
    rec = qm9.molecule_to_record(mol, use_rdkit=False)
    # SMILES-parser path: C bonded to 4 H, single bonds
    assert rec.adj.shape == (5, 5)
    assert (rec.adj[0, 1:] == 1).all()
    assert rec.x[0, 1] == 1.0  # one-hot C
    assert (rec.x[1:, 0] == 1.0).all()  # one-hot H
    np.testing.assert_allclose(rec.y[0], 13.21)  # alpha is task 0


def test_smiles_and_geometry_agree_on_fixture():
    mol = qm9.parse_xyz(METHANE_DSGDB)
    sb = qm9.bonds_from_smiles_pure(mol.smiles, mol.symbols)
    gb = qm9.bonds_from_geometry(mol.symbols, mol.coords)
    np.testing.assert_array_equal(adj_from(mol.symbols, sb),
                                  adj_from(mol.symbols, gb))
