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
    # naphthalene: FUSED aromatic rings — fusion carbons (3, 8) carry
    # 4.5 aromatic bond order and therefore no hydrogen
    ("c1ccc2ccccc2c1", ["C"] * 10 + ["H"] * 8,
     {(0, 1): 1.5, (1, 2): 1.5, (2, 3): 1.5, (3, 4): 1.5, (4, 5): 1.5,
      (5, 6): 1.5, (6, 7): 1.5, (7, 8): 1.5, (3, 8): 1.5, (8, 9): 1.5,
      (0, 9): 1.5,
      (0, 10): 1, (1, 11): 1, (2, 12): 1, (4, 13): 1, (5, 14): 1,
      (6, 15): 1, (7, 16): 1, (9, 17): 1}),
    # methylenecyclopropene-like: ring + exocyclic double bond
    ("C=C1C=C1", ["C", "C", "C", "C", "H", "H", "H", "H"],
     {(0, 1): 2, (1, 2): 1, (2, 3): 2, (1, 3): 1,
      (0, 4): 1, (0, 5): 1, (2, 6): 1, (3, 7): 1}),
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


# --- property tests over a GENERATED corpus -------------------------------
#
# Random valence-respecting molecules (trees + ring closures + double/
# triple bonds over C/N/O/F) are built graph-first, emitted as SMILES in
# DFS preorder, and re-parsed. Because the parser numbers heavy atoms in
# SMILES order and appends hydrogens in parent order, the expected
# adjacency is fully determined — an exact oracle at QM9 scale.

_VAL = {"C": 4, "N": 3, "O": 2, "F": 1}


def _random_molecule(rng, n_heavy):
    """Returns (symbols, {(i, j): order}) heavy-atom graph, valence-legal."""
    symbols = ["C"]
    rem = [4]
    edges = {}
    for i in range(1, n_heavy):
        # parent with at least one free valence slot
        cands = [p for p in range(i) if rem[p] >= 1 and symbols[p] != "F"]
        if not cands:
            break
        p = int(rng.choice(cands))
        sym = str(rng.choice(["C", "C", "C", "N", "O", "F"]))
        order = 1
        if sym in ("C", "N") and rem[p] >= 2 and rng.random() < 0.3:
            order = 2
            if sym == "C" and rem[p] >= 3 and rng.random() < 0.2:
                order = 3
        symbols.append(sym)
        rem.append(_VAL[sym] - order)
        rem[p] -= order
        edges[(p, len(symbols) - 1)] = float(order)
    # ring closures between atoms with spare valence
    n = len(symbols)
    for _ in range(3):
        free = [i for i in range(n) if rem[i] >= 1 and symbols[i] != "F"]
        rng.shuffle(free)
        pair = next(
            ((a, b) for ai, a in enumerate(free) for b in free[ai + 1:]
             if (min(a, b), max(a, b)) not in edges), None)
        if pair is None:
            break
        a, b = min(pair), max(pair)
        edges[(a, b)] = 1.0
        rem[a] -= 1
        rem[b] -= 1
    return symbols, edges


def _write_smiles(symbols, edges, bracket_h=False):
    """Emit kekulized SMILES in DFS preorder from atom 0; non-tree edges
    become ring-closure digits. bracket_h writes every atom in bracket
    form with its implicit-H count stated explicitly ([CH3] etc.)."""
    n = len(symbols)
    adj = {i: [] for i in range(n)}
    for (a, b), o in edges.items():
        adj[a].append((b, o))
        adj[b].append((a, o))
    order_map = {}  # old index -> DFS preorder position
    bond_sym = {1.0: "", 2.0: "=", 3.0: "#"}
    ring_digit = iter(range(1, 10))
    ring_at: dict[int, list] = {i: [] for i in range(n)}  # old idx -> tokens
    visited = set()
    tree_children: dict[int, list] = {i: [] for i in range(n)}

    # recursive DFS: preorder + tree edges + ring closures. An edge to an
    # already-visited atom (and only such an edge) becomes a ring bond.
    seen_edges = set()

    def dfs(v):
        visited.add(v)
        order_map[v] = len(order_map)
        for u, ou in sorted(adj[v]):
            e = (min(v, u), max(v, u))
            if e in seen_edges:
                continue
            seen_edges.add(e)
            if u in visited:
                d = next(ring_digit)
                ring_at[v].append((d, ou, True))
                ring_at[u].append((d, ou, False))
            else:
                tree_children[v].append((u, ou))
                dfs(u)

    dfs(0)

    hs = _h_counts(symbols, edges)

    def atom_token(v):
        if bracket_h:
            h = hs[v]
            return f"[{symbols[v]}" + (f"H{h}" if h else "") + "]"
        return symbols[v]

    def emit(v):
        out = atom_token(v)
        for d, o, first in ring_at[v]:
            out += (bond_sym[o] if first else "") + str(d)
        kids = tree_children[v]
        for k, (u, o) in enumerate(kids):
            sub = bond_sym[o] + emit(u)
            out += sub if k == len(kids) - 1 else f"({sub})"
        return out

    return emit(0), order_map


def _h_counts(symbols, edges):
    import math as _m

    s = [0.0] * len(symbols)
    for (a, b), o in edges.items():
        s[a] += o
        s[b] += o
    return [max(0, _VAL[sym] - _m.ceil(t)) for sym, t in zip(symbols, s)]


def _expected_graph(symbols, edges, order_map):
    """Re-index the generated graph by DFS preorder and append hydrogens
    the way the parser does (parent order)."""
    n = len(symbols)
    new_sym = [None] * n
    for old, new in order_map.items():
        new_sym[new] = symbols[old]
    new_edges = {}
    for (a, b), o in edges.items():
        i, j = order_map[a], order_map[b]
        new_edges[(min(i, j), max(i, j))] = o
    hs = _h_counts(new_sym, new_edges)
    h_idx = n
    out_sym = list(new_sym)
    for i in range(n):
        for _ in range(hs[i]):
            out_sym.append("H")
            new_edges[(i, h_idx)] = 1.0
            h_idx += 1
    a = np.zeros((len(out_sym), len(out_sym)), np.float32)
    for (i, j), o in new_edges.items():
        a[i, j] = a[j, i] = o
    return out_sym, a


@pytest.mark.parametrize("seed", range(40))
def test_generated_corpus_roundtrip(seed):
    rng = np.random.default_rng(seed)
    symbols, edges = _random_molecule(rng, n_heavy=int(rng.integers(2, 10)))
    smi, order_map = _write_smiles(symbols, edges)
    psyms, bonds = smiles.parse(smi)
    exp_sym, exp_adj = _expected_graph(symbols, edges, order_map)
    assert psyms == exp_sym, smi
    np.testing.assert_array_equal(adj_from(psyms, bonds), exp_adj,
                                  err_msg=smi)


@pytest.mark.parametrize("seed", range(20))
def test_bracket_form_equivalent_to_plain(seed):
    """Writing every atom in bracket form with explicit H counts must give
    the identical graph — exercises bracket parsing across the corpus."""
    rng = np.random.default_rng(1000 + seed)
    symbols, edges = _random_molecule(rng, n_heavy=int(rng.integers(2, 9)))
    plain, _ = _write_smiles(symbols, edges)
    bracket, _ = _write_smiles(symbols, edges, bracket_h=True)
    s1, b1 = smiles.parse(plain)
    s2, b2 = smiles.parse(bracket)
    assert s1 == s2, (plain, bracket)
    np.testing.assert_array_equal(adj_from(s1, b1), adj_from(s2, b2),
                                  err_msg=f"{plain} vs {bracket}")


# --- SMILES-vs-geometry differential on embedded 3D molecules -------------

# keys in sorted() order, matching the lookup below
_BOND_LEN = {("C", "C"): 1.54, ("C", "N"): 1.47, ("C", "O"): 1.43,
             ("C", "F"): 1.35, ("N", "O"): 1.40, ("N", "N"): 1.45,
             ("O", "O"): 1.48, ("F", "N"): 1.36, ("F", "O"): 1.42,
             ("C", "H"): 1.09, ("H", "N"): 1.01, ("H", "O"): 0.96,
             ("F", "H"): 0.92}


def _embed_tree(symbols, edges, rng):
    """3D coordinates for a single-bond tree: each atom placed at its
    typical bond length from its parent, rejection-sampled so non-bonded
    pairs stay outside the covalent cutoff."""
    n = len(symbols)
    coords = np.zeros((n, 3), np.float64)
    parent = {}
    for (a, b) in sorted(edges):
        parent[b] = a
    radius = {"H": 0.31, "C": 0.76, "N": 0.71, "O": 0.66, "F": 0.57}
    for _ in range(2000):
        ok_all = True
        for v in range(1, n):
            p = parent[v]
            key = tuple(sorted((symbols[p], symbols[v])))
            d = _BOND_LEN[key]
            placed = False
            for _ in range(300):
                u = rng.standard_normal(3)
                u /= np.linalg.norm(u)
                pos = coords[p] + d * u
                ok = True
                for o in range(v):
                    if o == p:
                        continue
                    # non-bonded pairs must clear THEIR covalent cutoff
                    cut = radius[symbols[v]] + radius[symbols[o]] + 0.50
                    if np.linalg.norm(pos - coords[o]) < cut:
                        ok = False
                        break
                if ok:
                    coords[v] = pos
                    placed = True
                    break
            if not placed:
                ok_all = False
                break
        if ok_all:
            return coords.astype(np.float32)
    return None


@pytest.mark.parametrize("seed", range(20))
def test_smiles_vs_geometry_differential(seed):
    """For an embeddable single-bond molecule, the SMILES parser and the
    3D-geometry fallback must produce the same bond graph."""
    rng = np.random.default_rng(2000 + seed)
    # tree only (no rings / multiple bonds): remove ring-closure step by
    # regenerating until the molecule is a pure single-bond tree
    for _ in range(50):
        symbols, edges = _random_molecule(rng, n_heavy=int(rng.integers(2, 7)))
        if all(o == 1.0 for o in edges.values()):
            break
    else:
        pytest.skip("no single-bond tree generated")
    # drop any ring edges to guarantee a tree
    tree = {}
    seen = {0}
    for (a, b), o in sorted(edges.items()):
        if b not in seen:
            tree[(a, b)] = o
            seen.add(b)
    smi, order_map = _write_smiles(symbols, tree)
    psyms, pbonds = smiles.parse(smi)
    full_edges = {}
    for i, j, o in pbonds:
        full_edges[(min(i, j), max(i, j))] = o
    coords = _embed_tree(psyms, full_edges, rng)
    if coords is None:
        pytest.skip("embedding failed")
    gbonds = qm9.bonds_from_geometry(psyms, coords)
    np.testing.assert_array_equal(adj_from(psyms, pbonds),
                                  adj_from(psyms, gbonds), err_msg=smi)


# --- RDKit cross-check: activates wherever rdkit is installed -------------


def _rdkit_graph(smi):
    from rdkit import Chem

    mol = Chem.AddHs(Chem.MolFromSmiles(smi))
    symbols = [a.GetSymbol() for a in mol.GetAtoms()]
    bonds = [(b.GetBeginAtomIdx(), b.GetEndAtomIdx(),
              b.GetBondTypeAsDouble()) for b in mol.GetBonds()]
    return symbols, bonds


def test_rdkit_cross_check_hand_cases():
    pytest.importorskip("rdkit")
    for smi, _, _ in CASES:
        rsyms, rbonds = _rdkit_graph(smi)
        psyms, pbonds = smiles.parse(smi)
        assert psyms == rsyms, smi
        np.testing.assert_array_equal(adj_from(psyms, pbonds),
                                      adj_from(rsyms, rbonds), err_msg=smi)


def test_rdkit_cross_check_generated_corpus():
    pytest.importorskip("rdkit")
    for seed in range(200):
        rng = np.random.default_rng(3000 + seed)
        symbols, edges = _random_molecule(rng, n_heavy=int(rng.integers(2, 10)))
        smi, _ = _write_smiles(symbols, edges)
        rsyms, rbonds = _rdkit_graph(smi)
        psyms, pbonds = smiles.parse(smi)
        assert psyms == rsyms, smi
        np.testing.assert_array_equal(adj_from(psyms, pbonds),
                                      adj_from(rsyms, rbonds), err_msg=smi)
