"""Data pipeline tests: xyz parsing, bond inference, caching, generators,
bucketed loaders."""

import numpy as np

from hgnn2_tpu.data import batching, qm9, stats, synthetic

SAMPLE_XYZ = """5
gdb 1\t157.7118\t157.70997\t157.70699\t0.\t13.21\t-0.3877\t0.1171\t0.5048\t35.3641\t0.044749\t-40.47893\t-40.476062\t-40.475117\t-40.498597\t6.469\t
C\t-0.0126981359\t 1.0858041578\t 0.0080009958\t-0.535689
H\t 0.002150416\t-0.0060313176\t 0.0019761204\t 0.133921
H\t 1.0117308433\t 1.4637511618\t 0.0002765748\t 0.133922
H\t-0.540815069\t 1.4475266138\t-0.8766437152\t 0.133923
H\t-0.5238136345\t 1.4379326443\t 0.9063972942\t 0.133923
1341.307\t1341.3284\t1341.365\t1562.6731\t1562.7453\t3038.3205\t3151.6034\t3151.6788\t3151.7078
C\tC\t
InChI=1S/CH4/h1H4 InChI=1S/CH4/h1H4
"""


def test_parse_xyz_methane():
    mol = qm9.parse_xyz(SAMPLE_XYZ)
    assert mol.na == 5
    assert mol.symbols == ["C", "H", "H", "H", "H"]
    assert mol.ident == 1
    assert abs(mol.properties["mu"] - 0.0) < 1e-9
    assert abs(mol.properties["alpha"] - 13.21) < 1e-9
    assert abs(mol.properties["Cv"] - 6.469) < 1e-9
    assert mol.smiles == "C"
    assert len(mol.freqs) == 9


def test_geometry_bonds_methane():
    mol = qm9.parse_xyz(SAMPLE_XYZ)
    bonds = qm9.bonds_from_geometry(mol.symbols, mol.coords)
    # methane: exactly 4 C-H single bonds
    assert len(bonds) == 4
    assert all(o == 1.0 for _, _, o in bonds)
    assert all(i == 0 for i, _, _ in bonds)


def test_molecule_to_record_features_and_targets():
    mol = qm9.parse_xyz(SAMPLE_XYZ)
    r = qm9.molecule_to_record(mol, spatial=True, charge=True, use_rdkit=False)
    assert r.x.shape == (5, 9)
    np.testing.assert_array_equal(r.x[0, :5], [0, 1, 0, 0, 0])  # C one-hot
    np.testing.assert_array_equal(r.x[1, :5], [1, 0, 0, 0, 0])  # H one-hot
    np.testing.assert_allclose(r.x[:, 5:8], mol.coords)
    np.testing.assert_allclose(r.x[:, 8], mol.charges)
    # target order [alpha, Cv, G, gap, H, homo, lumo, mu, freq[-1], r2, U, U0, zpve]
    np.testing.assert_allclose(
        r.y,
        [13.21, 6.469, -40.498597, 0.5048, -40.475117, -0.3877, 0.1171, 0.0,
         3151.7078, 35.3641, -40.476062, -40.47893, 0.044749],
        rtol=1e-6,
    )
    assert r.adj.sum() == 8.0  # 4 bonds, both directions


def test_cache_roundtrip(tmp_path):
    recs = qm9.synthetic_qm9_like(10, seed=1)
    path = str(tmp_path / "cache.npz")
    qm9.save_cache(recs, path)
    back = qm9.load_cache(path)
    assert len(back) == 10
    for a, b in zip(recs, back):
        np.testing.assert_allclose(a.x, b.x)
        np.testing.assert_allclose(a.adj, b.adj)
        np.testing.assert_allclose(a.y, b.y)


def test_synthetic_collinear_shapes():
    recs = synthetic.three_collinear_points(50, n_max=20, dim=4, seed=3)
    assert len(recs) == 50
    labels = {int(r.y) for r in recs}
    assert labels == {0, 1}
    for r in recs:
        assert 3 <= r.n_nodes <= 20
        assert r.x.shape[1] == 4
        np.testing.assert_allclose(r.adj, r.adj.T)
        assert np.all(np.diag(r.adj) == 0)


def test_target_stats():
    recs = qm9.synthetic_qm9_like(64, seed=2)
    ts = stats.compute_target_stats(recs)
    assert ts.mean.shape == (13,)
    y0 = np.array([r.y[0] for r in recs])
    np.testing.assert_allclose(ts.mean[0], y0.mean(), rtol=1e-5)
    norm = ts.normalize(y0, 0)
    np.testing.assert_allclose(norm.mean(), 0.0, atol=1e-5)


def test_dense_loader_static_shapes():
    recs = qm9.synthetic_qm9_like(70, seed=4)
    loader = batching.DenseLoader(recs, batch_size=16, task=0, with_line_graph=True)
    shapes = set()
    n_graphs = 0
    for b in loader:
        assert b.x.shape[0] == 16
        shapes.add((b.x.shape[1], b.lg_src.shape[1]))
        n_graphs += int((np.asarray(b.n_nodes) > 0).sum())
    assert n_graphs == 70
    assert len(shapes) <= 3  # bucketed, not per-batch shapes


def test_ccn_loader_masks():
    recs = qm9.synthetic_qm9_like(20, seed=5)
    loader = batching.CCNLoader(recs, batch_size=8, task=0)
    tot = 0
    for cb in loader:
        assert cb.y.shape[0] == 8
        tot += int(np.asarray(cb.gmask).sum())
        assert cb.chi_idx.shape[1] == loader.k_max
    assert tot == 20


def test_cached_loader_replays_and_shuffles_order():
    recs = qm9.synthetic_qm9_like(48, seed=6)
    inner = batching.DenseLoader(recs, batch_size=8, task=0, sort=True)
    cached = batching.CachedLoader(inner, shuffle=True, seed=0)
    first = list(cached)
    assert len(first) == len(inner)
    # later epochs reuse the SAME batch objects (no host rebuild)...
    second = list(cached)
    assert {id(b) for b in second} == {id(b) for b in first}
    # ...in a reshuffled order (6 batches: identical order is a 1/720 fluke
    # avoided by the fixed seed)
    assert [id(b) for b in second] != [id(b) for b in first]
    tot = sum(int((np.asarray(b.n_nodes) > 0).sum()) for b in first)
    assert tot == 48
    # release() drops the cache; the next epoch transparently rebuilds
    # equivalent batches from the inner loader
    cached.release()
    assert cached._batches is None
    rebuilt = list(cached)
    assert len(rebuilt) == len(first)
    np.testing.assert_array_equal(
        np.sort(np.concatenate([np.asarray(b.y) for b in rebuilt])),
        np.sort(np.concatenate([np.asarray(b.y) for b in first])),
    )
