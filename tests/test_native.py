"""Native (C++) preprocessing library: parity with numpy fallbacks."""

import numpy as np
import pytest

from hgnn2_tpu import native, operators
from hgnn2_tpu.data import qm9
from hgnn2_tpu.nn import ccn
from tests.conftest import random_adjacency

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def test_native_line_graph_matches_numpy(rng):
    for n, p in [(5, 0.5), (12, 0.4), (20, 0.7)]:
        A = random_adjacency(rng, n, p)
        lg_native = operators.build_line_graph(A, use_native=True)
        lg_numpy = operators.build_line_graph(A, use_native=False)
        np.testing.assert_array_equal(lg_native.src, lg_numpy.src)
        np.testing.assert_array_equal(lg_native.dst, lg_numpy.dst)
        np.testing.assert_array_equal(lg_native.w, lg_numpy.w)
        np.testing.assert_array_equal(lg_native.rev, lg_numpy.rev)


def test_native_chi_tables_match_python(rng, monkeypatch):
    recs = qm9.synthetic_qm9_like(12, seed=0)
    cb_native = ccn.make_ccn_batch(recs, k_max=6)

    # force the python path
    monkeypatch.setattr(native, "available", lambda: False)
    cb_python = ccn.make_ccn_batch(recs, k_max=6)

    np.testing.assert_array_equal(np.asarray(cb_native.nbr), np.asarray(cb_python.nbr))
    np.testing.assert_array_equal(
        np.asarray(cb_native.chi_idx), np.asarray(cb_python.chi_idx)
    )
    np.testing.assert_array_equal(np.asarray(cb_native.deg), np.asarray(cb_python.deg))
    np.testing.assert_array_equal(
        np.asarray(cb_native.row_mask), np.asarray(cb_python.row_mask)
    )


def test_native_xyz_atom_parse():
    text = (
        "C\t-0.0126981359\t 1.0858041578\t 0.008*^-2\t-0.535689\n"
        "H\t 0.002150416\t-0.0060313176\t 0.0019761204\t 0.133921\n"
        "Cl\t 1.0\t2.0\t3.0\t0.25\n"
    )
    out = native.parse_xyz_atoms_native(text, 3)
    assert out is not None
    syms, coords, charges = out
    assert syms == ["C", "H", "Cl"]
    np.testing.assert_allclose(coords[0, 2], 0.008e-2, rtol=1e-6)
    np.testing.assert_allclose(charges, [-0.535689, 0.133921, 0.25], rtol=1e-6)


def test_native_chi_speedup(rng):
    """The native chi builder should comfortably beat the python loops."""
    import time

    recs = qm9.synthetic_qm9_like(300, seed=1)
    t0 = time.time()
    ccn.make_ccn_batch(recs, k_max=6)
    t_native = time.time() - t0

    import hgnn2_tpu.native as nat

    orig = nat.available
    nat.available = lambda: False
    try:
        t0 = time.time()
        ccn.make_ccn_batch(recs, k_max=6)
        t_python = time.time() - t0
    finally:
        nat.available = orig
    # timing under shared CI load is noisy — only guard against the
    # native path being catastrophically slower (measured ~1.4x faster
    # at 2k molecules; Amdahl-limited by list building + array transfer)
    assert t_native <= t_python * 3.0, (t_native, t_python)
