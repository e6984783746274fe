"""Training-TRAJECTORY parity: the reference torch training loop and this
framework, run from identical initial weights on the committed fixture set
with the reference's own schedule (per-epoch Adamax re-creation,
main_gnn_qm9.py:185), must produce matching per-epoch metric curves.

The full 20-epoch artifact lives in runs/parity_trajectory (built by
scripts/parity_trajectory.py); this test runs a short head-to-head so
divergence fails CI in minutes.
"""

import os

import pytest

from tests import trajectory_common as tc


@pytest.fixture(scope="module")
def fixture_path():
    if not os.path.exists(tc.FIXTURE):
        tc.make_fixture()
    return tc.FIXTURE


import pytest as _pytest


@_pytest.mark.parametrize("arch", ["gnn", "lggnn"])
def test_trajectory_matches_reference(reference_path, fixture_path, arch):
    ref, ours = tc.run_both(h=2, L=3, J=1, bs=16, lr=1e-3, epochs=5,
                            n_mol=80, arch=arch, order=2)
    assert len(ref["history"]) == len(ours["history"]) == 5
    for e, (a, b) in enumerate(zip(ref["history"], ours["history"])):
        for k in ("train_loss_ema", "train_mae_ema", "val_loss", "val_mae"):
            rel = abs(b[k] - a[k]) / max(abs(a[k]), 1e-8)
            assert rel < 5e-3, (
                f"{arch} epoch {e} {k}: reference {a[k]:.6f} vs ours "
                f"{b[k]:.6f} (rel {rel:.2e})"
            )
    # the run must actually learn, or parity is vacuous
    assert ref["history"][-1]["train_loss_ema"] < (
        0.7 * ref["history"][0]["train_loss_ema"]
    )


def test_ccn_trajectory_matches_reference(reference_ccn_utils, fixture_path):
    """CCN-1D trained through the reference's OWN per-molecule loops
    (scripts/train_ccn.py / test_ccn.py, Adamax re-created per epoch) vs
    this framework stepping per molecule in the same order from identical
    initial weights."""
    ref, ours = tc.run_both_ccn(h=4, L=2, lr=1e-3, epochs=3, n_mol=48)
    assert len(ref["history"]) == len(ours["history"]) == 3
    for e, (a, b) in enumerate(zip(ref["history"], ours["history"])):
        for k in ("train_loss_ema", "train_mae_ema", "val_loss", "val_mae"):
            rel = abs(b[k] - a[k]) / max(abs(a[k]), 1e-8)
            assert rel < 1e-2, (
                f"ccn epoch {e} {k}: reference {a[k]:.6f} vs ours "
                f"{b[k]:.6f} (rel {rel:.2e})"
            )
    assert ref["history"][-1]["train_loss_ema"] < (
        0.9 * ref["history"][0]["train_loss_ema"]
    )
