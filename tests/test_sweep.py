"""Sweep harness test (reference main_testing.py:59 / scripts/test.sh)."""

import json
import os

from hgnn2_tpu.cli import sweep


def test_sweep_ranks_points(tmp_path):
    out = str(tmp_path / "sweep")
    summary = sweep.main([
        "--arch", "gnn", "--epochs", "1", "--bs", "16",
        "--lrs", "1e-3,3e-4", "--Ls", "2", "--hs", "2",
        "--n_synthetic", "32", "--out", out,
    ])
    assert len(summary["points"]) == 2
    names = {p["name"] for p in summary["points"]}
    assert names == {"lr0.001_L2_h2", "lr0.0003_L2_h2"}
    assert summary["best"] in names
    with open(os.path.join(out, "sweep.json")) as f:
        on_disk = json.loads(f.read())
    assert on_disk["best"] == summary["best"]
    # ranked ascending by the validation score
    scores = [p["final"]["valid_error_ratio"] for p in summary["points"]]
    assert scores == sorted(scores)
    # each point kept its own full run dir (settings + per-epoch results)
    for p in summary["points"]:
        assert os.path.exists(os.path.join(out, p["name"], "experiment.json"))
