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
    # per-point epoch curves and best-epoch metrics surface in sweep.json
    for p in on_disk["points"]:
        assert len(p["history"]) == 1
        assert "valid_error_ratio" in p["best"]


def test_best_epoch_metrics_tracks_peak_not_tail():
    # classic overfit: valid loss bottoms at epoch 2 then rises
    history = [
        {"valid_loss": 1.0, "valid_accuracy": 0.5},
        {"valid_loss": 0.2, "valid_accuracy": 0.9},
        {"valid_loss": 0.8, "valid_accuracy": 0.6},
    ]
    best = sweep._best_epoch_metrics(history)
    assert best["valid_loss"] == 0.2 and best["valid_loss_epoch"] == 2
    assert best["valid_accuracy"] == 0.9 and best["valid_accuracy_epoch"] == 2


def test_diverged_points_rank_last():
    # a diverged run's NaN metrics must not poison the sort order
    nan = float("nan")
    history_bad = [{"valid_error_ratio": nan}, {"valid_error_ratio": nan}]
    best_bad = sweep._best_epoch_metrics(history_bad)
    assert best_bad == {}  # no finite epoch survives
    history_late_nan = [{"valid_error_ratio": 0.7}, {"valid_error_ratio": nan}]
    best_late = sweep._best_epoch_metrics(history_late_nan)
    assert best_late["valid_error_ratio"] == 0.7
