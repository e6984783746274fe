#!/usr/bin/env python
"""Re-runs the committed validation trainings (runs/validation_*).

Full-length learning runs on synthetic datasets for every model family —
the artifacts RESULTS.md's "Quality validation" section points at:

  validation_cls_gnn     power GNN,   collinear-points classification
  validation_cls_lggnn   line-graph GNN, same task
  validation_cls_ccn1d   CCN-1D,      same task
  validation_reg_gnn     power GNN,   synthetic QM9-shaped regression
  validation_reg_ccn2d   CCN-2D,      same regression

  python scripts/run_validation.py [--only name ...]
"""

import argparse
import shutil
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hgnn2_tpu.cli import common  # noqa: E402
from hgnn2_tpu.training.config import TrainConfig  # noqa: E402


def cls_cfg(arch, order=1, epochs=40):
    cfg = TrainConfig(batch_size=32, epochs=epochs)
    cfg.optim.lr = 3e-3
    cfg.model.arch = arch
    cfg.model.n_features = 6
    cfg.model.n_layers = 3
    cfg.model.order = order
    cfg.data.dataset = "synthetic"
    cfg.data.n_synthetic = 2000
    cfg.data.n_max = 12
    cfg.data.dim = 4
    cfg.data.p = 0.5
    cfg.data.c = 0.4
    return cfg


def reg_cfg(arch, h, L, lr=1e-3, epochs=120, n=8000, bs=64, order=2):
    """Configs sized to approach the achievable floor
    (runs/validation_reg_floor/floor.json; scripts/regression_floor.py):
    probe sweeps showed 8k molecules + wide models close most of the
    generalization gap, and 32k adds nothing — the residual val error is
    the nonlinear-counting gap (double-bond thresholds), not sample size."""
    cfg = TrainConfig(batch_size=bs, epochs=epochs)
    cfg.optim.lr = lr
    cfg.model.arch = arch
    cfg.model.n_features = h
    cfg.model.n_layers = L
    cfg.model.order = order
    cfg.data.dataset = "qm9_synthetic"
    cfg.data.n_synthetic = n
    return cfg


RUNS = {
    "validation_cls_gnn": lambda: cls_cfg("gnn"),
    "validation_cls_lggnn": lambda: cls_cfg("lggnn", order=2),
    "validation_cls_ccn1d": lambda: cls_cfg("ccn1d"),
    "validation_reg_gnn": lambda: reg_cfg("gnn", h=64, L=5),
    "validation_reg_lggnn": lambda: reg_cfg("lggnn", h=32, L=4),
    "validation_reg_ccn2d": lambda: reg_cfg(
        "ccn2d", h=6, L=3, lr=1e-3, epochs=200, n=2000, bs=32),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()
    names = args.only or list(RUNS)
    if args.only is None:
        # regression floors for both dataset sizes used below
        import subprocess
        here = os.path.dirname(os.path.abspath(__file__))
        for n, out in ((2000, "runs/validation_reg_floor"),
                       (8000, "runs/validation_reg_floor_8000")):
            subprocess.run(
                [sys.executable, os.path.join(here, "regression_floor.py"),
                 "--n", str(n), "--out", out], check=True)
    for name in names:
        cfg = RUNS[name]()
        cfg.log_path = os.path.join("runs", name)
        if os.path.exists(cfg.log_path):
            shutil.rmtree(cfg.log_path)  # fresh, complete artifact
        print(f"=== {name} ({cfg.model.arch}, {cfg.epochs} epochs)",
              file=sys.stderr, flush=True)
        _, history = common.run_experiment(cfg)
        assert len(history) == cfg.epochs, (name, len(history))
        print(f"=== {name} final: "
              f"{ {k: round(v, 4) for k, v in history[-1].items()} }",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
