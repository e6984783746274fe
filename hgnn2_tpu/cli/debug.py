"""Debug/smoke harness (reference scripts/debug.py): tiny end-to-end runs
of each model family on small synthetic data.

  python -m hgnn2_tpu.cli.debug --arch gnn
  python -m hgnn2_tpu.cli.debug --all
"""

import argparse
import time

from hgnn2_tpu.cli import common
from hgnn2_tpu.training.config import TrainConfig

ARCHS = ["gnn", "lggnn", "ccn1d", "ccn2d"]


def smoke(arch: str, dataset: str = "synthetic") -> dict:
    cfg = TrainConfig(batch_size=16, epochs=2)
    cfg.optim.lr = 3e-3
    cfg.model.arch = arch
    cfg.model.n_features = 3
    cfg.model.n_layers = 3
    cfg.data.dataset = dataset
    cfg.data.n_synthetic = 64
    cfg.data.n_max = 12
    t0 = time.time()
    _, history = common.run_experiment(cfg)
    out = dict(history[-1]) if history else {}
    out["wall_s"] = round(time.time() - t0, 1)
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description="debug smoke runs")
    p.add_argument("--arch", choices=ARCHS, default="gnn")
    p.add_argument("--dataset", choices=["synthetic", "qm9"], default="synthetic")
    p.add_argument("--all", action="store_true")
    args = p.parse_args(argv)
    archs = ARCHS if args.all else [args.arch]
    for arch in archs:
        result = smoke(arch, args.dataset)
        print(f"{arch}: {result}")


if __name__ == "__main__":
    main()
