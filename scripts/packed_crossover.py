#!/usr/bin/env python
"""Packed vs dense layout crossover in model width h (VERDICT r4 #6).

Round 4 established that the packed segment-sum layout LOSES 1.5x to the
dense one-hot MXU layout at h=1 (TPU scatters are row-serial) — but
measured nothing wider, while the dense h-sweep showed h<=4 is free. The
one number a user choosing --packed needs is where (if anywhere) packed
wins on ONE chip as per-row gather cost amortizes over width. This
harness measures full-model SCANNED training epochs (the shipped
default pipeline) for GNN L=15 and LGGNN L=5 at h in {1, 4, 16, 64},
both layouts, and records the scan bucket-group counts — including the
effect of PackedLoader.uniform_caps=True (one capacity per epoch -> one
scan group, vs the ~30 groups the per-batch ladder produced in round 4).

Writes runs/packed_crossover/findings.json.

  python scripts/packed_crossover.py [--molecules 32768] [--epochs 3]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from hgnn2_tpu import runtime  # noqa: E402

runtime.setup()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from hgnn2_tpu.data import batching, qm9, stats  # noqa: E402
from hgnn2_tpu.nn import models, packed  # noqa: E402
from hgnn2_tpu.training import train as train_lib  # noqa: E402
from hgnn2_tpu.training.config import OptimConfig  # noqa: E402
from hgnn2_tpu.training.optim import build_optimizer  # noqa: E402


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def run_config(records, ts, family, h, layout, bs, epochs,
               uniform_caps=True):
    lg = family == "lggnn"
    L = 5 if lg else 15
    if layout == "dense":
        inner = batching.DenseLoader(records, bs, task=0, sort=True,
                                     with_line_graph=lg)
        model = (models.GNNLineGraph(n_features=h, n_layers=L, J=1, order=2)
                 if lg else models.GNNSimple(n_features=h, n_layers=L, J=1))
    else:
        inner = batching.PackedLoader(records, bs, task=0, sort=True,
                                      uniform_caps=uniform_caps)
        model = (packed.PackedLGGNN(n_features=h, n_layers=L, J=1, order=2)
                 if lg else packed.PackedGNN(n_features=h, n_layers=L, J=1))
    loader = batching.CachedLoader(inner, shuffle=True, seed=0)
    loader.materialize()
    tx = build_optimizer(OptimConfig(optim="adamax", lr=3e-4),
                         steps_per_epoch=len(loader))
    state = train_lib.TrainState.create(model, loader.peek_sample(), tx,
                                        jax.random.key(0))
    groups = train_lib.group_stacked_batches(loader.batches())
    scan_fn = train_lib.make_scanned_epoch(
        "regression", float(ts.mean[0]), float(ts.std[0]))
    rng = np.random.default_rng(0)
    t0 = time.time()
    state, _ = train_lib.run_epoch_scanned(state, groups, scan_fn, rng)
    compile_s = time.time() - t0
    times = []
    for _ in range(epochs):
        t0 = time.time()
        state, mets = train_lib.run_epoch_scanned(state, groups, scan_fn,
                                                  rng)
        times.append(time.time() - t0)
    epoch_s = sum(times) / len(times)
    row = {
        "family": family, "h": h, "layout": layout,
        "scan_bucket_groups": len(groups),
        "epoch_s_mean": round(epoch_s, 4),
        "epoch_s_all": [round(t, 4) for t in times],
        "molecules_per_s": round(len(records) / epoch_s, 1),
        "compile_s": round(compile_s, 1),
        "loss": round(float(mets["loss"]), 4),
    }
    if layout == "packed":
        row["uniform_caps"] = uniform_caps
    log(f"{family} h={h} {layout}"
        + (f" uniform={uniform_caps}" if layout == "packed" else "")
        + f": {epoch_s:.3f} s/epoch, {len(groups)} group(s)")
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--molecules", type=int, default=32768)
    ap.add_argument("--bs", type=int, default=2048)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--out", default="runs/packed_crossover")
    args = ap.parse_args()

    records = qm9.synthetic_qm9_like(args.molecules, seed=0)
    ts = stats.compute_target_stats(records)
    rows = []
    for family in ("gnn", "lggnn"):
        for h in (1, 4, 16, 64):
            rows.append(run_config(records, ts, family, h, "dense",
                                   args.bs, args.epochs))
            rows.append(run_config(records, ts, family, h, "packed",
                                   args.bs, args.epochs))
    # the ladder variant once, to quantify the group-count consolidation
    rows.append(run_config(records, ts, "gnn", 1, "packed", args.bs,
                           args.epochs, uniform_caps=False))

    os.makedirs(args.out, exist_ok=True)
    out = {
        "question": "where does the packed segment-sum layout beat the "
                    "dense one-hot layout in h on one chip, and what "
                    "does capacity consolidation buy?",
        "config": {"molecules": args.molecules, "bs": args.bs,
                   "epochs": args.epochs,
                   "gnn": "L=15 J=1", "lggnn": "L=5 J=1 order=2",
                   "pipeline": "CachedLoader + scanned epochs (shipped "
                               "default), mean of measured epochs"},
        "rows": rows,
    }
    with open(os.path.join(args.out, "findings.json"), "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(rows[-1]))


if __name__ == "__main__":
    main()
