#!/usr/bin/env python
"""Headline benchmark: GNN training throughput on QM9-shaped molecules.

Measures END-TO-END training epochs of the power GNN in the reference's
flagship QM9 configuration (L=15 layers, h=1, J=1 —
scripts/exp_gnn_qm9.sh) through the SHIPPED pipeline: CachedLoader
(device-resident batches) + scanned epochs (one lax.scan dispatch per
bucket group), a fresh batch every optimizer step, loader iteration and
the per-epoch metrics sync included. This is the honest number to compare
against the reference's 215 s/epoch (~500 molecules/s, BASELINE.md) —
nothing is amortized away except what the shipped trainer itself
amortizes.

The one-resident-batch device upper bound (XLA may hoist batch-dependent
work out of the loop) is also measured and reported as
device_upper_bound_* fields in the same JSON record, so both
methodologies survive in BENCH_r0N.json.

Synthetic QM9-shaped molecules stand in for the real dataset (not shipped
in this environment; size distribution matches QM9's 9-29 atoms).

Prints exactly ONE JSON line on stdout; details go to stderr.
"""

import json
import sys
import time

from hgnn2_tpu import runtime

runtime.setup()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from hgnn2_tpu.data import batching, qm9, stats  # noqa: E402
from hgnn2_tpu.nn import models  # noqa: E402
from hgnn2_tpu.training import train as train_lib  # noqa: E402
from hgnn2_tpu.training.config import OptimConfig  # noqa: E402
from hgnn2_tpu.training.optim import build_optimizer  # noqa: E402

BASELINE_MOL_PER_S = 500.0  # reference GNN_simple epoch time, BASELINE.md
# the reference's own training-set size (BASELINE.md: 215 s/epoch over
# 107,108 molecules) so the comparison is epoch-for-epoch at equal scale
MOLECULES = 107108
BATCH = 2048
EPOCHS = 3


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    t0 = time.time()
    records = qm9.synthetic_qm9_like(MOLECULES, seed=0)
    ts = stats.compute_target_stats(records)
    mean, std = float(ts.mean[0]), float(ts.std[0])
    n_dir_edges = sum(r.n_dir_edges for r in records)
    log(f"data: {MOLECULES} molecules, {n_dir_edges} directed edges "
        f"({time.time()-t0:.1f}s)")

    loader = batching.CachedLoader(
        batching.DenseLoader(records, BATCH, task=0, sort=True),
        shuffle=True, seed=0,
    )
    t0 = time.time()
    loader.materialize()
    log(f"built {len(loader)} batches in {time.time()-t0:.1f}s")

    model = models.GNNSimple(n_features=1, n_layers=15, J=1)
    tx = build_optimizer(OptimConfig(optim="adamax", lr=3e-4),
                         steps_per_epoch=len(loader))
    sample = next(iter(loader))
    state = train_lib.TrainState.create(model, sample, tx, jax.random.key(0))

    # --- end-to-end scanned epochs (the shipped default pipeline) -------
    groups = train_lib.group_stacked_batches(loader.batches())
    scan_fn = train_lib.make_scanned_epoch("regression", mean, std)
    rng = np.random.default_rng(0)
    t0 = time.time()
    state, _ = train_lib.run_epoch_scanned(state, groups, scan_fn, rng)
    log(f"first epoch (compile) {time.time()-t0:.1f}s")
    # one more warmup: the epoch right after the compile epoch still pays
    # residual host/runtime warmup (~3x steady state was observed); the
    # reference's 215 s baseline is a steady-state 20-epoch average, so
    # the measured window should be steady-state too
    t0 = time.time()
    state, _ = train_lib.run_epoch_scanned(state, groups, scan_fn, rng)
    log(f"warmup epoch {time.time()-t0:.2f}s")
    times = []
    for _ in range(EPOCHS):
        t0 = time.time()
        state, mets = train_lib.run_epoch_scanned(state, groups, scan_fn, rng)
        times.append(time.time() - t0)
    # headline = MEAN epoch time (the reference baseline is a 20-epoch
    # average, so min-of-3 would carry a best-case bias — ADVICE r4);
    # best case survives as a separate field.
    epoch_s = sum(times) / len(times)
    best_epoch_s = min(times)
    mol_per_s = MOLECULES / epoch_s
    log(f"scanned epochs: {[round(t, 3) for t in times]} s -> "
        f"{mol_per_s:,.0f} molecules/s end-to-end (mean), "
        f"{n_dir_edges / epoch_s:,.0f} edges/s, loss={mets['loss']:.4f}")

    # --- device upper bound: many steps over ONE resident batch ---------
    N_INNER, STEPS = 20, 15
    multi = train_lib.make_multi_train_step("regression", mean, std,
                                            n_inner=N_INNER)
    batch = sample
    state2, m2 = multi(state, batch)
    jax.block_until_ready(m2["loss"])
    from hgnn2_tpu import profiling

    state2, timing = profiling.time_scan_steps(multi, state2, batch,
                                               steps=STEPS, warmup=1)
    ub_mol_per_s = BATCH * STEPS * N_INNER / timing.total_s
    log(f"device upper bound (one resident batch): "
        f"{ub_mol_per_s:,.0f} molecules/s")

    print(json.dumps({
        "metric": "gnn_qm9_L15_train_throughput_end_to_end",
        "value": round(mol_per_s, 1),
        "unit": "molecules/s",
        "vs_baseline": round(mol_per_s / BASELINE_MOL_PER_S, 2),
        "epoch_s": round(epoch_s, 4),
        "best_epoch_s": round(best_epoch_s, 4),
        "molecules": MOLECULES,
        "methodology": "scanned epochs, fresh batch every step, loader "
                       "and metrics sync included (shipped CLI default); "
                       "headline is the MEAN of 3 measured epochs",
        "device_upper_bound_mol_per_s": round(ub_mol_per_s, 1),
        "device_upper_bound_vs_baseline": round(
            ub_mol_per_s / BASELINE_MOL_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
