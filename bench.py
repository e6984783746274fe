#!/usr/bin/env python
"""Headline benchmark: GNN training throughput on QM9-shaped molecules.

Measures full training-step throughput (forward + backward + adamax update,
batched on one chip) of the power GNN in the reference's flagship QM9
configuration (L=15 layers, h=1, J=1 — scripts/exp_gnn_qm9.sh), on
synthetic QM9-shaped molecules (the real dataset is not shipped in this
environment; molecule size distribution matches QM9's 9-29 atoms).

Baseline: the reference trains this config at ~500 molecules/s on its 12GB
GPU (BASELINE.md: 4,306 s / 20 epochs over 107,108 molecules).

Methodology note: the measurement scans many optimizer steps over ONE
device-resident batch, which amortizes dispatch AND lets XLA hoist
batch-dependent subexpressions out of the loop — an upper bound on
device throughput. The honest end-to-end number is bench_epoch.py's
scanned-epoch row (fresh batch every step, loader included), which
BENCH_DETAILS.json reports alongside this one.

Prints exactly ONE JSON line on stdout; details go to stderr.
"""

import json
import sys
import time

from hgnn2_tpu import runtime

runtime.setup()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from hgnn2_tpu import graphs  # noqa: E402
from hgnn2_tpu.data import qm9, stats  # noqa: E402
from hgnn2_tpu.nn import models  # noqa: E402
from hgnn2_tpu.training import train as train_lib  # noqa: E402
from hgnn2_tpu.training.config import OptimConfig  # noqa: E402
from hgnn2_tpu.training.optim import build_optimizer  # noqa: E402

BASELINE_MOL_PER_S = 500.0  # reference GNN_simple epoch time, BASELINE.md
BATCH = 4096
N_MAX = 32
STEPS = 30


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    t0 = time.time()
    records = qm9.synthetic_qm9_like(BATCH, seed=0)
    ts = stats.compute_target_stats(records)
    batch = graphs.make_dense_batch(records, n_max=N_MAX, batch_size=BATCH, task=0)
    n_atoms = int(np.asarray(batch.n_nodes).sum())
    n_dir_edges = sum(r.n_dir_edges for r in records)
    log(f"data: {BATCH} molecules, {n_atoms} atoms, {n_dir_edges} directed edges "
        f"({time.time()-t0:.1f}s)")

    model = models.GNNSimple(n_features=1, n_layers=15, J=1)
    tx = build_optimizer(OptimConfig(optim="adamax", lr=3e-4), steps_per_epoch=1000)
    state = train_lib.TrainState.create(
        model, batch, tx, jax.random.key(0)
    )
    # N_INNER optimizer steps run inside one jitted lax.scan so the
    # measurement reflects device throughput, not host/tunnel dispatch.
    N_INNER = 20
    step = train_lib.make_multi_train_step(
        "regression", float(ts.mean[0]), float(ts.std[0]), n_inner=N_INNER
    )

    t0 = time.time()
    state, mets = step(state, batch)
    jax.block_until_ready(mets["loss"])
    log(f"compile+first {N_INNER} steps: {time.time()-t0:.1f}s loss={float(mets['loss']):.4f}")

    from hgnn2_tpu import profiling

    state, timing = profiling.time_scan_steps(step, state, batch, steps=STEPS, warmup=2)
    n_steps = STEPS * N_INNER
    dt = timing.total_s
    mol_per_s = BATCH * n_steps / dt
    edges_per_s = n_dir_edges * n_steps / dt
    log(f"{n_steps} steps in {dt:.2f}s -> {mol_per_s:,.0f} molecules/s, "
        f"{edges_per_s:,.0f} graph edges/s")

    print(json.dumps({
        "metric": "gnn_qm9_L15_train_throughput",
        "value": round(mol_per_s, 1),
        "unit": "molecules/s",
        "vs_baseline": round(mol_per_s / BASELINE_MOL_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
