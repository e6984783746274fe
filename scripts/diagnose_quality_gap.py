#!/usr/bin/env python
"""Diagnoses the quality-gap control result (VERDICT r4 #4 follow-up).

The control run (runs/validation_reg_gnn_control) REFUTED the round-4
explanation: with the generator's exact target features appended to the
node inputs — making the target linearly readable through the PowerLayer
stack's linear conv branch — the GNN still trains to ~1.0 train error
ratio (59x the lstsq floor of 0.017) and ~9.8 val, and the range split
shows every val target INSIDE the train range, so neither "architecture
can't count" nor extrapolation explains the gap.

This script isolates what does:

  A. linear-probe: the same node-sum features, the same Adamax/lr/
     epochs/batch-size/normalized targets, but a bare linear model
     y = w @ sum_n(feat) + b trained by SGD. Lands near the lstsq floor
     => data, normalization, optimizer, and schedule are all fine; the
     gap is created INSIDE the GNN stack.
  B. bn-mode: evaluate the trained control GNN on the val split with
     train-mode BN (batch statistics) vs eval-mode BN (running
     statistics). If train-mode eval collapses the val/train multiple,
     the epoch-to-epoch val swings are BN running-stat mismatch.
  C. error shape: per-molecule |err| quantiles on val — outlier
     concentration vs uniform inflation.

Writes runs/validation_reg_gnn_control/diagnosis.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hgnn2_tpu import runtime  # noqa: E402

runtime.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from hgnn2_tpu.cli import common  # noqa: E402
from hgnn2_tpu.data import batching, stats, synthetic  # noqa: E402
from run_validation import RUNS  # noqa: E402


def log(msg):
    print(f"[diagnose] {msg}", file=sys.stderr, flush=True)


def graph_features(records):
    """Node-sum features exactly as the sum readout would see them."""
    return np.stack([r.x.sum(axis=0) for r in records]).astype(np.float64)


def linear_probe(cfg, tr, va, ts):
    """A. Bare linear model on the node-sum features, same optimizer."""
    task = cfg.data.task
    mean, std = float(ts.mean[task]), float(ts.std[task])
    acc = float(ts.accuracy[task])
    Xtr, Xva = graph_features(tr), graph_features(va)
    ytr = (np.array([r.y[task] for r in tr]) - mean) / std
    yva = (np.array([r.y[task] for r in va]) - mean) / std
    # feature scaling comparable to the GNN's input path: raw sums
    w = jnp.zeros((Xtr.shape[1],))
    b = jnp.zeros(())
    params = {"w": w, "b": b}
    opt = optax.adamax(cfg.optim.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_fn(p):
            pred = xb @ p["w"] + p["b"]
            return jnp.mean((pred - yb) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    Xtr_j, ytr_j = jnp.asarray(Xtr), jnp.asarray(ytr)
    n, bs = len(Xtr), cfg.batch_size
    rng = np.random.default_rng(0)
    for epoch in range(cfg.epochs):
        order = rng.permutation(n)
        for i in range(0, n - bs + 1, bs):
            idx = order[i:i + bs]
            params, opt_state, loss = step(params, opt_state,
                                           Xtr_j[idx], ytr_j[idx])
    w, b = np.asarray(params["w"]), float(params["b"])

    def ratio(X, y):
        return float(np.abs(X @ w + b - y).mean() / acc)

    out = {"train_error_ratio": ratio(Xtr, ytr),
           "val_error_ratio": ratio(Xva, yva),
           "epochs": cfg.epochs, "lr": cfg.optim.lr,
           "optimizer": "adamax (same as the control run)"}
    log(f"A linear probe: {out}")
    return out


def bn_mode_eval(cfg, state, va, ts):
    """B/C. Trained control GNN on val, eval-mode vs train-mode BN."""
    task = cfg.data.task
    mean, std = float(ts.mean[task]), float(ts.std[task])
    acc = float(ts.accuracy[task])
    model = common.build_model(cfg, "regression")
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    res = {}
    for mode in ("eval", "train_stats"):
        errs = []
        for b in batching.DenseLoader(va, cfg.batch_size, task=task,
                                      sort=True):
            if mode == "eval":
                out = model.apply(variables, b, train=False)
            else:
                out, _ = model.apply(variables, b, train=True,
                                     mutable=["batch_stats"])
            out = np.asarray(jax.device_get(out))[:, 0]
            y = np.asarray(b.y)
            real = np.asarray(b.n_nodes) > 0
            errs.append(np.abs(out - (y - mean) / std)[real])
        errs = np.concatenate(errs)
        res[f"val_error_ratio_{mode}"] = float(errs.mean() / acc)
        if mode == "eval":
            q = np.quantile(errs / acc, [0.5, 0.9, 0.99, 1.0])
            res["val_error_ratio_quantiles_eval"] = {
                "p50": float(q[0]), "p90": float(q[1]),
                "p99": float(q[2]), "max": float(q[3])}
    log(f"B/C bn-mode + quantiles: {res}")
    return res


def main():
    cfg = RUNS["validation_reg_gnn_control"]()
    cfg.log_path = os.path.join("runs", "_diag_control")
    records, kind, ts, _ = common.load_records(cfg)
    tr, va, _te = synthetic.split_80_10_10(
        records, shuffle=cfg.data.shuffle_split, seed=cfg.seed)

    diag = {"context": {
        "control_final_train_error_ratio": 0.997,
        "control_final_val_error_ratio": 9.824,
        "lstsq_floor": "runs/validation_reg_floor_8000/floor.json",
    }}
    diag["A_linear_probe"] = linear_probe(cfg, tr, va, ts)

    log("retraining the control GNN for the BN-mode eval "
        f"({cfg.epochs} epochs)...")
    state, history = common.run_experiment(cfg)
    diag["control_retrain_final"] = {
        k: round(float(v), 4) for k, v in history[-1].items()}
    diag.update(bn_mode_eval(cfg, state, va, ts))

    out_dir = os.path.join("runs", "validation_reg_gnn_control")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "diagnosis.json"), "w") as f:
        json.dump(diag, f, indent=2, default=float)
        f.write("\n")
    log(json.dumps(diag, indent=1, default=float))


if __name__ == "__main__":
    main()
