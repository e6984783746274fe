#!/usr/bin/env python
"""CCN-2D promotion-memory crossover: where the materialized path dies.

The materialized CCN-2D path builds the full (V, K, K, K, C) promotion
tensor T per layer; the scan-fused path (CCN2D(scan_promotion=True),
ops/contractions.promote_contract_18_fused) keeps O(V K^2 C) live memory.
At QM9 degrees (K <= 5) the materialized path is equal-or-faster; its
limit is MEMORY at high K. This harness walks a K ladder of complete
graphs and records, per path, throughput or the failure mode — the
committed crossover measurement RESULTS.md cites.

Each configuration runs in its OWN subprocess: a deliberate
out-of-memory attempt on the tunneled TPU can crash the remote worker
(observed at K=95: JaxRuntimeError "TPU worker process crashed"), which
would otherwise kill the whole ladder. That is also why this experiment
lives here and NOT in the driver-run bench_suite.py.

  python scripts/ccn_crossover.py [--ks 64 80 88]
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def child(k_nodes: int, mode: str, n_graphs: int = 16):
    from hgnn2_tpu import runtime

    runtime.setup()
    import numpy as np

    from hgnn2_tpu import graphs, profiling
    from hgnn2_tpu.nn import ccn as ccn_mod
    from hgnn2_tpu.training import train as train_lib
    from hgnn2_tpu.training.config import OptimConfig
    from hgnn2_tpu.training.optim import build_optimizer

    rng = np.random.default_rng(7)
    recs = []
    for _ in range(n_graphs):
        a = np.ones((k_nodes, k_nodes), np.float32) - np.eye(
            k_nodes, dtype=np.float32)
        xg = rng.standard_normal((k_nodes, 3)).astype(np.float32)
        recs.append(graphs.GraphRecord(x=xg, adj=a, y=np.float32(0.1)))
    cb = ccn_mod.make_ccn_batch(recs, vertex_capacity=k_nodes * n_graphs)
    K = int(cb.nbr.shape[1])
    V = k_nodes * n_graphs
    t_bytes = V * K**3 * 2 * 4  # fwd promotion tensor alone, C=2
    print(json.dumps({"phase": "built", "K": K, "V": V,
                      "n_graphs": n_graphs,
                      "materialized_T_bytes_fwd": t_bytes}), flush=True)
    model = ccn_mod.CCN2D(hidden=2, n_layers=2,
                          scan_promotion=(mode == "scan"))
    tx = build_optimizer(OptimConfig(optim="adamax", lr=1e-3),
                         steps_per_epoch=100)
    state = train_lib.TrainState.create(model, cb, tx, __import__("jax").random.key(0))
    step = train_lib.make_multi_train_step("regression", 0.0, 1.0, n_inner=3)
    state, timing = profiling.time_scan_steps(step, state, cb, steps=3,
                                              warmup=1)
    per_step = timing.per_step_s / 3
    print(json.dumps({
        "K": K, "V": V, "mode": mode, "n_graphs": n_graphs,
        "materialized_T_bytes_fwd": t_bytes,
        "ms_per_step": per_step * 1e3,
        "graphs_per_s": n_graphs / per_step,
    }))


_LOG_PREFIXES = ("WARNING", "INFO", "DEBUG", "E0000", "W0000", "I0000",
                 "=== Source", "learning/")


def _failure_evidence(stderr: str):
    """(best_error_line, traceback_tail): the actual exception text, not
    the traceback-filtering banner (the round-4 artifacts recorded 'For
    simplicity, JAX has removed its internal frames...' — useless)."""
    lines = [ln for ln in stderr.strip().splitlines()
             if ln.strip() and not ln.startswith(_LOG_PREFIXES)
             and "For simplicity, JAX has removed" not in ln
             and "Set JAX_TRACEBACK_FILTERING" not in ln]
    best = None
    for pat in ("RESOURCE_EXHAUSTED", "crashed", "restarted",
                "XlaRuntimeError", "JaxRuntimeError", "INTERNAL",
                "UNAVAILABLE", "Error"):
        best = next((ln for ln in reversed(lines) if pat in ln), None)
        if best:
            break
    tail = "\n".join(lines[-12:])
    return (best or (lines[-1] if lines else "?")).strip()[:400], tail


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", type=int, nargs="*", default=[64, 80, 88])
    ap.add_argument("--child", type=int, default=None)
    ap.add_argument("--mode", default=None)
    ap.add_argument("--graphs", type=int, default=16)
    ap.add_argument("--out", default="runs/ccn_crossover")
    args = ap.parse_args()
    if args.child is not None:
        child(args.child, args.mode, args.graphs)
        return

    def run_one(k, mode, n_graphs):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--child", str(k), "--mode", mode, "--graphs", str(n_graphs)],
            cwd=REPO, capture_output=True, text=True, timeout=1800,
        )
        row = {"k_nodes": k, "mode": mode, "n_graphs": n_graphs}
        parsed = None
        for line in proc.stdout.splitlines():
            try:
                cand = json.loads(line)
            except json.JSONDecodeError:
                continue
            if isinstance(cand, dict) and "ms_per_step" in cand:
                parsed = cand
            elif isinstance(cand, dict) and cand.get("phase") == "built":
                row.update({k_: v for k_, v in cand.items()
                            if k_ != "phase"})
        if proc.returncode == 0 and parsed:
            row.update(parsed)
            print(f"K~{k} {mode} x{n_graphs}: "
                  f"{parsed['ms_per_step']:.1f} ms/step "
                  f"(T fwd {parsed['materialized_T_bytes_fwd']/1e9:.1f} GB)",
                  file=sys.stderr, flush=True)
        else:
            err, tail = _failure_evidence(proc.stderr)
            row["failed"] = err
            row["traceback_tail"] = tail
            print(f"K~{k} {mode} x{n_graphs}: FAILED {err[:160]}",
                  file=sys.stderr, flush=True)
        return row

    rows = []
    for k in args.ks:
        for mode in ("materialized", "scan"):
            row = run_one(k, mode, args.graphs)
            rows.append(row)
            if "failed" in row and args.graphs > 4:
                # diagnosis probe: does the config survive at half the
                # batch? memory-proportional failures do; program-size or
                # tunnel failures do not
                rows.append(run_one(k, mode, args.graphs // 2))
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "results.json"), "w") as f:
        json.dump({"note": "complete graphs, CCN2D L=2 h=2; each config in "
                           "its own process (OOM can crash the remote TPU "
                           "worker). Failed configs retry at half batch: a "
                           "survival there shows the failure is memory-"
                           "proportional, not program-size/tunnel. "
                           "'failed' carries the actual exception line; "
                           "traceback_tail the last 12 lines (compile OOMs "
                           "end in the HLO temp-allocation dump).",
                   "rows": rows}, f, indent=2)
        f.write("\n")
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
