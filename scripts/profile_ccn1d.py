#!/usr/bin/env python
"""Profile and attack the CCN-1D L=20 train step (VERDICT r4 #2).

CCN-1D was the framework's weakest ratio (125x the reference at round 4)
and the only model family with no committed trace. This harness:

  1. xprof-traces the flagship CCN-1D step (L=20, h=2, bs=4096 — the
     reference exp_ccn1_qm9.sh config) on the XLA path and writes the
     top-op table (expect: 20 sequential gather -> row/col-sum -> tiny
     Dense chains, latency/gather-bound like the round-4 LGGNN study);
  2. measures the same step with the fused 1D promotion+contraction
     Pallas kernel (ops/pallas/ccn_fused.py, --ccn_kernel default);
  3. sweeps h to locate the width where the chip stops idling.

Writes runs/profile_ccn1d/{findings.json, op_table_xla.md}.

  python scripts/profile_ccn1d.py [--molecules 4096] [--layers 20]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hgnn2_tpu import runtime  # noqa: E402

runtime.setup()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from hgnn2_tpu import profiling  # noqa: E402
from hgnn2_tpu.data import qm9, stats  # noqa: E402
from hgnn2_tpu.nn import ccn as ccn_mod  # noqa: E402
from hgnn2_tpu.training import train as train_lib  # noqa: E402
from hgnn2_tpu.training.config import OptimConfig  # noqa: E402
from hgnn2_tpu.training.optim import build_optimizer  # noqa: E402
from profile_ccn1d_util import parse_hlo_stats  # noqa: E402


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def step_ms(model, cb, ts, steps=10, n_inner=5):
    tx = build_optimizer(OptimConfig(optim="adamax", lr=1e-3),
                         steps_per_epoch=100)
    state = train_lib.TrainState.create(model, cb, tx, jax.random.key(0))
    step = train_lib.make_multi_train_step(
        "regression", float(ts.mean[0]), float(ts.std[0]),
        n_inner=n_inner)
    state, timing = profiling.time_scan_steps(step, state, cb,
                                              steps=steps, warmup=2)
    return state, timing.per_step_s / n_inner * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--molecules", type=int, default=4096)
    ap.add_argument("--layers", type=int, default=20)
    ap.add_argument("--h", type=int, default=2)
    ap.add_argument("--sweep_h", type=int, nargs="*", default=[2, 8, 32])
    ap.add_argument("--out", default="runs/profile_ccn1d")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    records = qm9.synthetic_qm9_like(args.molecules, seed=0)
    ts = stats.compute_target_stats(records)
    cb = ccn_mod.make_ccn_batch(records, task=0)
    V, K = int(cb.chi_idx.shape[0]), int(cb.chi_idx.shape[1])
    log(f"batch: {args.molecules} molecules, V={V}, K={K}")

    findings = {"config": {"molecules": args.molecules, "V": V, "K": K,
                           "layers": args.layers, "h": args.h,
                           "optimizer": "adamax"}}

    # 1. XLA path: measure + trace
    xla = ccn_mod.CCN1D(hidden=args.h, n_layers=args.layers)
    tx = build_optimizer(OptimConfig(optim="adamax", lr=1e-3),
                         steps_per_epoch=100)
    state = train_lib.TrainState.create(xla, cb, tx, jax.random.key(0))
    one = train_lib.make_train_step("regression", float(ts.mean[0]),
                                    float(ts.std[0]))
    state, m = one(state, cb)
    profiling.force_sync(m["loss"])
    _, xla_ms = step_ms(xla, cb, ts)
    log(f"xla step: {xla_ms:.2f} ms")
    trace_dir = os.path.join(args.out, "trace_xla")
    jax.profiler.start_trace(trace_dir)
    for _ in range(3):
        state, m = one(state, cb)
    profiling.force_sync(m["loss"])
    jax.profiler.stop_trace()
    try:
        top, all_rows = parse_hlo_stats(trace_dir)
        dev_us = sum(r.get("total_time") or 0.0 for r in all_rows)
        findings["xla_trace"] = {
            "device_time_total_us_3steps": dev_us,
            "n_distinct_ops": len(all_rows),
            "top_ops": top[:12],
        }
        md = [f"# CCN-1D L={args.layers} h={args.h} XLA step profile", "",
              f"measured {xla_ms:.2f} ms/step; traced device op time "
              f"{dev_us/1e3:.1f} ms over 3 steps", "",
              "| rank | category | op | n | total us | % |", "|---|---|---|---|---|---|"]
        for i, r in enumerate(top):
            t = r.get("total_time") or 0.0
            md.append(f"| {i+1} | {r.get('category')} | "
                      f"`{str(r.get('hlo_op_expression') or r.get('hlo_op_name'))[:70]}` | "
                      f"{r.get('occurrences')} | {t:,.0f} | "
                      f"{100*t/max(dev_us,1e-9):.1f}% |")
        with open(os.path.join(args.out, "op_table_xla.md"), "w") as f:
            f.write("\n".join(md) + "\n")
        log("\n".join(md[:16]))
    except Exception as e:  # keep the measurements if xprof parsing breaks
        findings["xla_trace"] = {"error": str(e)[:300]}

    # 2. fused Pallas kernel path
    ker = ccn_mod.CCN1D(hidden=args.h, n_layers=args.layers,
                        pallas_kernel=True)
    _, ker_ms = step_ms(ker, cb, ts)
    log(f"kernel step: {ker_ms:.2f} ms ({xla_ms/ker_ms:.2f}x)")
    findings["step_ms"] = {"xla": xla_ms, "pallas_kernel": ker_ms,
                           "speedup": xla_ms / ker_ms}
    findings["molecules_per_s"] = {
        "xla": args.molecules / (xla_ms / 1e3),
        "pallas_kernel": args.molecules / (ker_ms / 1e3),
    }

    # 3. h sweep, both paths
    sweep = []
    for h in args.sweep_h:
        _, x_ms = step_ms(ccn_mod.CCN1D(hidden=h, n_layers=args.layers),
                          cb, ts, steps=6)
        _, k_ms = step_ms(
            ccn_mod.CCN1D(hidden=h, n_layers=args.layers,
                          pallas_kernel=True), cb, ts, steps=6)
        sweep.append({"h": h, "xla_ms": x_ms, "kernel_ms": k_ms})
        log(f"h={h}: xla {x_ms:.2f} ms, kernel {k_ms:.2f} ms")
    findings["h_sweep"] = sweep

    with open(os.path.join(args.out, "findings.json"), "w") as f:
        json.dump(findings, f, indent=2, default=float)
        f.write("\n")
    print(json.dumps(findings["step_ms"]))


if __name__ == "__main__":
    main()
