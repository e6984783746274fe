#!/usr/bin/env python
"""Profile the flagship scanned LGGNN train step on the real chip.

Captures a jax.profiler trace of scanned-epoch training at the benchmark
shape, extracts the top HLO ops by device time (xprof hlo_stats), and
writes runs/profile_lggnn/{summary.json, op_table.md}. Supports the dense
one-hot-matmul layout (models.GNNLineGraph, the round-3 flagship) and the
packed segment-sum layout (nn.packed.PackedLGGNN via --packed), plus an
h sweep (--sweep_h 1 4 16) to locate where the device stops being
bandwidth-starved.

  python scripts/profile_lggnn.py [--molecules 16384] [--h 1] [--packed]
  python scripts/profile_lggnn.py --sweep_h 1 4 16 [--packed]
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


def build(records, ts, h, bs, use_packed, fused=False):
    if use_packed:
        inner = batching.PackedLoader(records, bs, task=0, sort=True)
        model = packed.PackedLGGNN(n_features=h, n_layers=5, J=1, order=2)
    else:
        inner = batching.DenseLoader(records, bs, task=0,
                                     with_line_graph=True, sort=True)
        model = models.GNNLineGraph(n_features=h, n_layers=5, J=1, order=2,
                                    fused_ops=fused)
    loader = batching.CachedLoader(inner, shuffle=False)
    loader.materialize()
    tx = build_optimizer(OptimConfig(optim="adamax", lr=3e-4),
                         steps_per_epoch=len(loader))
    sample = next(iter(loader))
    state = train_lib.TrainState.create(model, sample, tx, jax.random.key(0))
    groups = train_lib.group_stacked_batches(loader.batches())
    scan_fn = train_lib.make_scanned_epoch(
        "regression", float(ts.mean[0]), float(ts.std[0]))
    return state, groups, scan_fn, len(loader)


def timed_epochs(state, groups, scan_fn, epochs=3):
    # warm/compile
    t0 = time.time()
    state, _ = train_lib.run_epoch_scanned(state, groups, scan_fn)
    compile_s = time.time() - t0
    times = []
    for _ in range(epochs):
        t0 = time.time()
        state, mets = train_lib.run_epoch_scanned(state, groups, scan_fn)
        times.append(time.time() - t0)
    return state, min(times), compile_s, mets


def parse_hlo_stats(trace_dir, top_n=15):
    """Top HLO ops by total device time from the xprof hlo_stats tool."""
    from xprof.convert import raw_to_tool_data as r2t

    sess = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*")))[-1]
    xplane = glob.glob(os.path.join(sess, "*.xplane.pb"))
    data, _ = r2t.xspace_to_tool_data(xplane, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    tab = json.loads(data)
    cols = [c["id"] for c in tab["cols"]]
    rows = []
    for r in tab["rows"]:
        d = {c: (cell or {}).get("v") for c, cell in zip(cols, r["c"])}
        rows.append(d)
    rows.sort(key=lambda d: -(d.get("total_time") or 0.0))
    return rows[:top_n], rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--molecules", type=int, default=16384)
    ap.add_argument("--batch_size", type=int, default=2048)
    ap.add_argument("--h", type=int, default=1)
    ap.add_argument("--packed", action="store_true")
    ap.add_argument("--fused", action="store_true",
                    help="dense layout with FusedLGBundle combined-operator"
                         " einsums (one kernel per update)")
    ap.add_argument("--sweep_h", type=int, nargs="*", default=None)
    ap.add_argument("--out", default="runs/profile_lggnn")
    args = ap.parse_args()

    records = qm9.synthetic_qm9_like(args.molecules, seed=0)
    ts = stats.compute_target_stats(records)
    n_mol = len(records)
    layout = ("packed" if args.packed
              else "dense_fused" if args.fused else "dense")
    os.makedirs(args.out, exist_ok=True)

    if args.sweep_h:
        out = []
        for h in args.sweep_h:
            state, groups, scan_fn, n_steps = build(
                records, ts, h, args.batch_size, args.packed, args.fused)
            _, epoch_s, compile_s, mets = timed_epochs(state, groups, scan_fn)
            row = {
                "layout": layout, "h": h, "epoch_s": epoch_s,
                "per_step_ms": 1e3 * epoch_s / n_steps,
                "molecules_per_s": n_mol / epoch_s,
                "compile_s": compile_s,
                "loss": float(mets["loss"]),
            }
            out.append(row)
            log(f"h={h} [{layout}]: epoch {epoch_s:.3f}s "
                f"({row['per_step_ms']:.2f} ms/step, "
                f"{row['molecules_per_s']:,.0f} mol/s)")
        path = os.path.join(args.out, f"h_sweep_{layout}.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
        print(json.dumps(out))
        return

    state, groups, scan_fn, n_steps = build(
        records, ts, args.h, args.batch_size, args.packed, args.fused)
    state, epoch_s, compile_s, mets = timed_epochs(state, groups, scan_fn)
    log(f"[{layout} h={args.h}] scanned epoch {epoch_s:.3f}s over {n_steps} "
        f"steps ({1e3 * epoch_s / n_steps:.2f} ms/step, "
        f"{n_mol / epoch_s:,.0f} mol/s), compile {compile_s:.1f}s")

    trace_dir = os.path.join(args.out, f"trace_{layout}_h{args.h}")
    jax.profiler.start_trace(trace_dir)
    state, mets = train_lib.run_epoch_scanned(state, groups, scan_fn)
    jax.profiler.stop_trace()
    top, all_rows = parse_hlo_stats(trace_dir)

    dev_total_us = sum(r.get("total_time") or 0.0 for r in all_rows)
    summary = {
        "layout": layout,
        "h": args.h,
        "molecules": n_mol,
        "batch_size": args.batch_size,
        "steps_per_epoch": n_steps,
        "scanned_epoch_s": epoch_s,
        "per_step_ms": 1e3 * epoch_s / n_steps,
        "molecules_per_s": n_mol / epoch_s,
        "device_time_total_us": dev_total_us,
        "top_ops": top,
    }
    with open(os.path.join(args.out, f"summary_{layout}_h{args.h}.json"),
              "w") as f:
        json.dump(summary, f, indent=2, default=float)

    md = [f"# Scanned LGGNN step profile ({layout}, h={args.h})", "",
          f"epoch {epoch_s:.3f}s / {n_steps} steps = "
          f"{1e3 * epoch_s / n_steps:.2f} ms/step; device op time "
          f"{dev_total_us / 1e3:.1f} ms over the traced epoch", "",
          "| rank | category | op | occurrences | total us | % of device |",
          "|---|---|---|---|---|---|"]
    for i, r in enumerate(top):
        t = r.get("total_time") or 0.0
        md.append(
            f"| {i + 1} | {r.get('category')} | "
            f"`{str(r.get('hlo_op_expression') or r.get('hlo_op_name'))[:80]}`"
            f" | {r.get('occurrences')} | {t:,.0f} | "
            f"{100.0 * t / max(dev_total_us, 1e-9):.1f}% |")
    with open(os.path.join(args.out, f"op_table_{layout}_h{args.h}.md"),
              "w") as f:
        f.write("\n".join(md) + "\n")
    log("\n".join(md[:20]))
    print(json.dumps({k: v for k, v in summary.items() if k != "top_ops"}))


if __name__ == "__main__":
    main()
