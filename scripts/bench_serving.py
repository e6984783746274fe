#!/usr/bin/env python
"""Serving-path performance on the real chip (VERDICT r4 #8).

The serving path (jax.export StableHLO bundles, hgnn2_tpu/serving.py) was
correctness-tested but had no performance row. This harness exports all
three bundle kinds — dense GNN, packed LGGNN, CCN-2D — and measures
request latency (p50/p99 over repeated requests) and throughput at
request sizes 1 / 64 / 2048, end-to-end through ServingModel.predict:
host-side greedy packing/padding INCLUDED, device value fetched per
request (profiling.force_sync discipline — the returned ndarray is the
sync).

Writes runs/bench_serving/results.json.

  python scripts/bench_serving.py [--repeats 30]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hgnn2_tpu import runtime  # noqa: E402

runtime.setup()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from hgnn2_tpu import graphs, serving  # noqa: E402
from hgnn2_tpu.data import qm9  # noqa: E402
from hgnn2_tpu.nn import ccn as ccn_mod  # noqa: E402
from hgnn2_tpu.nn import models, packed  # noqa: E402


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_bundles(records, out_root):
    """Export one bundle per kind at a 256-molecule serving bucket."""
    bucket = records[:256]
    paths = {}

    b = graphs.make_dense_batch(bucket, n_max=32, batch_size=256, task=0)
    m = models.GNNSimple(n_features=2, n_layers=15, J=1)
    v = m.init(jax.random.key(0), b, train=False)
    exp = serving.export_model(m, v, b)
    p = os.path.join(out_root, "dense")
    serving.save_bundle(p, exp, kind="dense", task=0, mean=1.0, std=2.0)
    paths["dense_gnn_L15"] = p

    pb = graphs.make_packed_batch(
        bucket, node_capacity=8192, edge_capacity=16384, task=0,
        batch_size=256)
    pm = packed.PackedLGGNN(n_features=2, n_layers=5, J=1, order=2)
    pv = pm.init(jax.random.key(1), pb, train=False)
    exp = serving.export_model(pm, pv, pb)
    p = os.path.join(out_root, "packed")
    serving.save_bundle(p, exp, kind="packed", task=0, mean=1.0, std=2.0,
                        node_capacity=8192, edge_capacity=16384)
    paths["packed_lggnn_L5"] = p

    cb = ccn_mod.make_ccn_batch(bucket, task=0, vertex_capacity=8192,
                                batch_size=256)
    cm = ccn_mod.CCN2D(hidden=2, n_layers=2)
    cv = cm.init(jax.random.key(2), cb, train=False)
    exp = serving.export_model(cm, cv, cb)
    p = os.path.join(out_root, "ccn")
    serving.save_bundle(p, exp, kind="ccn", task=0, mean=1.0, std=2.0,
                        k_max=int(cb.nbr.shape[1]), vertex_capacity=8192)
    paths["ccn2d_L2"] = p
    return paths


def bench_requests(sm, records, size, repeats):
    reqs = [records[(i * size) % (len(records) - size)
                    : (i * size) % (len(records) - size) + size]
            for i in range(repeats)]
    sm.predict(reqs[0])  # warm/compile the serving call
    sm.predict(reqs[0])
    lat = []
    t_all = time.time()
    for r in reqs:
        t0 = time.time()
        out = sm.predict(r)  # returns a host ndarray -> full sync
        lat.append(time.time() - t0)
        assert np.isfinite(out).all()
    wall = time.time() - t_all
    lat_ms = np.array(lat) * 1e3
    return {
        "request_records": size,
        "repeats": repeats,
        "latency_ms_p50": round(float(np.percentile(lat_ms, 50)), 3),
        "latency_ms_p99": round(float(np.percentile(lat_ms, 99)), 3),
        "latency_ms_mean": round(float(lat_ms.mean()), 3),
        "throughput_molecules_per_s": round(size * repeats / wall, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=30)
    ap.add_argument("--out", default="runs/bench_serving")
    args = ap.parse_args()

    records = qm9.synthetic_qm9_like(4096, seed=0)
    results = {"device": str(jax.devices()[0]),
               "methodology": "ServingModel.predict end-to-end: greedy "
                              "host packing + padded bucket execution + "
                              "host fetch; p50/p99 over per-request "
                              "wall-clock", "bundles": {}}
    with tempfile.TemporaryDirectory() as tmp:
        for name, path in build_bundles(records, tmp).items():
            sm = serving.load_bundle(path)
            rows = []
            for size in (1, 64, 2048):
                reps = args.repeats if size < 2048 else max(
                    5, args.repeats // 5)
                row = bench_requests(sm, records, size, reps)
                rows.append(row)
                log(f"{name} x{size}: p50 {row['latency_ms_p50']} ms, "
                    f"p99 {row['latency_ms_p99']} ms, "
                    f"{row['throughput_molecules_per_s']:,.0f} mol/s")
            results["bundles"][name] = rows

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "results.json"), "w") as f:
        json.dump(results, f, indent=2)
        f.write("\n")
    print(json.dumps({k: v[-1] for k, v in results["bundles"].items()}))


if __name__ == "__main__":
    main()
