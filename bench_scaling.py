#!/usr/bin/env python
"""Scaling-efficiency harness: edges/s at 1..N devices.

Measures the edge-partitioned aggregation (shard_map segment-sum + psum
over the 'edge' axis) and data-parallel training at increasing device
counts, reporting efficiency = throughput(N) / (N * throughput(1)).

On this container only one real chip exists, so by default the harness
runs on N virtual CPU devices — validating the scaling *logic* and giving
relative numbers; on a real slice the same script measures real ICI
scaling (pass --tpu).

  python bench_scaling.py [--devices 8] [--tpu]
"""

import argparse
import json
import sys


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--tpu", action="store_true",
                    help="use real devices instead of virtual CPU mesh")
    ap.add_argument("--nodes", type=int, default=2048)
    ap.add_argument("--avg_degree", type=int, default=16)
    ap.add_argument("--features", type=int, default=128)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    import jax

    if not args.tpu:
        from hgnn2_tpu import runtime

        runtime.force_cpu(args.devices)
        log("NOTE: virtual CPU devices share the same host cores — "
            "wall-clock efficiency is NOT meaningful here; this run "
            "validates the partitioning logic. Use --tpu on a real slice "
            "for true ICI scaling numbers.")
    else:
        from hgnn2_tpu import runtime

        runtime.setup()

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from hgnn2_tpu import profiling
    from hgnn2_tpu.parallel import spmd

    n_dev = min(args.devices, len(jax.devices()))
    V, F = args.nodes, args.features
    E = V * args.avg_degree
    rng = np.random.default_rng(0)
    src = np.sort(rng.integers(0, V, E)).astype(np.int32)
    dst = rng.integers(0, V, E).astype(np.int32)
    w = rng.random(E).astype(np.float32)
    x = rng.standard_normal((V, F)).astype(np.float32)

    results = {"edges": E, "nodes": V, "features": F, "devices": {}}
    base = None
    counts = [d for d in [1, 2, 4, 8, 16, 32] if d <= n_dev]
    for d in counts:
        mesh = Mesh(np.array(jax.devices()[:d]).reshape(1, d), ("data", "edge"))
        padded = spmd.pad_edges_for_partition(
            {"src": src, "dst": dst, "w": w}, d, V
        )
        with jax.sharding.set_mesh(mesh):
            spmm = spmd.partitioned_spmm(mesh, V)
            f = jax.jit(lambda s, t, ww, xx: spmm(s, t, ww, xx))
            a = (jnp.asarray(padded["src"]), jnp.asarray(padded["dst"]),
                 jnp.asarray(padded["w"]), jnp.asarray(x))
            timing = profiling.time_steps(f, *a, steps=args.steps)
        eps = E / timing.per_step_s
        if base is None:
            base = eps
        eff = eps / (d * base)
        results["devices"][d] = {
            "edges_per_s": eps,
            "efficiency_vs_linear": eff,
        }
        log(f"{d} devices: {eps:,.0f} edges/s, efficiency {eff:.2%}")

    # --- molecule-aligned local partitioning (empty cut -> no collective) --
    log("local (molecule-aligned) partitioning:")
    base_local = None
    for d in counts:
        mesh = Mesh(np.array(jax.devices()[:d]).reshape(1, d), ("data", "edge"))
        vl, el = V // d, E // d
        # build shard-local graphs with the same total size
        lsrc = np.sort(rng.integers(0, vl, (d, el))).astype(np.int32)
        ldst = rng.integers(0, vl, (d, el)).astype(np.int32)
        lw = rng.random((d, el)).astype(np.float32)
        lx = rng.standard_normal((d, vl, F)).astype(np.float32)
        with jax.sharding.set_mesh(mesh):
            spmm = spmd.local_partitioned_spmm(mesh, vl)
            f = jax.jit(lambda s, t, ww, xx: spmm(s, t, ww, xx))
            a = tuple(map(jnp.asarray, (lsrc, ldst, lw, lx)))
            timing = profiling.time_steps(f, *a, steps=args.steps)
        eps = d * el / timing.per_step_s
        if base_local is None:
            base_local = eps
        eff = eps / (d * base_local)
        results["devices"].setdefault(d, {})["local_edges_per_s"] = eps
        results["devices"][d]["local_efficiency_vs_linear"] = eff
        log(f"{d} devices: {eps:,.0f} edges/s, efficiency {eff:.2%}")

    with open("BENCH_SCALING.json", "w") as fjson:
        json.dump(results, fjson, indent=2, default=float)
    log("wrote BENCH_SCALING.json")


if __name__ == "__main__":
    main()
