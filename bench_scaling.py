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
    ap.add_argument("--molecules", type=int, default=1024,
                    help="molecule count for the full LGGNN train-step runs")
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

    # --- full LGGNN train steps (model-level scaling, not a bare op) ------
    import optax

    from hgnn2_tpu import graphs as graphs_lib
    from hgnn2_tpu.data import qm9
    from hgnn2_tpu.nn import packed

    records = qm9.synthetic_qm9_like(args.molecules, seed=1)
    tot_e = sum(r.line_graph().num_edges for r in records)
    tot_v = sum(r.n_nodes for r in records)
    results["lggnn"] = {"molecules": args.molecules, "dir_edges": tot_e,
                        "devices": {}}
    tx = optax.sgd(1e-3)

    # (a) molecule-aligned shards: zero comm per operator apply
    log("LGGNN train step, molecule-aligned shards:")
    base_mol = None
    for d in counts:
        mesh = Mesh(np.array(jax.devices()[:d]).reshape(1, d), ("data", "edge"))
        vcap = -(-tot_v // d) + 32
        ecap = -(-tot_e // d) + 32
        stacked = spmd.make_packed_shards(
            records, d, node_capacity=vcap, edge_capacity=ecap,
            graphs_per_shard=-(-args.molecules // d) + 8, task=0,
        )
        model = packed.PackedLGGNN(n_features=8, n_layers=3, J=1, order=2,
                                   bn_axis="edge")
        # init outside shard_map: use the axis-free twin (same params)
        init_model = packed.PackedLGGNN(n_features=8, n_layers=3, J=1, order=2)
        with jax.sharding.set_mesh(mesh):
            local0 = jax.tree_util.tree_map(lambda v: v[0], stacked)
            variables = init_model.init(jax.random.key(0), local0, train=True)
            params = variables["params"]
            rest = {k: v for k, v in variables.items() if k != "params"}
            loss_fn = spmd.sharded_packed_loss(model, mesh)
            opt_state = tx.init(params)

            @jax.jit
            def step(params, opt_state, stacked):
                loss, grads = jax.value_and_grad(
                    lambda p: loss_fn({"params": p, **rest}, stacked)
                )(params)
                updates, opt_state = tx.update(grads, opt_state)
                return optax.apply_updates(params, updates), opt_state, loss

            timing = profiling.time_steps(step, params, opt_state, stacked,
                                          steps=args.steps)
        eps = tot_e / timing.per_step_s
        if base_mol is None:
            base_mol = eps
        eff = eps / (d * base_mol)
        row = results["lggnn"]["devices"].setdefault(d, {})
        row["molecule_aligned_edges_per_s"] = eps
        row["molecule_aligned_efficiency"] = eff
        row["molecule_aligned_comm_bytes_per_step"] = 0.0
        log(f"{d} devices: {eps:,.0f} edges/s, efficiency {eff:.2%}, 0 comm B")

    # (b) replicated-state + psum partitioning: general graphs
    log("LGGNN train step, edge-partitioned (psum) over one packed batch:")
    base_ps = None
    pbig = graphs_lib.make_packed_batch(
        records,
        node_capacity=((tot_v + 63) // 64) * 64,
        edge_capacity=((tot_e + 63) // 64) * 64,
        task=0,
    )
    for d in counts:
        mesh = Mesh(np.array(jax.devices()[:d]).reshape(1, d), ("data", "edge"))
        if pbig.src.shape[0] % d:
            continue
        model = packed.PackedLGGNN(n_features=8, n_layers=3, J=1, order=2)
        with jax.sharding.set_mesh(mesh):
            ops = spmd.partitioned_packed_ops(mesh, pbig, J=1)
            variables = model.init(jax.random.key(0), pbig, train=True,
                                   ops=ops)
            params = variables["params"]
            rest = {k: v for k, v in variables.items() if k != "params"}

            def loss(p):
                out, _ = model.apply({"params": p, **rest}, pbig, train=True,
                                     ops=ops, mutable=["batch_stats"])
                per = (out[:, 0] - pbig.y) ** 2
                return (per * pbig.gmask).sum() / pbig.gmask.sum()

            opt_state = tx.init(params)

            @jax.jit
            def step(params, opt_state):
                l, grads = jax.value_and_grad(loss)(params)
                updates, opt_state = tx.update(grads, opt_state)
                return optax.apply_updates(params, updates), opt_state, l

            ops.psum_widths.clear()  # count one forward's collectives only
            _ = jax.eval_shape(loss, params)
            acct = ops.comm_bytes_per_step()
            timing = profiling.time_steps(step, params, opt_state,
                                          steps=args.steps)
        eps = tot_e / timing.per_step_s
        if base_ps is None:
            base_ps = eps
        eff = eps / (d * base_ps)
        row = results["lggnn"]["devices"].setdefault(d, {})
        row["psum_edges_per_s"] = eps
        row["psum_efficiency"] = eff
        row["psum_comm_bytes_per_step"] = acct["train_step_bytes_per_chip"]
        row["psum_allreduces_fwd"] = acct["n_allreduce_fwd"]
        log(f"{d} devices: {eps:,.0f} edges/s, efficiency {eff:.2%}, "
            f"{acct['train_step_bytes_per_chip']/1e6:.1f} MB/step/chip "
            f"({acct['n_allreduce_fwd']} fwd all-reduces)")

    with open("BENCH_SCALING.json", "w") as fjson:
        json.dump(results, fjson, indent=2, default=float)
        fjson.write("\n")
    log("wrote BENCH_SCALING.json")


if __name__ == "__main__":
    main()
