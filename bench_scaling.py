#!/usr/bin/env python
"""Scaling-efficiency harness: full LGGNN train steps at 1..N devices.

Three partitioning modes, in order of scaling efficiency:

  * molecule_aligned (HEADLINE) — molecules never span shards, every
    operator apply is fully local; the only collectives are the BatchNorm
    statistics (two (F,) psums + a scalar per BN) and the loss reduction.
    This is the configuration for many-small-graphs training (QM9) and the
    one the >=80% scaling north star refers to.
  * halo_giant_graph — one connected graph too large to replicate: nodes in
    contiguous ranges, per-apply comm = all_gather of the halo rows only
    (O(S*H*F), parallel/halo.py).
  * psum_fallback — replicated node state + one (V, F) all-reduce per
    operator apply: the general-case fallback; O(V*F) comm per apply makes
    it the WORST-scaling mode by construction (17 all-reduces per LGGNN
    forward). Kept as the correctness baseline for arbitrary cuts.

On this container only one real chip exists, so by default the harness
runs on N virtual CPU devices — validating partitioning logic and
measuring EXACT comm bytes per step; wall-clock efficiency on shared host
cores is meaningless. The "projection" section turns the measured
single-device step time + exact comm bytes into a no-overlap lower bound
on real-slice efficiency: eff(d) >= (t1/d) / (t1/d + bytes(d)/BW_ICI).
Pass --tpu on a real slice for true ICI scaling.

  python bench_scaling.py [--devices 8] [--tpu] [--ici_gbps 90]
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
    ap.add_argument("--ici_gbps", type=float, default=90.0,
                    help="assumed per-chip ICI all-reduce bandwidth (GB/s) "
                         "for the efficiency projection (TPU v5e ring "
                         "axis, one-way ~45 GB/s/link x 2 links/axis)")
    ap.add_argument("--project_from", default=None,
                    help="existing BENCH_SCALING.json (virtual-CPU run) "
                         "whose exact comm-byte rows get re-anchored on "
                         "THIS backend's measured 1-device step times — "
                         "the real-chip projection path when only one "
                         "chip exists")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        from hgnn2_tpu import runtime

        runtime.force_cpu(args.devices)
        log("NOTE: virtual CPU devices share the same host cores — "
            "wall-clock efficiency is NOT meaningful here; this run "
            "validates the partitioning logic and measures exact comm "
            "bytes. Use --tpu on a real slice for true ICI scaling; see "
            "the 'projection' section for the comm-arithmetic bound.")
    else:
        from hgnn2_tpu import runtime

        runtime.setup()

    import numpy as np
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh

    from hgnn2_tpu import graphs as graphs_lib
    from hgnn2_tpu import profiling
    from hgnn2_tpu.data import qm9
    from hgnn2_tpu.nn import packed
    from hgnn2_tpu.parallel import halo as halo_lib
    from hgnn2_tpu.parallel import spmd

    n_dev = min(args.devices, len(jax.devices()))
    counts = [d for d in [1, 2, 4, 8, 16, 32] if d <= n_dev]
    prior = None
    if args.project_from:
        with open(args.project_from) as f:
            prior = json.load(f)
        counts = [1]  # measure single-device step times only
    bw = args.ici_gbps * 1e9
    results = {
        "headline_mode": "molecule_aligned",
        "assumed_ici_bytes_per_s": bw,
        "lggnn": {},
        "bare_spmm": {},
        "projection": {},
    }
    tx = optax.sgd(1e-3)

    records = qm9.synthetic_qm9_like(args.molecules, seed=1)
    tot_e = sum(r.line_graph().num_edges for r in records)
    tot_v = sum(r.n_nodes for r in records)
    results["lggnn"]["molecules"] = args.molecules
    results["lggnn"]["dir_edges"] = tot_e
    L, H = 3, 8

    # === (a) HEADLINE: molecule-aligned shards — zero comm per apply ====
    log("LGGNN train step, molecule-aligned shards (HEADLINE):")
    mode_a = {}
    base_mol = t1_mol = None
    for d in counts:
        mesh = Mesh(np.array(jax.devices()[:d]).reshape(1, d), ("data", "edge"))
        vcap = -(-tot_v // d) + 32
        ecap = -(-tot_e // d) + 32
        stacked = spmd.make_packed_shards(
            records, d, node_capacity=vcap, edge_capacity=ecap,
            graphs_per_shard=-(-args.molecules // d) + 8, task=0,
        )
        model = packed.PackedLGGNN(n_features=H, n_layers=L, J=1, order=2,
                                   bn_axis="edge")
        init_model = packed.PackedLGGNN(n_features=H, n_layers=L, J=1, order=2)
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
            base_mol, t1_mol = eps, timing.per_step_s
        # exact comm arithmetic: per BN train call, psum of count (1) +
        # sum (2H) + sq (2H) floats; 2 BNs per non-final layer; loss: 2
        # scalars. Backward transposes each psum -> x2. Plus ONE gradient
        # all-reduce of the replicated params per step (these models are
        # KB-sized, but the accounting is exact).
        n_params = int(sum(np.prod(l.shape) for l in
                           jax.tree_util.tree_leaves(params)))
        ring = 2.0 * (d - 1) / d
        fwd_floats = 2 * (L - 1) * (4 * H + 1) + 2
        comm = 2 * ring * fwd_floats * 4 + ring * 4 * n_params
        mode_a[d] = {
            "edges_per_s": eps,
            "efficiency_vs_linear": eps / (d * base_mol),
            "comm_bytes_per_step": comm,
        }
        log(f"  {d} devices: {eps:,.0f} edges/s, eff "
            f"{mode_a[d]['efficiency_vs_linear']:.2%}, {comm:,.0f} B/step")
    results["lggnn"]["molecule_aligned"] = {"devices": mode_a}

    # === (a2) HYBRID: dp x molecule-aligned shards on ONE mesh ==========
    # (cli --dp M --edge_shards N; training/sharded.py axes-parametric
    # step fns). Comm = the SAME BN-stat/loss psums and gradient
    # all-reduce, now ringed over all M*N devices — the composition adds
    # no new collective classes, which is the point.
    from hgnn2_tpu.training import sharded as sharded_lib
    import time as _time

    log("LGGNN train step, HYBRID dp x edge shards:")
    mode_h = {}
    for d in counts:
        if d < 4 or d % 2:
            continue
        n_dp, n_es = 2, d // 2
        mesh = Mesh(np.array(jax.devices()[:d]).reshape(n_dp, n_es),
                    ("data", "edge"))
        loader = sharded_lib.ShardedPackedLoader(
            records, batch_size=len(records), n_shards=n_es, task=0,
            n_data=n_dp)
        stacked = loader.peek_sample()
        model = packed.PackedLGGNN(n_features=H, n_layers=L, J=1, order=2,
                                   bn_axis=("data", "edge"))
        init_model = packed.PackedLGGNN(n_features=H, n_layers=L, J=1,
                                        order=2)
        with jax.sharding.set_mesh(mesh):
            local0 = jax.tree_util.tree_map(lambda v: v[(0, 0)], stacked)
            variables = init_model.init(jax.random.key(0), local0,
                                        train=True)
            params = variables["params"]
            bstats = variables.get("batch_stats", {})
            opt_state = tx.init(params)
            train_step, _ = sharded_lib.make_sharded_step_fns(
                model, mesh, tx, axes=("data", "edge"))
            p, b, o, mets = train_step(params, bstats, opt_state, stacked)
            profiling.force_sync(mets["loss"])
            t0 = _time.time()
            for _ in range(args.steps):
                p, b, o, mets = train_step(p, b, o, stacked)
            profiling.force_sync(mets["loss"])
            per_step = (_time.time() - t0) / args.steps
        eps = tot_e / per_step
        n_params = int(sum(np.prod(l.shape) for l in
                           jax.tree_util.tree_leaves(params)))
        ring = 2.0 * (d - 1) / d
        fwd_floats = 2 * (L - 1) * (4 * H + 1) + 2
        comm = 2 * ring * fwd_floats * 4 + ring * 4 * n_params
        mode_h[d] = {
            "mesh": [n_dp, n_es],
            "edges_per_s": eps,
            "efficiency_vs_linear": eps / (d * base_mol),
            "comm_bytes_per_step": comm,
        }
        log(f"  {d} devices ({n_dp}x{n_es}): {eps:,.0f} edges/s, "
            f"{comm:,.0f} B/step")
    results["lggnn"]["hybrid_dp_x_edge"] = {"devices": mode_h}

    # === (b) halo partitioning of one giant connected graph =============
    log("LGGNN train step, halo-partitioned giant graph:")
    Vg = args.nodes
    rng = np.random.default_rng(0)
    a = np.zeros((Vg, Vg), np.float32)
    for v in range(Vg):
        for dd in range(1, 4):
            a[v, (v + dd) % Vg] = 1.0
    for _ in range(Vg // 64):  # sparse long-range edges
        i, j = rng.integers(0, Vg, 2)
        if i != j:
            a[i, j] = 1.0
    a = np.maximum(np.triu(a, 1), np.triu(a.T, 1))
    a = a + a.T
    giant = graphs_lib.GraphRecord(
        x=rng.standard_normal((Vg, 5)).astype(np.float32),
        adj=a, y=np.array([1.0] * 13, np.float32))
    pbg = graphs_lib.make_packed_batch([giant], task=0)
    ge = pbg.num_edge_slots
    mode_b = {}
    base_h = t1_halo = None
    for d in counts:
        if Vg % d:
            continue
        mesh = Mesh(np.array(jax.devices()[:d]).reshape(1, d), ("data", "edge"))
        bundle = halo_lib.build_halo_lg_bundle(pbg, d)
        model = packed.PackedLGGNN(n_features=H, n_layers=L, J=1, order=2,
                                   bn_axis="edge")
        init_model = packed.PackedLGGNN(n_features=H, n_layers=L, J=1, order=2)
        comm_log = halo_lib.new_comm_log()
        with jax.sharding.set_mesh(mesh):
            variables = init_model.init(jax.random.key(0), pbg, train=True)
            params = variables["params"]
            rest = {k: v for k, v in variables.items() if k != "params"}
            loss_fn = halo_lib.halo_packed_loss(model, mesh, bundle,
                                                comm_log=comm_log)
            jax.eval_shape(lambda p: loss_fn({"params": p, **rest}), params)
            acct = halo_lib.halo_comm_bytes(comm_log, bundle, d)
            opt_state = tx.init(params)

            @jax.jit
            def hstep(params, opt_state):
                loss, grads = jax.value_and_grad(
                    lambda p: loss_fn({"params": p, **rest})
                )(params)
                updates, opt_state = tx.update(grads, opt_state)
                return optax.apply_updates(params, updates), opt_state, loss

            timing = profiling.time_steps(hstep, params, opt_state,
                                          steps=args.steps)
        eps = ge / timing.per_step_s
        if base_h is None:
            base_h, t1_halo = eps, timing.per_step_s
        mode_b[d] = {
            "edges_per_s": eps,
            "efficiency_vs_linear": eps / (d * base_h),
            "comm_bytes_per_step": acct["train_step_bytes_per_chip"],
            "halo_rows_node": acct["node_halo_rows"],
            "halo_rows_edge": acct["edge_halo_rows"],
        }
        log(f"  {d} devices: {eps:,.0f} edges/s, eff "
            f"{mode_b[d]['efficiency_vs_linear']:.2%}, "
            f"{acct['train_step_bytes_per_chip']/1e6:.2f} MB/step/chip")
    results["lggnn"]["halo_giant_graph"] = {
        "nodes": Vg, "dir_edges": ge, "devices": mode_b}

    # === (c) psum fallback: replicated state + (V, F) all-reduces =======
    log("LGGNN train step, psum-replicated fallback:")
    mode_c = {}
    base_ps = t1_ps = None
    pbig = graphs_lib.make_packed_batch(
        records,
        node_capacity=((tot_v + 63) // 64) * 64,
        edge_capacity=((tot_e + 63) // 64) * 64,
        task=0,
    )
    for d in counts:
        if pbig.src.shape[0] % d:
            continue
        mesh = Mesh(np.array(jax.devices()[:d]).reshape(1, d), ("data", "edge"))
        model = packed.PackedLGGNN(n_features=H, n_layers=L, J=1, order=2)
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
            base_ps, t1_ps = eps, timing.per_step_s
        mode_c[d] = {
            "edges_per_s": eps,
            "efficiency_vs_linear": eps / (d * base_ps),
            "comm_bytes_per_step": acct["train_step_bytes_per_chip"],
            "allreduces_fwd": acct["n_allreduce_fwd"],
        }
        log(f"  {d} devices: {eps:,.0f} edges/s, eff "
            f"{mode_c[d]['efficiency_vs_linear']:.2%}, "
            f"{acct['train_step_bytes_per_chip']/1e6:.1f} MB/step/chip "
            f"({acct['n_allreduce_fwd']} fwd all-reduces)")
    results["lggnn"]["psum_fallback"] = {"devices": mode_c}

    # === bare edge-partitioned SpMM (kept for op-level reference) =======
    V, F = args.nodes, args.features
    E = V * args.avg_degree
    src = np.sort(rng.integers(0, V, E)).astype(np.int32)
    dst = rng.integers(0, V, E).astype(np.int32)
    w = rng.random(E).astype(np.float32)
    x = rng.standard_normal((V, F)).astype(np.float32)
    results["bare_spmm"] = {"edges": E, "nodes": V, "features": F,
                            "devices": {}}
    base = None
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
        results["bare_spmm"]["devices"][d] = {
            "edges_per_s": eps,
            "efficiency_vs_linear": eps / (d * base),
        }

    # === projection: no-overlap efficiency bound from comm arithmetic ===
    # eff(d) >= (t1/d) / (t1/d + comm_bytes(d)/BW); t1 measured on THIS
    # backend, so the projection is meaningful on --tpu runs and
    # shape-indicative on CPU runs (comm bytes are exact either way).
    def project(t1, per_dev):
        out = {}
        for d, row in per_dev.items():
            if d == 1 or t1 is None:
                continue
            compute = t1 / d
            comm = row["comm_bytes_per_step"] / bw
            out[d] = {
                "compute_s": compute,
                "comm_s": comm,
                "projected_efficiency_lower_bound": compute / (compute + comm),
            }
        return out

    if prior is not None:
        # re-anchor the prior run's exact comm-byte rows on this backend's
        # measured single-device step times (the real-chip path)
        def rows_of(mode):
            dev = prior["lggnn"].get(mode, {}).get("devices", {})
            return {int(k): v for k, v in dev.items()}

        mode_a, mode_b, mode_c = (rows_of("molecule_aligned"),
                                  rows_of("halo_giant_graph"),
                                  rows_of("psum_fallback"))
        mode_h = rows_of("hybrid_dp_x_edge")
        prior["t1_this_backend_s"] = {
            "molecule_aligned": t1_mol, "halo_giant_graph": t1_halo,
            "psum_fallback": t1_ps,
            "device": str(jax.devices()[0]),
        }
        prior["assumed_ici_bytes_per_s"] = bw
        results = prior

    results["projection"] = {
        "molecule_aligned": project(t1_mol, mode_a),
        # hybrid shards the same molecules over the same total device
        # count, so t1 is the same measured single-device step
        "hybrid_dp_x_edge": project(t1_mol, mode_h),
        "halo_giant_graph": project(t1_halo, mode_b),
        "psum_fallback": project(t1_ps, mode_c),
        "note": "no-overlap bound: eff >= (t1/d)/(t1/d + bytes/BW); "
                "t1 = measured 1-device step time on this backend",
    }
    for mode in ("molecule_aligned", "hybrid_dp_x_edge",
                 "halo_giant_graph", "psum_fallback"):
        proj = results["projection"][mode]
        if proj:
            dmax = max(proj)
            log(f"projection {mode} @{dmax} devices: eff >= "
                f"{proj[dmax]['projected_efficiency_lower_bound']:.1%}")

    with open("BENCH_SCALING.json", "w") as fjson:
        json.dump(results, fjson, indent=2, default=float)
        fjson.write("\n")
    log("wrote BENCH_SCALING.json")


if __name__ == "__main__":
    main()
