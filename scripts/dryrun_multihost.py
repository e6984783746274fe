#!/usr/bin/env python
"""Multi-host dry run: N real OS processes, one global mesh, BOTH
shipped training modes.

Parent mode (default) picks a free port and launches N child processes;
each child gets 4 virtual CPU devices, joins the distributed runtime via
hgnn2_tpu.parallel.multihost.setup_distributed, and runs:

  1. DP training: per-process record shards, jitted LGGNN train steps over
     the GLOBAL ('data',) mesh — gradients cross process boundaries
     through XLA collectives exactly as they would cross DCN on a real
     multi-host slice.
  2. Molecule-aligned edge-sharded training (the headline >=99.9%-scaling
     mode, cli --edge_shards): the global batch is partitioned into one
     shard per GLOBAL device, each process feeds its local shard rows via
     make_array_from_process_local_data, and full PackedLGGNN train steps
     run under shard_map over the global ('edge',) mesh — BN statistics
     and loss psums cross the process boundary.

  3. HYBRID (data x edge) training across the process boundary: a global
     (data=P, edge=L) mesh where the 'data' axis spans processes (DCN)
     and the 'edge' axis stays within each process (ICI) — the composed
     --dp M --edge_shards N program in the pod regime SURVEY 2.3 names.
     Each child also runs the same step-fn on a LOCAL (1, 1) mesh over
     the full batch and asserts the hybrid loss equals that single-device
     control to 1e-4 relative.

The parent asserts every process reports the same finite loss for each
phase.

  python scripts/dryrun_multihost.py [--processes 2] [--steps 2]
"""

import argparse
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def child(args):
    from hgnn2_tpu import runtime

    runtime.force_cpu(args.local_devices)
    from hgnn2_tpu.parallel import multihost

    multihost.setup_distributed(
        coordinator_address=args.coordinator,
        num_processes=args.processes,
        process_id=args.child,
    )
    import jax
    import jax.numpy as jnp
    import optax

    from hgnn2_tpu import graphs
    from hgnn2_tpu.data import qm9
    from hgnn2_tpu.nn import models

    assert jax.process_count() == args.processes
    n_global = args.processes * args.local_devices
    assert len(jax.devices()) == n_global

    per_proc = 16
    records = qm9.synthetic_qm9_like(per_proc * args.processes, seed=0)
    local = multihost.shard_records(records)
    batch = graphs.make_dense_batch(
        local, n_max=32, with_line_graph=True, batch_size=per_proc, task=0
    )
    mesh = multihost.global_mesh(("data",))
    gbatch = multihost.make_global_batch(mesh, batch)

    model = models.GNNLineGraph(n_features=2, n_layers=3, J=1, order=2)
    variables = model.init(jax.random.key(0), batch, train=True)
    params = multihost.replicate_to_mesh(mesh, variables["params"])
    bstats = multihost.replicate_to_mesh(mesh, variables["batch_stats"])
    tx = optax.adamax(1e-3)
    opt_state = multihost.replicate_to_mesh(mesh, tx.init(variables["params"]))

    @jax.jit
    def step(params, bstats, opt_state, b):
        def loss_fn(p):
            out, upd = model.apply(
                {"params": p, "batch_stats": bstats}, b, train=True,
                mutable=["batch_stats"],
            )
            gm = (b.n_nodes > 0).astype(jnp.float32)
            loss = (((out[:, 0] - b.y) ** 2) * gm).sum() / gm.sum()
            return loss, upd["batch_stats"]

        (loss, bstats2), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), bstats2, opt_state, loss

    loss = None
    for _ in range(args.steps):
        params, bstats, opt_state, loss = step(params, bstats, opt_state, gbatch)
    print(f"MHLOSS proc={args.child} loss={float(loss):.6f}", flush=True)

    # --- phase 2: molecule-aligned edge-sharded PackedLGGNN training over
    # the global ('edge',) mesh — the headline sharding mode across real
    # processes (BN-stat + loss psums ride the process boundary)
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from hgnn2_tpu.nn import packed
    from hgnn2_tpu.parallel import spmd
    from hgnn2_tpu.training import sharded as sharded_lib

    n_global = jax.device_count()
    emesh = multihost.global_mesh(("edge",))
    recs2 = qm9.synthetic_qm9_like(8 * n_global, seed=1)
    # every process computes the SAME global partition deterministically,
    # then feeds only its local devices' shard rows
    parts = spmd.partition_records(recs2, n_global)
    vcap = max(sum(r.n_nodes for r in s) for s in parts)
    ecap = max(sum(r.n_dir_edges for r in s) for s in parts)
    gcap = max(len(s) for s in parts)
    stacked_all = spmd.make_packed_shards(
        recs2, n_global, node_capacity=vcap, edge_capacity=ecap,
        graphs_per_shard=gcap, task=0, parts=parts)
    lo = args.child * args.local_devices
    hi = lo + args.local_devices
    esharding = NamedSharding(emesh, P("edge"))
    stacked = jax.tree_util.tree_map(
        lambda v: jax.make_array_from_process_local_data(
            esharding, np.asarray(v)[lo:hi]),
        stacked_all,
    )

    pmodel = packed.PackedLGGNN(n_features=2, n_layers=3, J=1, order=2,
                                bn_axis="edge")
    sample_local = jax.tree_util.tree_map(
        lambda v: jnp.asarray(np.asarray(v)[0]), stacked_all)
    evars = pmodel.clone(bn_axis=None).init(
        jax.random.key(1), sample_local, train=True)
    eparams = multihost.replicate_to_mesh(emesh, evars["params"])
    ebstats = multihost.replicate_to_mesh(emesh, evars["batch_stats"])
    etx = optax.sgd(1e-5)
    eopt = multihost.replicate_to_mesh(emesh, etx.init(evars["params"]))
    etrain, _ = sharded_lib.make_sharded_step_fns(
        pmodel, emesh, etx, kind="regression", mean=0.0, std=1.0)
    eloss = None
    for _ in range(args.steps):
        eparams, ebstats, eopt, emets = etrain(eparams, ebstats, eopt, stacked)
        eloss = emets["loss"]
    print(f"MHESLOSS proc={args.child} loss={float(eloss):.6f}", flush=True)

    # --- phase 3: the HYBRID (data x edge) mesh across real processes —
    # the pod regime SURVEY §2.3 names: batch-level DP across hosts (the
    # 'data' axis spans the process boundary / DCN) composed with
    # molecule-aligned edge sharding within each host (the 'edge' axis
    # stays on a host's local devices / ICI). Same composed program the
    # cli builds for --dp M --edge_shards N, here over 2 real processes.
    # Each child also runs the identical step on a LOCAL (1, 1) mesh over
    # the full batch — the single-device control — and asserts the hybrid
    # loss matches it, so the cross-process collectives are checked
    # against ground truth, not just for lockstep.
    n_data, n_edge = args.processes, args.local_devices
    hmesh = multihost.global_mesh(("data", "edge"), shape=(n_data, n_edge))
    recs3 = qm9.synthetic_qm9_like(6 * n_global, seed=2)
    hgroups = spmd.partition_records(recs3, n_data)
    hparts = [spmd.partition_records(g, n_edge) for g in hgroups]
    vcap3 = max(sum(r.n_nodes for r in s) for p in hparts for s in p)
    ecap3 = max(sum(r.n_dir_edges for r in s) for p in hparts for s in p)
    gcap3 = max(len(s) for p in hparts for s in p)
    rows = [spmd.make_packed_shards(
        g, n_edge, node_capacity=vcap3, edge_capacity=ecap3,
        graphs_per_shard=gcap3, task=0, parts=p)
        for g, p in zip(hgroups, hparts)]
    hstacked_all = jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *rows)
    hsharding = NamedSharding(hmesh, P("data", "edge"))
    # 'data' rows live one-per-process; each process feeds only its row
    hstacked = jax.tree_util.tree_map(
        lambda v: jax.make_array_from_process_local_data(
            hsharding, v[args.child : args.child + 1]),
        hstacked_all,
    )

    hmodel = packed.PackedLGGNN(n_features=2, n_layers=3, J=1, order=2,
                                bn_axis=("data", "edge"))
    hsample = jax.tree_util.tree_map(lambda v: jnp.asarray(v[0, 0]),
                                     hstacked_all)
    hvars = hmodel.clone(bn_axis=None).init(
        jax.random.key(2), hsample, train=True)
    htx = optax.sgd(1e-5)
    hparams = multihost.replicate_to_mesh(hmesh, hvars["params"])
    hbstats = multihost.replicate_to_mesh(hmesh, hvars["batch_stats"])
    hopt = multihost.replicate_to_mesh(hmesh, htx.init(hvars["params"]))
    htrain, _ = sharded_lib.make_sharded_step_fns(
        hmodel, hmesh, htx, kind="regression", mean=0.0, std=1.0,
        axes=("data", "edge"))
    hloss = None
    for _ in range(args.steps):
        hparams, hbstats, hopt, hmets = htrain(hparams, hbstats, hopt,
                                               hstacked)
        hloss = hmets["loss"]

    # single-device control: one LOCAL (1, 1) mesh, the whole batch as one
    # shard, the exact same step-fn builder — psums over singleton axes
    # are identities, so this is the unsharded ground truth
    from jax.sharding import Mesh

    cmesh = Mesh(np.array(jax.local_devices()[:1]).reshape(1, 1),
                 ("data", "edge"))
    call = spmd.make_packed_shards(
        recs3, 1, node_capacity=sum(r.n_nodes for r in recs3),
        edge_capacity=sum(r.n_dir_edges for r in recs3),
        graphs_per_shard=len(recs3), task=0)
    cstacked = jax.tree_util.tree_map(
        lambda v: jax.device_put(
            np.asarray(v)[None],
            NamedSharding(cmesh, P("data", "edge"))),
        call)
    cparams = jax.tree_util.tree_map(np.asarray, hvars["params"])
    cbstats = jax.tree_util.tree_map(np.asarray, hvars["batch_stats"])
    copt = htx.init(cparams)
    ctrain, _ = sharded_lib.make_sharded_step_fns(
        hmodel, cmesh, htx, kind="regression", mean=0.0, std=1.0,
        axes=("data", "edge"))
    closs = None
    for _ in range(args.steps):
        cparams, cbstats, copt, cmets = ctrain(cparams, cbstats, copt,
                                               cstacked)
        closs = cmets["loss"]
    hl, cl = float(hloss), float(closs)
    assert np.isfinite(hl) and np.isfinite(cl), (hl, cl)
    assert abs(hl - cl) <= 1e-4 * max(1.0, abs(cl)), (
        f"hybrid-across-processes loss {hl} != single-device control {cl}")
    print(f"MHHYLOSS proc={args.child} loss={hl:.6f}", flush=True)


def parent(args):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    procs = []
    for pid in range(args.processes):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--child", str(pid),
             "--coordinator", f"localhost:{port}",
             "--processes", str(args.processes),
             "--local_devices", str(args.local_devices),
             "--steps", str(args.steps)],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        ))
    losses = {"MHLOSS": [], "MHESLOSS": [], "MHHYLOSS": []}
    for pid, p in enumerate(procs):
        out, err = p.communicate(timeout=300)
        if p.returncode != 0:
            sys.stderr.write(err[-4000:])
            raise SystemExit(f"child {pid} failed rc={p.returncode}")
        for line in out.splitlines():
            key = line.split(" ")[0]
            if key in losses:
                losses[key].append(float(line.split("loss=")[1]))
                print(line)
    for key, vals in losses.items():
        assert len(vals) == args.processes, (key, vals)
        assert all(abs(v - vals[0]) < 1e-6 for v in vals), (key, vals)
    print(f"dryrun_multihost ok: {args.processes} processes x "
          f"{args.local_devices} devices, dp_loss={losses['MHLOSS'][0]:.6f} "
          f"edge_sharded_loss={losses['MHESLOSS'][0]:.6f} "
          f"hybrid_dpxedge_loss={losses['MHHYLOSS'][0]:.6f}"
          " (hybrid == its single-device control, asserted in-child)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--processes", type=int, default=2)
    ap.add_argument("--local_devices", type=int, default=4)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--child", type=int, default=None)
    ap.add_argument("--coordinator", type=str, default=None)
    args = ap.parse_args()
    if args.child is not None:
        child(args)
    else:
        parent(args)


if __name__ == "__main__":
    main()
