"""Molecule-aligned edge-sharded training — the headline scaling mode,
wired into the shipped trainer (cli --edge_shards N), composable with
batch-level data parallelism (cli --dp M --edge_shards N: one
(data=M, edge=N) mesh).

Molecules never span shards (parallel/spmd.py make_packed_shards), so every
graph-operator apply is fully local; the only collectives per step are the
BatchNorm statistics (two (F,) psums + a scalar per BN, reduced over BOTH
mesh axes under the hybrid), the loss/metric reductions, and the gradient
psum XLA inserts across the whole mesh — the configuration that can
actually reach the >=80% scaling north star (BENCH_SCALING.json
projection). This is SURVEY §2.3's target regime as one mesh program:
batch-level DP across pod hosts WITH edge/graph partitioning within. The
psum-replicated and halo bundles remain the fallbacks for graphs whose cut
cannot be emptied.

The reference has no distribution story at all (SURVEY §2.3); its closest
regime is the full-batch CCN run its SLURM flags gesture at but never
execute.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from hgnn2_tpu import graphs as graphs_lib
from hgnn2_tpu.parallel import spmd
from hgnn2_tpu.training import metrics as metrics_lib
from hgnn2_tpu.training.config import TrainConfig
from hgnn2_tpu.training.optim import build_optimizer
from hgnn2_tpu.training.preemption import GracefulShutdown

log = logging.getLogger("hgnn2_tpu")


@dataclasses.dataclass
class _ShardedLoaderBase:
    """Minibatches of graph-aligned stacked shards, built once
    (device-resident) with capacities static across the epoch so one
    compiled step serves every batch; batch ORDER reshuffles per epoch.
    Subclasses implement _build(chunks, parts) from the precomputed
    per-chunk shard partitions.

    n_data > 1 is the hybrid layout: each minibatch splits into n_data
    data-parallel groups, each of which splits into n_shards
    molecule-aligned shards — stacked to (n_data, n_shards, ...) and
    sharded P('data', 'edge'). With n_data == 1 the stacks keep the
    (n_shards, ...) single-axis layout."""

    records: Sequence
    batch_size: int
    n_shards: int
    task: int | None = None
    shuffle: bool = False
    seed: int = 0
    n_data: int = 1
    _batches: list = dataclasses.field(default_factory=list)
    _epoch: int = 0
    _n_batches: int = 0

    def __post_init__(self):
        recs = list(self.records)
        chunks = [recs[s : s + self.batch_size]
                  for s in range(0, len(recs), self.batch_size)]
        # parts: [chunk][data_group][shard] -> records; data groups and
        # shards are both edge-balanced greedy partitions
        if self.n_data > 1:
            groups = [spmd.partition_records(c, self.n_data) for c in chunks]
            parts = [[spmd.partition_records(g, self.n_shards) for g in grp]
                     for grp in groups]
        else:
            parts = [[spmd.partition_records(c, self.n_shards)]
                     for c in chunks]
        self._build(chunks, parts)

    def _stack_rows(self, rows):
        """(n_data, n_shards, ...) when hybrid; (n_shards, ...) otherwise."""
        if self.n_data > 1:
            return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *rows)
        return rows[0]

    def __len__(self):
        return len(self._batches) or self._n_batches

    def release(self):
        """Drop the per-batch arrays — the scanned-epoch path stacks them
        into ONE sharded array, so keeping both would double device
        memory. len()/epoch_order keep working via the recorded count;
        __iter__ is only used by the stepwise path, which never releases."""
        self._n_batches = len(self._batches)
        self._batches = []

    def peek_sample(self):
        """First stacked batch without consuming an epoch permutation."""
        return self._batches[0]

    def batches(self) -> list:
        """The stacked per-batch list, in deal order (empty after
        release()). The scanned path stacks these and then releases."""
        return self._batches

    def epoch_order(self):
        """This epoch's batch permutation (advances the epoch counter when
        shuffling). The scanned-epoch path feeds it to lax.scan so scanned
        and stepwise epochs traverse identical batch sequences."""
        order = np.arange(len(self))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
            self._epoch += 1
        return order

    def __iter__(self):
        for i in self.epoch_order():
            yield self._batches[i]


class ShardedPackedLoader(_ShardedLoaderBase):
    """Molecule-aligned packed shards for PackedGNN/PackedLGGNN."""

    def _build(self, chunks, parts):
        # static capacities: the worst per-shard load over all minibatches
        # and data groups (one compiled step serves every cell)
        vcap = ecap = gcap = 1
        for grp in parts:
            for part in grp:
                for shard in part:
                    vcap = max(vcap, sum(r.n_nodes for r in shard))
                    ecap = max(ecap, sum(r.n_dir_edges for r in shard))
                    gcap = max(gcap, len(shard))
        for chunk, grp in zip(chunks, parts):
            rows = [spmd.make_packed_shards(
                chunk, self.n_shards, node_capacity=vcap,
                edge_capacity=ecap, graphs_per_shard=gcap, task=self.task,
                parts=part,
            ) for part in grp]
            self._batches.append(self._stack_rows(rows))
        self.node_capacity, self.edge_capacity = vcap, ecap
        self.graphs_per_shard = gcap


class ShardedCCNLoader(_ShardedLoaderBase):
    """Vertex-sharded stacked CCN batches (molecules whole per shard)."""

    def _build(self, chunks, parts):
        from hgnn2_tpu.parallel import ccn_parallel

        k_max = max(r.max_degree() + 1 for r in self.records)
        vcap = gcap = 1
        for grp in parts:
            for part in grp:
                for shard in part:
                    vcap = max(vcap, sum(r.n_nodes for r in shard))
                    gcap = max(gcap, len(shard))
        for chunk, grp in zip(chunks, parts):
            rows = [ccn_parallel.make_ccn_shards(
                chunk, self.n_shards, k_max=k_max, vertex_capacity=vcap,
                graphs_per_shard=gcap, task=self.task, parts=part,
            ) for part in grp]
            self._batches.append(self._stack_rows(rows))


def _local_metric_sums(out, local, kind, mean, std, axes=("edge",)):
    """Per-shard masked (loss_sum, metric_sum) + count, psum'd globally
    over the given mesh axes. Shared by the packed and CCN step builders."""
    y, gmask = local.y, local.gmask
    if kind == "classification":
        per = optax.softmax_cross_entropy_with_integer_labels(out, y)
        hit = (jnp.argmax(out, -1) == y).astype(jnp.float32)
        num = jnp.stack([(per * gmask).sum(), (hit * gmask).sum()])
    else:
        t = (y - mean) / (std + 1e-8)
        err = out[..., 0] - t
        num = jnp.stack([((err**2) * gmask).sum(),
                         (jnp.abs(err) * gmask).sum()])
    den = gmask.sum()
    num, den = jax.lax.psum((num, den), axes)
    # den is the RAW real-graph count: it is reported as 'count' and weights
    # epoch means, so an all-padding stacked batch must contribute 0, not a
    # phantom 1. Division sites clamp locally (_metric_names / loss_fn).
    return num, den


def _metric_names(num, den, kind):
    den = jnp.maximum(den, 1.0)
    if kind == "classification":
        return {"loss": num[0] / den, "accuracy": num[1] / den}
    return {"loss": num[0] / den, "mae": num[1] / den}


def make_sharded_step_fns(model, mesh: Mesh, tx, kind: str = "regression",
                          mean: float = 0.0, std: float = 1.0,
                          axes: tuple = ("edge",)):
    """(train_step, eval_step) over stacked molecule-aligned shards.

    axes: mesh axes the stacked batches' leading axes are sharded over —
    ("edge",) for pure edge sharding over (S, ...) stacks, or
    ("data", "edge") for the hybrid (M, N, ...) layout (cli --dp M
    --edge_shards N). Loss/metric reductions and the model's BatchNorm
    statistics (bn_axis=axes) psum over every listed axis, so the math is
    identical to a single global batch regardless of the factorization.

    train_step(params, batch_stats, opt_state, stacked) ->
        (params, batch_stats, opt_state, metrics)
    eval_step(params, batch_stats, stacked) -> metrics (incl. 'count')
    """
    lead = len(axes)
    zero = (0,) * lead
    one = (1,) * lead
    spec = P(*axes)

    def local_metrics(out, local):
        return _local_metric_sums(out, local, kind, mean, std, axes)

    def local_train(variables, stacked):
        local = jax.tree_util.tree_map(lambda v: v[zero], stacked)
        out, upd = model.apply(variables, local, train=True,
                               mutable=["batch_stats"])
        num, den = local_metrics(out, local)
        loss = num[0] / jnp.maximum(den, 1.0)
        return (loss.reshape(one), (num.reshape(one + num.shape),
                                    den.reshape(one), upd["batch_stats"]))

    def local_eval(variables, stacked):
        local = jax.tree_util.tree_map(lambda v: v[zero], stacked)
        out = model.apply(variables, local, train=False)
        num, den = local_metrics(out, local)
        return num.reshape(one + num.shape), den.reshape(one)

    train_sm = shard_map(local_train, mesh=mesh, in_specs=(P(), spec),
                         out_specs=(spec, (spec, spec, P())),
                         check_rep=False)
    eval_sm = shard_map(local_eval, mesh=mesh, in_specs=(P(), spec),
                        out_specs=(spec, spec), check_rep=False)

    def names(num, den):
        return _metric_names(num, den, kind)

    @jax.jit
    def train_step(params, batch_stats, opt_state, stacked):
        def loss_fn(p):
            losses, aux = train_sm({"params": p, "batch_stats": batch_stats},
                                   stacked)
            return losses.mean(), aux

        grads, (num, den, new_stats) = jax.grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        mets = names(num[zero], den[zero])  # psum'd: every cell identical
        mets["count"] = den[zero]  # real graphs — for weighted epoch means
        return params, new_stats, opt_state, mets

    @jax.jit
    def eval_step(params, batch_stats, stacked):
        num, den = eval_sm({"params": params, "batch_stats": batch_stats},
                           stacked)
        mets = names(num[zero], den[zero])
        mets["count"] = den[zero]
        return mets

    return train_step, eval_step


def make_ccn_sharded_step_fns(model, mesh: Mesh, tx,
                              kind: str = "regression",
                              mean: float = 0.0, std: float = 1.0,
                              axes: tuple = ("edge",)):
    """(train_step, eval_step) over stacked vertex-sharded CCN batches.
    CCN models carry no batch statistics, so sharded execution is exactly
    single-chip math (chi gathers stay within a shard; only the loss and
    metric reductions cross shards — over every axis in `axes` under the
    hybrid layout). Signatures mirror make_sharded_step_fns (batch_stats
    is accepted and ignored)."""
    lead = len(axes)
    zero = (0,) * lead
    one = (1,) * lead
    spec = P(*axes)

    def local_fwd(variables, stacked, train):
        local = jax.tree_util.tree_map(lambda v: v[zero], stacked)
        out = model.apply(variables, local, train=train)
        num, den = _local_metric_sums(out, local, kind, mean, std, axes)
        loss = num[0] / jnp.maximum(den, 1.0)
        return loss.reshape(one), (num.reshape(one + num.shape),
                                   den.reshape(one))

    train_sm = shard_map(
        lambda v, s: local_fwd(v, s, True), mesh=mesh,
        in_specs=(P(), spec), out_specs=(spec, (spec, spec)),
        check_rep=False)
    eval_sm = shard_map(
        lambda v, s: local_fwd(v, s, False), mesh=mesh,
        in_specs=(P(), spec), out_specs=(spec, (spec, spec)),
        check_rep=False)

    def names(num, den):
        return _metric_names(num, den, kind)

    @jax.jit
    def train_step(params, batch_stats, opt_state, stacked):
        def loss_fn(p):
            losses, aux = train_sm({"params": p}, stacked)
            return losses.mean(), aux

        grads, (num, den) = jax.grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        mets = names(num[zero], den[zero])
        mets["count"] = den[zero]
        return params, batch_stats, opt_state, mets

    @jax.jit
    def eval_step(params, batch_stats, stacked):
        _, (num, den) = eval_sm({"params": params}, stacked)
        mets = names(num[zero], den[zero])
        mets["count"] = den[zero]
        return mets

    return train_step, eval_step


def make_sharded_scan_epoch(train_step, mesh: Mesh, axes: tuple):
    """Scanned epochs for the sharded trainer: a whole epoch's optimizer
    steps inside ONE lax.scan program (the DP trainer's scanned-epoch win
    applied to the edge-sharded and hybrid modes — one dispatch per epoch
    instead of one per step on remote-attached chips).

    Returns (stack_batches(batches) -> stacked_all, run(params, bstats,
    opt_state, stacked_all, order) -> (params, bstats, opt_state,
    count-weighted epoch metric means)). Sharded loaders use ONE static
    shape per run, so the whole epoch is a single group; the stack keeps
    the shard axes sharded via P(None, *axes)."""
    import functools

    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, P(None, *axes))

    # jit with out_shardings: XLA writes the stacked result directly in
    # the sharded layout (no unsharded intermediate on one device)
    @functools.partial(jax.jit, out_shardings=sharding)
    def _stack(*xs):
        return jnp.stack(xs)

    def stack_batches(batches):
        return jax.tree_util.tree_map(lambda *xs: _stack(*xs), *batches)

    @jax.jit
    def run(params, batch_stats, opt_state, stacked_all, order):
        def body(carry, i):
            p, b, o = carry
            batch = jax.tree_util.tree_map(lambda x: x[i], stacked_all)
            p, b, o, mets = train_step(p, b, o, batch)
            return (p, b, o), mets

        (params, batch_stats, opt_state), mets = jax.lax.scan(
            body, (params, batch_stats, opt_state), order)
        count = mets.pop("count")
        total = jnp.maximum(count.sum(), 1.0)
        means = jax.tree_util.tree_map(
            lambda m: (m * count).sum() / total, mets)
        return params, batch_stats, opt_state, means

    return stack_batches, run


def fit_sharded(model, cfg: TrainConfig, splits: dict, kind: str,
                mean: float = 0.0, std: float = 1.0,
                accuracy: float | None = None,
                logger: metrics_lib.ExperimentLogger | None = None,
                family: str = "packed"):
    """Training run over graph-aligned shards (cfg.edge_shards devices).

    family: "packed" (molecule-aligned edge sharding, PackedGNN/PackedLGGNN
    with bn_axis='edge' — or bn_axis=('data','edge') under the hybrid) or
    "ccn" (vertex sharding, CCN1D/CCN2D).
    splits: {"train": records, "valid": records, "test": records}.
    cfg.dp > 1 composes batch-level data parallelism with the edge
    sharding on one (data=dp, edge=edge_shards) mesh.
    Returns (variables, history) — same history schema as train.fit.
    """
    n_shards = cfg.edge_shards
    n_data = max(cfg.dp, 1)
    if n_data * n_shards > len(jax.devices()):
        raise ValueError(
            f"dp={n_data} x edge_shards={n_shards} exceeds the "
            f"{len(jax.devices())} available devices"
        )
    mesh = Mesh(
        np.array(jax.devices()[: n_data * n_shards]).reshape(
            n_data, n_shards
        ),
        ("data", "edge"),
    )
    axes = ("data", "edge") if n_data > 1 else ("edge",)
    task = cfg.data.task if kind == "regression" else None
    loader_cls = ShardedCCNLoader if family == "ccn" else ShardedPackedLoader
    loaders = {
        split: loader_cls(
            recs, cfg.batch_size, n_shards, task=task,
            shuffle=(split == "train"
                     and getattr(cfg.data, "shuffle_batches", True)),
            seed=cfg.seed, n_data=n_data,
        ) if recs else None
        for split, recs in splits.items()
    }
    train_loader = loaders["train"]
    tx = build_optimizer(cfg.optim, steps_per_epoch=len(train_loader))

    sample_local = jax.tree_util.tree_map(
        lambda v: v[(0,) * len(axes)], train_loader.peek_sample())
    # init outside the shard_map: packed models use the bn_axis-free twin
    # (identical params/stats structure); CCN models have no axis state
    init_model = model if family == "ccn" else model.clone(bn_axis=None)
    variables = init_model.init(jax.random.key(cfg.seed), sample_local,
                                train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)

    checkpointer = None
    start_epoch = 0
    if cfg.checkpoint_path:
        from hgnn2_tpu.training import checkpoint as ckpt_lib

        checkpointer = ckpt_lib.Checkpointer(cfg.checkpoint_path)
        if cfg.resume:
            template = {"params": params, "batch_stats": batch_stats,
                        "opt_state": opt_state}
            restored = checkpointer.restore_tree(template)
            if restored is not None:
                payload, start_epoch = restored
                # orbax restores committed to one device; re-replicate over
                # the mesh so the jitted steps accept them
                rep = jax.sharding.NamedSharding(mesh, P())
                params, batch_stats, opt_state = jax.tree_util.tree_map(
                    lambda x: jax.device_put(x, rep),
                    (payload["params"], payload["batch_stats"],
                     payload["opt_state"]))
                log.info("resumed edge-sharded training at epoch %d",
                         start_epoch)

    make_fns = (make_ccn_sharded_step_fns if family == "ccn"
                else make_sharded_step_fns)
    with GracefulShutdown() as shutdown, jax.sharding.set_mesh(mesh):
        train_step, eval_step = make_fns(
            model, mesh, tx, kind=kind, mean=mean, std=std, axes=axes)
        # scanned epochs (cfg.scan_epochs, the shipped default): one
        # lax.scan program per epoch over the stacked same-shape batches
        scan_stacked = scan_run = None
        if getattr(cfg, "scan_epochs", False) and train_loader.batches():
            stack_batches, scan_run = make_sharded_scan_epoch(
                train_step, mesh, axes)
            scan_stacked = stack_batches(train_loader.batches())
            train_loader.release()  # the stack replaces the per-batch cache
        history = []
        log.info(
            "edge-sharded training: %s, %d epochs x %d steps%s",
            (f"{n_data} dp x {n_shards} shards" if n_data > 1
             else f"{n_shards} shards"),
            cfg.epochs, len(train_loader),
            " (scanned epochs)" if scan_run is not None else "")
        for epoch in range(start_epoch, cfg.epochs):
            t0 = time.time()
            if scan_run is not None:
                order = train_loader.epoch_order()
                params, batch_stats, opt_state, epoch_mets = scan_run(
                    params, batch_stats, opt_state, scan_stacked,
                    jnp.asarray(order))
                epoch_mets = jax.device_get(epoch_mets)
            else:
                device_mets = []
                for stacked in train_loader:
                    params, batch_stats, opt_state, mets = train_step(
                        params, batch_stats, opt_state, stacked)
                    device_mets.append(mets)
                # count-weighted epoch means, ONE host fetch
                counts = jnp.stack([m["count"] for m in device_mets])
                total = jnp.maximum(counts.sum(), 1.0)
                epoch_mets = jax.device_get(jax.tree_util.tree_map(
                    lambda *xs: (jnp.stack(xs) * counts).sum() / total,
                    *[{k: v for k, v in m.items() if k != "count"}
                      for m in device_mets]))
            row = {f"train_{k}": float(v) for k, v in epoch_mets.items()}
            for split in ("valid", "test"):
                loader = loaders[split]
                if loader is None or (epoch + 1) % cfg.eval_every:
                    continue
                batch_mets = jax.device_get(
                    [eval_step(params, batch_stats, stacked)
                     for stacked in loader])
                sums, total = {}, 0.0
                for mets in batch_mets:
                    n = float(mets.pop("count"))
                    total += n
                    for k, v in mets.items():
                        sums[k] = sums.get(k, 0.0) + float(v) * n
                for k, v in sums.items():
                    row[f"{split}_{k}"] = v / max(total, 1.0)
                    if k == "mae" and accuracy:
                        row[f"{split}_error_ratio"] = row[f"{split}_{k}"] / accuracy
            row["epoch_time_s"] = time.time() - t0
            history.append(row)
            log.info("epoch %d done in %.1fs: %s", epoch + 1,
                     row["epoch_time_s"],
                     {k: round(v, 4) for k, v in row.items()
                      if k != "epoch_time_s"})
            if logger is not None:
                logger.log_epoch(epoch + 1, **row)
            if checkpointer is not None:
                checkpointer.save_tree(
                    {"params": params, "batch_stats": batch_stats,
                     "opt_state": opt_state}, epoch + 1)
            if shutdown.requested:
                log.warning("stopping after epoch %d (signal); resume with "
                            "cfg.resume", epoch + 1)
                break
    return {"params": params, "batch_stats": batch_stats}, history
