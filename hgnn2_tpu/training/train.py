"""Training/eval engine: jitted steps over bucketed batches.

Replaces the reference train/eval loops (scripts/train_mnb.py:25,
test_mnb.py:25, train_ccn.py:24, test_ccn.py:23 — per-batch Python with
host->device transfers every batch) with jit-compiled train/eval steps,
compiled once per bucket shape and reused across the whole run.

Losses follow the reference: MSE on mean/std-normalized targets for QM9
regression (train_mnb.py:50-53), cross-entropy on 2 logits for the
synthetic classification task (main_generate.py:138-147, signalled there by
mean == 0). Metrics: MAE on the normalized scale and error ratio =
MAE / chemical accuracy (main_gnn_qm9.py:231).
"""

from __future__ import annotations

import functools
import logging
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import core, struct

from hgnn2_tpu.training import metrics as metrics_lib
from hgnn2_tpu.training.config import TrainConfig
from hgnn2_tpu.training.optim import build_optimizer
from hgnn2_tpu.training.prefetch import prefetch
from hgnn2_tpu.training.preemption import GracefulShutdown


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: core.FrozenDict
    batch_stats: core.FrozenDict
    opt_state: Any
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, model, sample_batch, tx, rng):
        variables = jax.jit(model.init, static_argnames="train")(
            rng, sample_batch, train=True
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", core.freeze({}))
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            apply_fn=model.apply,
            tx=tx,
        )


def _graph_mask(batch) -> jnp.ndarray:
    if hasattr(batch, "gmask"):
        return batch.gmask
    return (batch.n_nodes > 0).astype(jnp.float32)


def _forward(state, params, batch, train: bool):
    """Model apply handling the presence/absence of batch stats."""
    has_bn = bool(state.batch_stats)
    variables = {"params": params}
    if has_bn:
        variables["batch_stats"] = state.batch_stats
        if train:
            out, updates = state.apply_fn(
                variables, batch, train=True, mutable=["batch_stats"]
            )
            return out, updates["batch_stats"]
        return state.apply_fn(variables, batch, train=False), state.batch_stats
    return state.apply_fn(variables, batch, train=train), state.batch_stats


def _loss_and_metrics(out, y, gmask, kind: str, mean: float, std: float):
    denom = jnp.maximum(gmask.sum(), 1.0)
    if kind == "classification":
        logits = out
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
        loss = (ce * gmask).sum() / denom
        acc = ((jnp.argmax(logits, -1) == y) * gmask).sum() / denom
        return loss, {"loss": loss, "accuracy": acc}
    pred = out[:, 0]
    t = (y - mean) / (std + 1e-8)
    err = pred - t
    loss = ((err**2) * gmask).sum() / denom
    mae = (jnp.abs(err) * gmask).sum() / denom
    return loss, {"loss": loss, "mae": mae}


def _train_body(state: TrainState, batch, kind: str, mean: float, std: float):
    """One optimizer step: the shared body of make_train_step /
    make_multi_train_step / make_scanned_epoch."""
    gmask = _graph_mask(batch)

    def loss_fn(params):
        out, new_stats = _forward(state, params, batch, train=True)
        loss, mets = _loss_and_metrics(out, batch.y, gmask, kind, mean, std)
        return loss, (mets, new_stats)

    grads, (mets, new_stats) = jax.grad(loss_fn, has_aux=True)(state.params)
    updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = state.replace(
        step=state.step + 1,
        params=new_params,
        batch_stats=new_stats,
        opt_state=new_opt,
    )
    return new_state, mets


def make_train_step(kind: str = "regression", mean: float = 0.0, std: float = 1.0):
    """Returns a jitted train step (state, batch) -> (state, metrics)."""

    @jax.jit
    def step(state: TrainState, batch):
        return _train_body(state, batch, kind, mean, std)

    return step


def make_scanned_epoch(kind: str = "regression", mean: float = 0.0,
                       std: float = 1.0):
    """Returns run(state, stacked, order) -> (state, metric SUMS weighted by
    real-graph count, plus 'count'): a whole same-shape batch group's
    optimizer steps inside ONE jitted lax.scan.

    On a remote-attached chip, per-step dispatch latency dominates
    sub-millisecond steps; scanning the epoch leaves only one dispatch per
    bucket group per epoch. `stacked` is a pytree of batches stacked on a
    new leading axis (device-resident, from CachedLoader); `order` is the
    epoch's batch permutation, so shuffling costs one small transfer.

    Metrics are returned as count-weighted sums (count = real graphs per
    batch) so a padded remainder batch with 3 real graphs does not weigh
    as much as a full one — mirroring evaluate_scanned's 'count' logic.
    Gradient steps are per-batch means either way (reference semantics)."""

    @jax.jit
    def run(state: TrainState, stacked, order):
        def body(s, i):
            batch = jax.tree_util.tree_map(lambda x: x[i], stacked)
            s2, mets = _train_body(s, batch, kind, mean, std)
            mets["count"] = _graph_mask(batch).sum()
            return s2, mets

        state2, mets = jax.lax.scan(body, state, order)
        count = mets.pop("count")
        sums = jax.tree_util.tree_map(lambda m: (m * count).sum(), mets)
        sums["count"] = count.sum()
        return state2, sums

    return run


def make_multi_train_step(
    kind: str = "regression", mean: float = 0.0, std: float = 1.0, n_inner: int = 10
):
    """Train step that advances n_inner optimizer steps inside ONE jitted
    program via lax.scan (same batch each inner step). Used by benchmarks
    to amortize host dispatch latency, and useful on high-latency links."""

    @jax.jit
    def multi_step(state: TrainState, batch):
        def scan_body(s, _):
            return _train_body(s, batch, kind, mean, std)

        state, mets = jax.lax.scan(scan_body, state, None, length=n_inner)
        return state, jax.tree_util.tree_map(lambda m: m[-1], mets)

    return multi_step


def make_eval_step(kind: str = "regression", mean: float = 0.0, std: float = 1.0):
    @jax.jit
    def step(state: TrainState, batch):
        gmask = _graph_mask(batch)
        out, _ = _forward(state, state.params, batch, train=False)
        _, mets = _loss_and_metrics(out, batch.y, gmask, kind, mean, std)
        mets["count"] = gmask.sum()
        return mets

    return step


def group_stacked_batches(batches, mesh=None):
    """Group same-shape batches (bucket groups) and stack each group on a
    new leading axis, device-resident, in first-appearance order.

    mesh: when given, each stacked array is laid out with its BATCH axis
    (axis 1 — every batch leaf leads with the batch dimension) sharded
    over the mesh's 'data' axis, so a scanned epoch keeps exactly the
    per-step DP sharding: lax.scan's index-select propagates the
    (None, 'data', ...) spec to each step's batch.

    Ordering semantics: the scanned sequence runs each group contiguously,
    so it reproduces the loader's exact order only when same-shape batches
    are already contiguous there (true for sorted dense bucketing — the
    default). When buckets interleave (lggnn edge buckets can), scanning
    is a reordering of the epoch — run_epoch_scanned shuffles GROUP order
    per epoch as well, so no group is systematically last."""
    groups: dict = {}
    for b in batches:
        key = tuple(
            (tuple(leaf.shape), str(leaf.dtype))
            for leaf in jax.tree_util.tree_leaves(b)
        )
        groups.setdefault(key, []).append(b)

    def stack(*xs):
        out = jnp.stack(xs)
        if mesh is not None and out.ndim >= 2:
            from jax.sharding import NamedSharding, PartitionSpec as P

            # Axis 1 is assumed to be the batch dimension (every dense-batch
            # leaf leads with it). A leaf whose axis 1 is not divisible by
            # the data-axis size would be silently mis-sharded inside jit —
            # replicate it instead (correct for any leaf; DP batch leaves
            # are always divisible because the loader pads to batch_size).
            ndata = mesh.shape["data"]
            if out.shape[1] % ndata == 0:
                out = jax.device_put(
                    out, NamedSharding(mesh, P(None, "data"))
                )
            else:
                out = jax.device_put(out, NamedSharding(mesh, P()))
        return out

    return [jax.tree_util.tree_map(stack, *g) for g in groups.values()]


def run_epoch_scanned(state, groups, scan_fn, rng=None):
    """One training epoch as one compiled program per bucket group
    (make_scanned_epoch): a handful of dispatches per epoch instead of one
    per step. rng (numpy Generator) shuffles batch order within each group
    AND the group execution order, so no bucket is systematically trained
    last epoch after epoch; rng=None keeps first-appearance group order
    with identity permutations (deterministic).

    Epoch metrics are means weighted by real-graph count (the scanned fns
    return count-weighted sums), matching evaluate()'s weighting — a padded
    remainder batch contributes proportionally to its real graphs."""
    sums: dict = {}
    total = None
    group_order = np.arange(len(groups))
    if rng is not None:
        rng.shuffle(group_order)
    for g in group_order:
        stacked = groups[g]
        n = jax.tree_util.tree_leaves(stacked)[0].shape[0]
        order = np.arange(n) if rng is None else rng.permutation(n)
        state, mets = scan_fn(state, stacked, jnp.asarray(order))
        count = mets.pop("count")
        total = count if total is None else total + count
        for k, v in mets.items():
            sums[k] = sums.get(k, 0.0) + v
    if total is None:
        return state, {}
    # ONE host fetch for all epoch metrics (a fetch costs a full tunnel
    # round trip on remote-attached chips; per-metric float()s would pay
    # it len(sums)+1 times per epoch)
    sums, total = jax.device_get((sums, total))
    denom = max(float(total), 1.0)
    return state, {k: float(v) / denom for k, v in sums.items()}


def make_scanned_eval(kind: str = "regression", mean: float = 0.0,
                      std: float = 1.0):
    """Returns run(state, stacked) -> per-batch metric arrays (incl.
    'count'): a whole eval bucket group in one dispatch."""

    @jax.jit
    def run(state: TrainState, stacked):
        n = jax.tree_util.tree_leaves(stacked)[0].shape[0]

        def body(_, i):
            batch = jax.tree_util.tree_map(lambda x: x[i], stacked)
            gmask = _graph_mask(batch)
            out, _ = _forward(state, state.params, batch, train=False)
            _, mets = _loss_and_metrics(out, batch.y, gmask, kind, mean, std)
            mets["count"] = gmask.sum()
            return 0, mets

        _, mets = jax.lax.scan(body, 0, jnp.arange(n))
        return mets

    return run


def evaluate_scanned(state, groups, scan_eval_fn):
    """evaluate() over pre-stacked bucket groups: one dispatch per group,
    ONE host fetch for all groups' metrics (remote-chip RTTs)."""
    per_group = [scan_eval_fn(state, stacked) for stacked in groups]
    per_group = jax.device_get(per_group)
    sums: dict = {}
    total = 0.0
    for mets in per_group:
        mets = {k: np.asarray(v) for k, v in mets.items()}
        n = mets.pop("count")
        total += float(n.sum())
        for k, v in mets.items():
            sums[k] = sums.get(k, 0.0) + float((v * n).sum())
    return {k: v / max(total, 1.0) for k, v in sums.items()}


def run_epoch(state, loader, step_fn, prefetch_size: int = 2):
    """One training epoch. Metrics stay on device until the epoch ends —
    a float() per step would force a host sync that serializes dispatch
    (costly over high-latency device links); one block per epoch instead.

    Epoch metrics are weighted by each batch's real-graph count (same
    semantics as run_epoch_scanned and evaluate): a padded remainder batch
    counts only its real graphs. The counts stay on device too."""
    device_mets: list = []
    device_counts: list = []
    for batch in prefetch(loader, size=prefetch_size):
        state, mets = step_fn(state, batch)
        device_mets.append(mets)
        device_counts.append(_graph_mask(batch).sum())
    if not device_mets:
        return state, {}
    counts = jnp.stack(device_counts)
    total = jnp.maximum(counts.sum(), 1.0)
    stacked = jax.tree_util.tree_map(
        lambda *xs: (jnp.stack(xs) * counts).sum() / total, *device_mets
    )
    # one host fetch for the whole epoch's metrics (remote-chip RTTs)
    stacked = jax.device_get(stacked)
    return state, {k: float(v) for k, v in stacked.items()}


def evaluate(state, loader, eval_fn):
    sums: dict[str, float] = {}
    total = 0.0
    for batch in loader:
        mets = eval_fn(state, batch)
        n = float(mets.pop("count"))
        total += n
        for k, v in mets.items():
            sums[k] = sums.get(k, 0.0) + float(v) * n
    return {k: v / max(total, 1.0) for k, v in sums.items()}


def make_bn_recalibration(momentum: float = 0.1):
    """Returns run(state, stacked) -> (stat_sums, n_batches): one compiled
    pass over a stacked bucket group collecting each batch's OWN BN
    statistics (see recalibrate_bn)."""
    scale = 1.0 / (1.0 - momentum)

    @jax.jit
    def run(state: TrainState, stacked):
        n = jax.tree_util.tree_leaves(stacked)[0].shape[0]
        zeros = jax.tree_util.tree_map(jnp.zeros_like, state.batch_stats)
        zstate = state.replace(batch_stats=zeros)

        def body(carry, i):
            batch = jax.tree_util.tree_map(lambda x: x[i], stacked)
            # with running stats zeroed, the EMA update
            # new = (1-m)*batch + m*0 returns (1-m)*batch_stat exactly
            _, upd = _forward(zstate, state.params, batch, train=True)
            carry = jax.tree_util.tree_map(
                lambda c, u: c + u * scale, carry, upd)
            return carry, None

        sums, _ = jax.lax.scan(body, zeros, jnp.arange(n))
        return sums, n

    return run


def recalibrate_bn(state: TrainState, groups=None, loader=None,
                   momentum: float = 0.1) -> TrainState:
    """Replaces the BN running statistics with the AVERAGE of every train
    batch's own statistics.

    The reference's running-stat update (batch_normalization.py:37-38,
    running <- (1-momentum)*batch + momentum*running with momentum=0.1) is
    an EMA that puts 90% of its weight on the LAST batch seen — so
    eval-mode normalization is essentially one batch's statistics, making
    eval metrics swing with whichever batch a shuffled epoch ended on.
    This pass removes that dependence the standard way (BN re-estimation,
    as used after stochastic weight averaging): one train-mode forward
    pass per batch, each batch's own mean/std recovered from the EMA
    update (divide by 1-momentum against zeroed stats), averaged
    uniformly across batches.

    Measured effect on the synthetic regression (runs/
    validation_reg_gnn_recal vs _reg_gnn): ~neutral on the val error
    ratio (10.1 vs 9.7) — fixed statistics of ANY kind sit at ~10 there
    while per-batch adaptive (train-mode) statistics reach 3.9, i.e. the
    val multiple the diagnosis found is BN batch-ADAPTIVITY, not stale
    stats (runs/validation_reg_gnn_control/diagnosis.json). The value of
    this pass is determinism/stability of eval, not accuracy.

    groups: stacked bucket groups (the scanned-epoch layout) — one
    compiled scan per group; loader: any iterable of batches (stepwise
    path). Exactly one of the two must be given. No-op without BN state.
    """
    if not state.batch_stats:
        return state
    recal = make_bn_recalibration(momentum)
    totals = None
    count = 0
    if groups is not None:
        sources = groups
    else:
        # per-batch path: lift each batch to a 1-step stacked group so the
        # same compiled body serves both layouts
        sources = (jax.tree_util.tree_map(lambda x: x[None], b)
                   for b in loader)
    for stacked in sources:
        sums, n = recal(state, stacked)
        totals = (sums if totals is None else
                  jax.tree_util.tree_map(jnp.add, totals, sums))
        count += int(n)
    if totals is None or count == 0:
        return state
    new_stats = jax.tree_util.tree_map(lambda t: t / count, totals)
    return state.replace(batch_stats=new_stats)


def fit(
    model,
    make_loader,
    cfg: TrainConfig,
    kind: str = "regression",
    mean: float = 0.0,
    std: float = 1.0,
    accuracy: float | None = None,
    logger: metrics_lib.ExperimentLogger | None = None,
    checkpointer=None,
    mesh=None,
):
    """Full training run.

    make_loader(split) -> iterable of batches for split in
    {"train", "valid", "test"}; must yield at least one train batch.
    mesh: optional jax.sharding.Mesh for data parallelism — the loaders are
    expected to yield batches already sharded over its 'data' axis
    (parallel.spmd.ShardedLoader); state is replicated here and XLA inserts
    the gradient/BN collectives.
    """
    train_loader = make_loader("train")
    # built once — the reference rebuilds (and re-pads) its eval sets every
    # epoch (scripts/train_mnb.py:25-level loop structure); with CachedLoader
    # these stay device-resident across the whole run
    eval_loaders = {split: make_loader(split) for split in ("valid", "test")}
    steps_per_epoch = len(train_loader)
    tx = build_optimizer(cfg.optim, steps_per_epoch)
    if hasattr(train_loader, "peek_sample"):
        # peek WITHOUT starting an iteration: __iter__ advances the cached
        # loader's re-deal clock, which would shift the redeal_every
        # cadence by one epoch
        sample = train_loader.peek_sample()
    else:
        sample = next(iter(train_loader))
    state = TrainState.create(model, sample, tx, jax.random.key(cfg.seed))

    start_epoch = 0
    if checkpointer is not None and cfg.resume:
        restored = checkpointer.restore(state)
        if restored is not None:
            state, start_epoch = restored
    if mesh is not None:
        from hgnn2_tpu.parallel import spmd

        state = spmd.replicate(mesh, state)

    train_step = make_train_step(kind, mean, std)
    eval_step = make_eval_step(kind, mean, std)
    log = logging.getLogger("hgnn2_tpu")

    # scanned-epoch fast path: whole bucket groups of steps in one program
    # (cached device-resident batches; under a mesh the stacks keep the
    # batch axis sharded over 'data', so scanned DP == stepwise DP)
    scan_groups = scan_fn = None
    # order-level shuffling moves into the scan's permutation; honor the
    # cached loader's shuffle setting (off -> deterministic batch order)
    shuffle_rng = (np.random.default_rng(cfg.seed)
                   if getattr(train_loader, "shuffle", True) else None)
    eval_groups: dict = {}
    scan_eval_fn = None

    def build_train_groups():
        bs = train_loader.batches()
        g = group_stacked_batches(bs, mesh) if bs else None
        if hasattr(train_loader, "release"):
            train_loader.release()  # the stacks replace the per-batch cache
        return g

    if (getattr(cfg, "scan_epochs", False)
            and hasattr(train_loader, "batches")):
        scan_groups = build_train_groups()
        if scan_groups:
            scan_fn = make_scanned_epoch(kind, mean, std)
            scan_eval_fn = make_scanned_eval(kind, mean, std)
            for split, loader in eval_loaders.items():
                if loader is not None and hasattr(loader, "batches"):
                    split_bs = loader.batches()
                    if split_bs:
                        eval_groups[split] = group_stacked_batches(
                            split_bs, mesh)
                        if hasattr(loader, "release"):
                            loader.release()
            log.info("scanned epochs: %d bucket group(s)", len(scan_groups))
    log.info("training: %d epochs x %d steps/epoch", cfg.epochs - start_epoch, steps_per_epoch)
    run_err = metrics_lib.RunningAverage()
    run_loss = metrics_lib.RunningAverage()
    history = []
    with GracefulShutdown() as shutdown:
        for epoch in range(start_epoch, cfg.epochs):
            t0 = time.time()
            if cfg.optim.reset_each_epoch:
                state = state.replace(opt_state=state.tx.init(state.params))
            if scan_groups is not None:
                # periodic re-deal: rebuild + restack when the cached
                # loader says a fresh batch composition is due
                if (getattr(train_loader, "redeal_every", 0)
                        and train_loader.maybe_redeal()):
                    scan_groups = build_train_groups()
                    log.info("epoch %d: re-dealt batches into %d bucket "
                             "group(s)", epoch + 1, len(scan_groups))
                state, train_m = run_epoch_scanned(
                    state, scan_groups, scan_fn, shuffle_rng)
            else:
                state, train_m = run_epoch(state, train_loader, train_step)
            run_loss.update(train_m.get("loss", 0.0))
            if "mae" in train_m:
                run_err.update(train_m["mae"])
            row = {f"train_{k}": v for k, v in train_m.items()}
            if (epoch + 1) % cfg.eval_every == 0:
                for split in ("valid", "test"):
                    loader = eval_loaders[split]
                    if loader is None or len(loader) == 0:
                        continue
                    if split in eval_groups:
                        split_m = evaluate_scanned(
                            state, eval_groups[split], scan_eval_fn)
                    else:
                        split_m = evaluate(state, loader, eval_step)
                    for k, v in split_m.items():
                        row[f"{split}_{k}"] = v
                        if k == "mae" and accuracy:
                            row[f"{split}_error_ratio"] = v / accuracy
            row["epoch_time_s"] = time.time() - t0
            log.info("epoch %d done in %.1fs: %s", epoch + 1,
                     row["epoch_time_s"],
                     {k: round(v, 4) for k, v in row.items()
                      if k != "epoch_time_s"})
            if accuracy and "mae" in train_m:
                row["train_error_ratio"] = run_err.val / accuracy
            history.append(row)
            if logger is not None:
                logger.log_epoch(epoch + 1, **row)
            if checkpointer is not None:
                checkpointer.save(state, epoch + 1)
            if shutdown.requested:
                log.warning("stopping after epoch %d (signal); resume with "
                            "cfg.resume", epoch + 1)
                break
    if getattr(cfg, "bn_recalibrate", False) and state.batch_stats:
        state = recalibrate_bn(
            state,
            groups=scan_groups,
            loader=None if scan_groups is not None else train_loader,
        )
        row = dict(history[-1]) if history else {}
        for split in ("valid", "test"):
            loader = eval_loaders[split]
            if split in eval_groups:
                split_m = evaluate_scanned(
                    state, eval_groups[split], scan_eval_fn)
            elif loader is not None and len(loader) > 0:
                split_m = evaluate(state, loader, eval_step)
            else:
                continue
            for k, v in split_m.items():
                row[f"{split}_{k}"] = v
                if k == "mae" and accuracy:
                    row[f"{split}_error_ratio"] = v / accuracy
        row["bn_recalibrated"] = 1.0
        log.info("bn recalibrated over %d train batches: %s",
                 steps_per_epoch,
                 {k: round(v, 4) for k, v in row.items()
                  if k.startswith(("valid_", "test_"))})
        history.append(row)
        if logger is not None:
            logger.log_epoch(cfg.epochs + 1, **row)
    return state, history
