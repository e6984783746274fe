"""Training-engine tests: optimizer schedule, end-to-end learning on the
synthetic classification task, CCN regression smoke, checkpoint resume."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hgnn2_tpu.data import batching, qm9, synthetic
from hgnn2_tpu.nn import ccn as ccn_mod
from hgnn2_tpu.nn import models
from hgnn2_tpu.training import checkpoint as ckpt_lib
from hgnn2_tpu.training import optim as optim_lib
from hgnn2_tpu.training import train as train_lib
from hgnn2_tpu.training.config import OptimConfig, TrainConfig


def test_stepped_decay_schedule():
    sched = optim_lib.stepped_decay(1.0, 0.5, epoch_step=2, steps_per_epoch=10)
    assert sched(0) == 1.0
    assert sched(19) == 1.0  # epoch 1
    assert sched(20) == 0.5  # epoch 2
    assert sched(59) == 0.25  # epoch 5


def _fit_classification(arch: str, epochs=6, lr=3e-3, hidden=6, n_max=12):
    recs = synthetic.three_collinear_points(240, n_max=n_max, dim=4, p=0.5, c=0.4, seed=0)
    tr, va, te = synthetic.split_80_10_10(recs)
    cfg = TrainConfig(batch_size=32, epochs=epochs)
    cfg.optim = OptimConfig(optim="adamax", lr=lr)
    cfg.model.arch = arch

    if arch.startswith("ccn"):
        model = (ccn_mod.CCN1D if arch == "ccn1d" else ccn_mod.CCN2D)(
            hidden=hidden, n_layers=2, dim_output=2
        )
        make = lambda s: batching.CCNLoader(
            {"train": tr, "valid": va, "test": te}[s], 32, task=None
        )
    else:
        model = (
            models.GNNSimple(n_features=6, n_layers=3, dim_output=2)
            if arch == "gnn"
            else models.GNNLineGraph(n_features=6, n_layers=3, dim_output=2, order=2)
        )
        make = lambda s: batching.DenseLoader(
            {"train": tr, "valid": va, "test": te}[s],
            32,
            task=None,
            with_line_graph=(arch == "lggnn"),
        )
    state, history = train_lib.fit(model, make, cfg, kind="classification")
    return history


@pytest.mark.parametrize("arch", ["gnn", "lggnn"])
def test_gnn_learns_classification(arch):
    history = _fit_classification(arch)
    accs = [h["train_accuracy"] for h in history]
    assert accs[-1] > 0.8, f"no learning: {accs}"
    assert history[-1]["valid_accuracy"] > 0.65


def test_ccn1d_learns_classification():
    history = _fit_classification("ccn1d", epochs=15, lr=1e-2, hidden=12, n_max=10)
    assert history[-1]["train_accuracy"] > 0.75


def test_regression_loss_decreases():
    recs = qm9.synthetic_qm9_like(160, seed=1)
    tr, va, te = synthetic.split_80_10_10(recs)
    from hgnn2_tpu.data import stats as stats_lib

    ts = stats_lib.compute_target_stats(recs)
    cfg = TrainConfig(batch_size=32, epochs=5)
    cfg.optim = OptimConfig(lr=3e-3)
    model = models.GNNSimple(n_features=4, n_layers=3, dim_output=1, J=1)
    make = lambda s: batching.DenseLoader(
        {"train": tr, "valid": va, "test": te}[s], 32, task=0
    )
    state, history = train_lib.fit(
        model, make, cfg, kind="regression",
        mean=float(ts.mean[0]), std=float(ts.std[0]),
        accuracy=float(ts.accuracy[0]),
    )
    losses = [h["train_loss"] for h in history]
    assert losses[-1] < losses[0] * 0.8, losses
    assert "valid_error_ratio" in history[-1]


def test_checkpoint_roundtrip(tmp_path):
    recs = qm9.synthetic_qm9_like(40, seed=2)
    tr, va, te = synthetic.split_80_10_10(recs)
    cfg = TrainConfig(batch_size=16, epochs=2, checkpoint_path=str(tmp_path / "ck"))
    model = models.GNNSimple(n_features=2, n_layers=3, dim_output=1)
    make = lambda s: batching.DenseLoader(
        {"train": tr, "valid": va, "test": te}[s], 16, task=0
    )
    ckpt = ckpt_lib.Checkpointer(cfg.checkpoint_path)
    state, _ = train_lib.fit(model, make, cfg, checkpointer=ckpt)
    # resume: restores epoch 2 -> no more training needed
    cfg2 = TrainConfig(
        batch_size=16, epochs=2, checkpoint_path=cfg.checkpoint_path, resume=True
    )
    ckpt2 = ckpt_lib.Checkpointer(cfg.checkpoint_path)
    state2, history2 = train_lib.fit(model, make, cfg2, checkpointer=ckpt2)
    assert history2 == []  # resumed at epoch 2 of 2
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(state2.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
    )


def test_scanned_epoch_matches_stepwise():
    """One lax.scan over stacked bucket groups computes exactly the same
    epoch as per-step dispatch in the same order."""
    recs = qm9.synthetic_qm9_like(64, seed=5)
    loader = batching.CachedLoader(
        batching.DenseLoader(recs, 16, task=0, sort=True, shuffle=False),
        shuffle=False,
    )
    loader.materialize()
    model = models.GNNSimple(n_features=2, n_layers=3, dim_output=1)
    from hgnn2_tpu.training.optim import build_optimizer

    tx = build_optimizer(OptimConfig(optim="sgd", lr=1e-4, momentum=0.0),
                         steps_per_epoch=len(loader))
    sample = next(iter(loader))
    state0 = train_lib.TrainState.create(model, sample, tx, jax.random.key(0))

    step = train_lib.make_train_step("regression", 1.0, 2.0)
    s1, m1 = train_lib.run_epoch(state0, loader, step)

    groups = train_lib.group_stacked_batches(loader.batches())
    scan_fn = train_lib.make_scanned_epoch("regression", 1.0, 2.0)
    s2, m2 = train_lib.run_epoch_scanned(state0, groups, scan_fn, rng=None)

    np.testing.assert_allclose(m1["loss"], m2["loss"], rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   atol=1e-8)


def test_scanned_epoch_metrics_weighted_by_graph_count():
    """Epoch metrics from the scanned path weight each batch by its REAL
    graph count, so a padded remainder batch (here 4 real graphs vs 16)
    contributes proportionally — matching a manual weighted computation
    from per-batch stepwise metrics."""
    recs = qm9.synthetic_qm9_like(36, seed=7)  # 36 = 2*16 + ragged 4
    loader = batching.CachedLoader(
        batching.DenseLoader(recs, 16, task=0, sort=True, shuffle=False),
        shuffle=False,
    )
    loader.materialize()
    model = models.GNNSimple(n_features=2, n_layers=3, dim_output=1)
    from hgnn2_tpu.training.optim import build_optimizer

    tx = build_optimizer(OptimConfig(optim="sgd", lr=1e-4, momentum=0.0),
                         steps_per_epoch=len(loader))
    sample = next(iter(loader))
    state0 = train_lib.TrainState.create(model, sample, tx, jax.random.key(0))

    # manual weighted reference: per-batch stepwise metrics x real counts
    step = train_lib.make_train_step("regression", 1.0, 2.0)
    s = state0
    w_sum = {}
    total = 0.0
    for batch in loader:
        n_real = float(np.asarray(batch.gmask).sum()) if hasattr(
            batch, "gmask") else float(np.asarray(batch.n_nodes > 0).sum())
        s, mets = step(s, batch)
        total += n_real
        for k, v in mets.items():
            w_sum[k] = w_sum.get(k, 0.0) + float(v) * n_real
    want = {k: v / total for k, v in w_sum.items()}
    assert total == 36.0

    groups = train_lib.group_stacked_batches(loader.batches())
    scan_fn = train_lib.make_scanned_epoch("regression", 1.0, 2.0)
    s2, m2 = train_lib.run_epoch_scanned(state0, groups, scan_fn, rng=None)
    for k, v in want.items():
        np.testing.assert_allclose(m2[k], v, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   atol=1e-8)


def test_fit_scanned_equals_stepwise_epochs():
    """fit() with scan_epochs on and off produces matching trajectories
    when shuffling is deterministic-off."""
    recs = qm9.synthetic_qm9_like(64, seed=6)
    tr, va, te = synthetic.split_80_10_10(recs)

    def run(scan):
        cfg = TrainConfig(batch_size=16, epochs=2, scan_epochs=scan)
        cfg.optim = OptimConfig(optim="sgd", lr=1e-4, momentum=0.0)
        model = models.GNNSimple(n_features=2, n_layers=2, dim_output=1)

        def make(split):
            base = batching.DenseLoader(
                {"train": tr, "valid": va, "test": te}[split], 16, task=0,
                shuffle=False)
            return batching.CachedLoader(base, shuffle=False)

        _, history = train_lib.fit(model, make, cfg, kind="regression",
                                   mean=1.0, std=2.0)
        return history

    h_scan = run(True)
    h_step = run(False)
    for a, b in zip(h_scan, h_step):
        np.testing.assert_allclose(a["train_loss"], b["train_loss"],
                                   rtol=1e-5)
        np.testing.assert_allclose(a["valid_mae"], b["valid_mae"], rtol=1e-5)


def test_reset_each_epoch_runs():
    recs = qm9.synthetic_qm9_like(32, seed=3)
    tr, va, te = synthetic.split_80_10_10(recs)
    cfg = TrainConfig(batch_size=16, epochs=2)
    cfg.optim.reset_each_epoch = True
    model = models.GNNSimple(n_features=2, n_layers=3, dim_output=1)
    make = lambda s: batching.DenseLoader(
        {"train": tr, "valid": va, "test": te}[s], 16, task=0
    )
    _, history = train_lib.fit(model, make, cfg)
    assert len(history) == 2


def test_bn_recalibration_matches_batch_average():
    """recalibrate_bn replaces running stats with the uniform average of
    every batch's OWN statistics, identically through the stacked-group
    and per-batch paths."""
    recs = qm9.synthetic_qm9_like(48, seed=7)
    loader = batching.CachedLoader(
        batching.DenseLoader(recs, 16, task=0, sort=True, shuffle=False),
        shuffle=False,
    )
    loader.materialize()
    model = models.GNNSimple(n_features=3, n_layers=3, dim_output=1)
    tx = optim_lib.build_optimizer(OptimConfig(optim="sgd", lr=1e-3),
                                   steps_per_epoch=len(loader))
    sample = next(iter(loader))
    state = train_lib.TrainState.create(model, sample, tx, jax.random.key(1))
    # a couple of real steps so params/stats are not at init
    step = train_lib.make_train_step("regression", 0.0, 1.0)
    for b in loader:
        state, _ = step(state, b)

    # oracle: each batch's own stats via a zeroed-EMA apply (momentum 0.1
    # -> update against zeros returns 0.9 * batch_stat), averaged
    batches = list(loader)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, state.batch_stats)
    per_batch = []
    for b in batches:
        _, upd = model.apply(
            {"params": state.params, "batch_stats": zeros}, b, train=True,
            mutable=["batch_stats"])
        per_batch.append(jax.tree_util.tree_map(
            lambda u: u / 0.9, upd["batch_stats"]))
    want = jax.tree_util.tree_map(
        lambda *xs: sum(np.asarray(x) for x in xs) / len(xs), *per_batch)

    got_loader = train_lib.recalibrate_bn(state, loader=batches)
    groups = train_lib.group_stacked_batches(loader.batches())
    got_groups = train_lib.recalibrate_bn(state, groups=groups)

    for path, got in (("loader", got_loader), ("groups", got_groups)):
        flat_want = jax.tree_util.tree_leaves(want)
        flat_got = jax.tree_util.tree_leaves(got.batch_stats)
        assert len(flat_want) == len(flat_got)
        for w, g in zip(flat_want, flat_got):
            np.testing.assert_allclose(np.asarray(g), w, rtol=1e-5,
                                       atol=1e-6, err_msg=path)
    # stats actually changed (the EMA was dominated by the last batch)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(state.batch_stats),
                        jax.tree_util.tree_leaves(got_groups.batch_stats)))


def test_fit_bn_recalibrate_end_to_end():
    """cfg.bn_recalibrate appends a recalibrated final-eval row and keeps
    metrics finite, through both the scanned and stepwise fit paths."""
    recs = qm9.synthetic_qm9_like(80, seed=9)
    tr, va, te = synthetic.split_80_10_10(recs)

    def make(split):
        inner = batching.DenseLoader(
            {"train": tr, "valid": va, "test": te}[split], 16, task=0,
            sort=True, shuffle=False)
        return batching.CachedLoader(inner, shuffle=False)

    for scan in (True, False):
        cfg = TrainConfig(batch_size=16, epochs=2)
        cfg.optim = OptimConfig(optim="adamax", lr=1e-3)
        cfg.scan_epochs = scan
        cfg.bn_recalibrate = True
        model = models.GNNSimple(n_features=2, n_layers=3, dim_output=1)
        state, history = train_lib.fit(
            model, make, cfg, kind="regression", mean=0.0, std=1.0,
            accuracy=0.1)
        assert history[-1].get("bn_recalibrated") == 1.0
        assert len(history) == cfg.epochs + 1
        for k in ("valid_mae", "test_mae", "valid_error_ratio"):
            assert np.isfinite(history[-1][k]), (scan, k)
