"""Multi-chip logic on the 8-device virtual CPU mesh: DP equivalence,
edge-partitioned SpMM correctness + gradients, and the driver dry run."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hgnn2_tpu import graphs
from hgnn2_tpu.data import qm9
from hgnn2_tpu.nn import models, packed
from hgnn2_tpu.ops import sparse
from hgnn2_tpu.parallel import spmd
from hgnn2_tpu.training import train as train_lib
from hgnn2_tpu.training.config import OptimConfig
from hgnn2_tpu.training.optim import build_optimizer


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, jax.devices()
    return spmd.make_mesh(8, edge_axis=2)


def _batch(n_graphs, rng_seed=0, n_max=32):
    recs = qm9.synthetic_qm9_like(n_graphs, seed=rng_seed)
    return recs, graphs.make_dense_batch(
        recs, n_max=n_max, with_line_graph=True, batch_size=n_graphs, task=0
    )


def test_dp_step_matches_single_device(mesh):
    """A data-parallel train step produces the same params as single-chip."""
    recs, batch = _batch(8)
    model = models.GNNLineGraph(n_features=2, n_layers=3, J=1, order=1)
    # sgd: adamax's sign-like update amplifies cross-device reduction noise
    tx = build_optimizer(OptimConfig(optim="sgd", lr=1e-2, momentum=0.0), steps_per_epoch=1)
    state0 = train_lib.TrainState.create(model, batch, tx, jax.random.key(0))
    step = train_lib.make_train_step("regression", 0.0, 1.0)

    state1, m1 = step(state0, batch)

    with jax.sharding.set_mesh(mesh):
        sharded = spmd.shard_batch(mesh, batch)
        state_r = spmd.replicate(mesh, state0)
        state2, m2 = step(state_r, sharded)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(state1.params)
    l2 = jax.tree_util.tree_leaves(state2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_cli_dp_run_matches_single_device(tmp_path):
    """The SHIPPED trainer path (run_experiment: CachedLoader + --dp mesh)
    reproduces single-device training epoch for epoch."""
    from hgnn2_tpu.cli import common
    from hgnn2_tpu.training.config import TrainConfig

    def run(dp, tag):
        cfg = TrainConfig(batch_size=16, epochs=2, dp=dp,
                          log_path=str(tmp_path / tag))
        cfg.model.arch = "gnn"
        cfg.model.n_layers = 3
        cfg.model.n_features = 2
        # sgd: adamax's sign-like update amplifies reduction-order noise;
        # lr small enough that the trajectory stays FINITE — with NaNs,
        # assert_allclose(equal_nan default) would pass vacuously
        cfg.optim.optim = "sgd"
        cfg.optim.lr = 1e-4
        cfg.optim.momentum = 0.0
        cfg.data.dataset = "qm9_synthetic"
        cfg.data.n_synthetic = 64
        cfg.data.shuffle_batches = False  # identical batch order per run
        _, history = common.run_experiment(cfg)
        return history

    h1 = run(1, "dp1")
    h8 = run(8, "dp8")
    assert len(h1) == len(h8) == 2
    for a, b in zip(h1, h8):
        assert np.isfinite(a["train_loss"]) and np.isfinite(b["train_loss"])
        np.testing.assert_allclose(a["train_loss"], b["train_loss"], rtol=1e-4)
        np.testing.assert_allclose(a["valid_mae"], b["valid_mae"], rtol=1e-4)


def test_cli_edge_sharded_trainer_shard_count_invariant(tmp_path):
    """The molecule-aligned edge-sharded trainer (--edge_shards) computes
    shard-count-independent math: global BN stats via psums, loss/metric
    reductions psum'd — 2 shards and 4 shards give the same training
    trajectory (up to fp reordering)."""
    from hgnn2_tpu.cli import common
    from hgnn2_tpu.training.config import TrainConfig

    def run(n_shards, tag, arch="lggnn"):
        cfg = TrainConfig(batch_size=16, epochs=2, edge_shards=n_shards,
                          log_path=str(tmp_path / tag))
        cfg.model.arch = arch
        cfg.model.n_layers = 3
        cfg.model.n_features = 2
        cfg.model.order = 2
        # sgd at a small lr: packed sum-readouts start large, and adamax's
        # sign-like update would amplify cross-shard reduction noise
        cfg.optim.optim = "sgd"
        cfg.optim.lr = 1e-5
        cfg.optim.momentum = 0.0
        cfg.data.dataset = "qm9_synthetic"
        cfg.data.n_synthetic = 48
        _, history = common.run_experiment(cfg)
        return history

    h2 = run(2, "es2")
    h4 = run(4, "es4")
    assert len(h2) == len(h4) == 2
    for a, b in zip(h2, h4):
        assert np.isfinite(a["train_loss"]) and np.isfinite(b["train_loss"])
        np.testing.assert_allclose(a["train_loss"], b["train_loss"],
                                   rtol=5e-3)
        np.testing.assert_allclose(a["valid_mae"], b["valid_mae"], rtol=5e-3)
    # gnn arch drives PackedGNN through the same engine
    hg = run(2, "esg", arch="gnn")
    assert np.isfinite(hg[-1]["train_loss"])


def test_cli_hybrid_dp_x_edge_shards_matches_single_device(tmp_path):
    """--dp M --edge_shards N compose on one (data=M, edge=N) mesh: the
    hybrid trajectory matches BOTH the pure edge-sharded run and a true
    single-device (1x1 mesh) run of the same packed trainer — the loss is
    the global batch mean and BN statistics psum over both axes, so the
    math is factorization-independent."""
    from hgnn2_tpu.cli import common
    from hgnn2_tpu.training.config import TrainConfig

    def run(dp, es, tag, arch="lggnn"):
        cfg = TrainConfig(batch_size=16, epochs=2, dp=dp, edge_shards=es,
                          log_path=str(tmp_path / tag))
        cfg.model.arch = arch
        cfg.model.n_layers = 3
        cfg.model.n_features = 2
        cfg.model.order = 2
        cfg.optim.optim = "sgd"
        cfg.optim.lr = 1e-5
        cfg.optim.momentum = 0.0
        cfg.data.dataset = "qm9_synthetic"
        cfg.data.n_synthetic = 48
        _, history = common.run_experiment(cfg)
        return history

    h_hybrid = run(2, 4, "h24")   # 8 devices as (data=2, edge=4)
    h_edge = run(1, 4, "e4")      # pure edge sharding, 4 devices
    assert len(h_hybrid) == len(h_edge) == 2
    for a, b in zip(h_hybrid, h_edge):
        assert np.isfinite(a["train_loss"]) and np.isfinite(b["train_loss"])
        np.testing.assert_allclose(a["train_loss"], b["train_loss"],
                                   rtol=5e-3)
        np.testing.assert_allclose(a["valid_mae"], b["valid_mae"], rtol=5e-3)

    # true single-device trajectory through the same engine: a (1,1) mesh
    from hgnn2_tpu.cli.common import build_packed_model, load_records
    from hgnn2_tpu.data import synthetic as synth_lib
    from hgnn2_tpu.training import sharded as sharded_lib

    cfg1 = TrainConfig(batch_size=16, epochs=2, dp=1, edge_shards=1,
                       log_path=str(tmp_path / "single"))
    cfg1.model.arch = "lggnn"
    cfg1.model.n_layers = 3
    cfg1.model.n_features = 2
    cfg1.model.order = 2
    cfg1.optim.optim = "sgd"
    cfg1.optim.lr = 1e-5
    cfg1.optim.momentum = 0.0
    cfg1.data.dataset = "qm9_synthetic"
    cfg1.data.n_synthetic = 48
    records, kind, tstats, _ = load_records(cfg1)
    tr, va, te = synth_lib.split_80_10_10(records)
    mean = float(tstats.mean[0])
    std = float(tstats.std[0])
    model1 = build_packed_model(cfg1, kind, bn_axis="edge")
    _, h_single = sharded_lib.fit_sharded(
        model1, cfg1, {"train": tr, "valid": va, "test": te},
        kind=kind, mean=mean, std=std,
    )
    for a, b in zip(h_hybrid, h_single):
        np.testing.assert_allclose(a["train_loss"], b["train_loss"],
                                   rtol=5e-3)
        np.testing.assert_allclose(a["valid_mae"], b["valid_mae"], rtol=5e-3)


def test_cli_hybrid_ccn_vertex_sharding(tmp_path):
    """The hybrid (data x edge) mesh also drives vertex-sharded CCN: exact
    single-chip math, so (2 dp x 2 shards) == (1 x 4 shards) tightly."""
    from hgnn2_tpu.cli import common
    from hgnn2_tpu.training.config import TrainConfig

    def run(dp, es, tag):
        cfg = TrainConfig(batch_size=16, epochs=2, dp=dp, edge_shards=es,
                          log_path=str(tmp_path / tag))
        cfg.model.arch = "ccn1d"
        cfg.model.n_layers = 2
        cfg.model.n_features = 3
        cfg.optim.optim = "sgd"
        cfg.optim.lr = 1e-4
        cfg.optim.momentum = 0.0
        cfg.data.dataset = "qm9_synthetic"
        cfg.data.n_synthetic = 48
        _, history = common.run_experiment(cfg)
        return history

    h_hybrid = run(2, 2, "ch22")
    h_flat = run(1, 4, "cf4")
    for a, b in zip(h_hybrid, h_flat):
        np.testing.assert_allclose(a["train_loss"], b["train_loss"],
                                   rtol=1e-4)
        np.testing.assert_allclose(a["valid_mae"], b["valid_mae"], rtol=1e-4)


def test_sharded_trainer_scanned_equals_stepwise(tmp_path):
    """The sharded trainer's scanned epochs (one lax.scan per epoch over
    the stacked shard batches) traverse the SAME batch sequence as the
    stepwise path and produce matching trajectories — for pure edge
    sharding and the hybrid (data, edge) mesh."""
    from hgnn2_tpu.cli import common
    from hgnn2_tpu.training.config import TrainConfig

    def run(dp, es, scan, tag):
        cfg = TrainConfig(batch_size=16, epochs=2, dp=dp, edge_shards=es,
                          scan_epochs=scan, log_path=str(tmp_path / tag))
        cfg.model.arch = "lggnn"
        cfg.model.n_layers = 3
        cfg.model.n_features = 2
        cfg.model.order = 2
        cfg.optim.optim = "sgd"
        cfg.optim.lr = 1e-5
        cfg.optim.momentum = 0.0
        cfg.data.dataset = "qm9_synthetic"
        cfg.data.n_synthetic = 48
        _, history = common.run_experiment(cfg)
        return history

    h_scan = run(1, 2, True, "ss_scan")
    h_step = run(1, 2, False, "ss_step")
    for a, b in zip(h_scan, h_step):
        assert np.isfinite(a["train_loss"]) and np.isfinite(b["train_loss"])
        np.testing.assert_allclose(a["train_loss"], b["train_loss"],
                                   rtol=1e-5)
        np.testing.assert_allclose(a["valid_mae"], b["valid_mae"],
                                   rtol=1e-5)

    h_scan_h = run(2, 2, True, "hh_scan")
    h_step_h = run(2, 2, False, "hh_step")
    for a, b in zip(h_scan_h, h_step_h):
        np.testing.assert_allclose(a["train_loss"], b["train_loss"],
                                   rtol=1e-5)


def test_cli_ccn_vertex_sharded_trainer(tmp_path):
    """--edge_shards on a CCN arch routes to vertex sharding: exact
    single-chip math (no BN), so 2 and 4 shards agree tightly."""
    from hgnn2_tpu.cli import common
    from hgnn2_tpu.training.config import TrainConfig

    def run(n_shards, tag):
        cfg = TrainConfig(batch_size=16, epochs=2, edge_shards=n_shards,
                          log_path=str(tmp_path / tag))
        cfg.model.arch = "ccn1d"
        cfg.model.n_layers = 2
        cfg.model.n_features = 3
        cfg.optim.optim = "sgd"
        cfg.optim.lr = 1e-4
        cfg.optim.momentum = 0.0
        cfg.data.dataset = "qm9_synthetic"
        cfg.data.n_synthetic = 48
        _, history = common.run_experiment(cfg)
        return history

    h2 = run(2, "vs2")
    h4 = run(4, "vs4")
    for a, b in zip(h2, h4):
        np.testing.assert_allclose(a["train_loss"], b["train_loss"],
                                   rtol=1e-4)
        np.testing.assert_allclose(a["valid_mae"], b["valid_mae"], rtol=1e-4)


def test_cli_dp_scanned_equals_stepwise_and_single_device(tmp_path):
    """Scanned epochs now compose with a DP mesh (the stacks keep the
    batch axis sharded over 'data'): scanned-DP == stepwise-DP ==
    single-device, epoch for epoch."""
    from hgnn2_tpu.cli import common
    from hgnn2_tpu.training.config import TrainConfig

    def run(dp, scan, tag):
        cfg = TrainConfig(batch_size=16, epochs=2, dp=dp, scan_epochs=scan,
                          log_path=str(tmp_path / tag))
        cfg.model.arch = "gnn"
        cfg.model.n_layers = 3
        cfg.model.n_features = 2
        # finite, deterministic-order trajectories (see the dp test above:
        # NaN trajectories would make assert_allclose pass vacuously, and
        # the scanned vs stepwise paths shuffle with different streams)
        cfg.optim.optim = "sgd"
        cfg.optim.lr = 1e-4
        cfg.optim.momentum = 0.0
        cfg.data.dataset = "qm9_synthetic"
        cfg.data.n_synthetic = 64
        cfg.data.shuffle_batches = False
        _, history = common.run_experiment(cfg)
        return history

    h_scan_dp = run(8, True, "scandp")
    h_step_dp = run(8, False, "stepdp")
    h_single = run(1, True, "single")
    assert len(h_scan_dp) == 2
    for a, b, c in zip(h_scan_dp, h_step_dp, h_single):
        assert np.isfinite(a["train_loss"])
        np.testing.assert_allclose(a["train_loss"], b["train_loss"],
                                   rtol=1e-4)
        np.testing.assert_allclose(a["train_loss"], c["train_loss"],
                                   rtol=1e-4)
        np.testing.assert_allclose(a["valid_mae"], b["valid_mae"], rtol=1e-4)
        np.testing.assert_allclose(a["valid_mae"], c["valid_mae"], rtol=1e-4)


def test_cached_loader_redeal(tmp_path):
    """redeal_every rebuilds batch composition from the inner loader every
    K iterations; without it composition is frozen."""
    from hgnn2_tpu.data import batching, qm9

    recs = qm9.synthetic_qm9_like(64, seed=11)
    inner = batching.DenseLoader(recs, 16, task=0, shuffle=True, seed=3)
    loader = batching.CachedLoader(inner, shuffle=False, redeal_every=2)

    def epoch_sig():
        return [np.asarray(b.y).tobytes() for b in loader]

    e0, e1, e2 = epoch_sig(), epoch_sig(), epoch_sig()
    assert e0 == e1          # epochs 0-1: same deal
    assert e0 != e2          # epoch 2: re-dealt (inner shuffle advanced)

    # the shipped trainer path: redeal under scanned epochs stays finite
    from hgnn2_tpu.cli import common
    from hgnn2_tpu.training.config import TrainConfig

    cfg = TrainConfig(batch_size=16, epochs=3,
                      log_path=str(tmp_path / "redeal"))
    cfg.data.dataset = "qm9_synthetic"
    cfg.data.n_synthetic = 48
    cfg.data.redeal_every = 2
    cfg.model.arch = "gnn"
    cfg.model.n_layers = 2
    cfg.model.n_features = 2
    _, history = common.run_experiment(cfg)
    assert len(history) == 3
    assert all(np.isfinite(h["train_loss"]) for h in history)


def test_cli_dp_rejects_indivisible_batch(tmp_path):
    from hgnn2_tpu.cli import common
    from hgnn2_tpu.training.config import TrainConfig

    cfg = TrainConfig(batch_size=30, epochs=1, dp=8,
                      log_path=str(tmp_path / "x"))
    cfg.data.dataset = "qm9_synthetic"
    cfg.data.n_synthetic = 32
    with pytest.raises(ValueError, match="not divisible"):
        common.run_experiment(cfg)


def test_partitioned_spmm_matches_local(mesh):
    recs, _ = _batch(6, rng_seed=1)
    pb = graphs.make_packed_batch(recs, task=0)
    padded = spmd.pad_edges_for_partition(
        {"src": pb.src, "dst": pb.dst, "w": pb.w}, 2, pb.num_node_slots
    )
    src, dst, w = (jnp.asarray(padded[k]) for k in ("src", "dst", "w"))
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((pb.num_node_slots, 3)).astype(np.float32)
    )
    expect = sparse.spmm(src, dst, w, x, pb.num_node_slots)
    with jax.sharding.set_mesh(mesh):
        spmm = spmd.partitioned_spmm(mesh, pb.num_node_slots)
        got = spmm(src, dst, w, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=1e-5)


def test_partitioned_spmm_gradients(mesh):
    recs, _ = _batch(4, rng_seed=2)
    pb = graphs.make_packed_batch(recs, task=0)
    padded = spmd.pad_edges_for_partition(
        {"src": pb.src, "dst": pb.dst, "w": pb.w}, 2, pb.num_node_slots
    )
    src, dst, w = (jnp.asarray(padded[k]) for k in ("src", "dst", "w"))
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((pb.num_node_slots, 2)).astype(np.float32)
    )

    def loss_local(x):
        return (sparse.spmm(src, dst, w, x, pb.num_node_slots) ** 2).sum()

    with jax.sharding.set_mesh(mesh):
        spmm = spmd.partitioned_spmm(mesh, pb.num_node_slots)

        def loss_part(x):
            return (spmm(src, dst, w, x) ** 2).sum()

        g_part = jax.grad(loss_part)(x)
    g_local = jax.grad(loss_local)(x)
    np.testing.assert_allclose(np.asarray(g_part), np.asarray(g_local), atol=1e-4)


def test_packed_gnn_partitioned_matches_local(mesh):
    recs, _ = _batch(6, rng_seed=3)
    pb = graphs.make_packed_batch(recs, task=0)
    padded = spmd.pad_edges_for_partition(
        {"src": pb.src, "dst": pb.dst, "w": pb.w}, 2, pb.num_node_slots
    )
    pb = pb.replace(
        src=jnp.asarray(padded["src"]),
        dst=jnp.asarray(padded["dst"]),
        w=jnp.asarray(padded["w"]),
        rev=jnp.zeros_like(jnp.asarray(padded["src"])),
        edge_gid=jnp.zeros_like(jnp.asarray(padded["src"])),
        edge_mask=jnp.zeros(padded["src"].shape[0], jnp.float32),
    )
    model = packed.PackedGNN(n_features=3, n_layers=3, J=2)
    variables = model.init(jax.random.key(0), pb, train=True)
    out_local, _ = model.apply(variables, pb, train=True, mutable=["batch_stats"])
    with jax.sharding.set_mesh(mesh):
        gop = spmd.partitioned_graph_op(mesh, pb.num_node_slots, J=2)
        out_part, _ = model.apply(
            variables, pb, train=True,
            graph_op_fn=lambda x: gop(pb.src, pb.dst, pb.w, x),
            mutable=["batch_stats"],
        )
    np.testing.assert_allclose(
        np.asarray(out_part), np.asarray(out_local), atol=1e-4
    )


def test_driver_dryrun_multichip():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_driver_entry_compiles():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()
