"""Prefetch, preemption handling, and predict-from-checkpoint round trip."""

import os
import signal
import time

import numpy as np

from hgnn2_tpu.data import batching, qm9, synthetic
from hgnn2_tpu.nn import models
from hgnn2_tpu.training import checkpoint as ckpt_lib
from hgnn2_tpu.training import train as train_lib
from hgnn2_tpu.training.config import TrainConfig
from hgnn2_tpu.training.prefetch import prefetch
from hgnn2_tpu.training.preemption import GracefulShutdown


def test_prefetch_preserves_order_and_exceptions():
    assert list(prefetch(range(10), size=3)) == list(range(10))

    def gen():
        yield 1
        raise ValueError("boom")

    items = []
    try:
        for x in prefetch(gen(), size=2):
            items.append(x)
    except ValueError as e:
        assert "boom" in str(e)
    assert items == [1]


def test_graceful_shutdown_latches_signal():
    with GracefulShutdown() as s:
        assert not s.requested
        os.kill(os.getpid(), signal.SIGTERM)
        time.sleep(0.05)
        assert s.requested
    # handler restored: sending SIGTERM again must not set a stale flag
    # (we can't safely re-send SIGTERM outside the context in a test)


def test_fit_stops_after_signal(tmp_path):
    """A signal mid-training checkpoints and stops at the epoch boundary."""
    recs = qm9.synthetic_qm9_like(48, seed=0)
    tr, va, te = synthetic.split_80_10_10(recs)
    cfg = TrainConfig(batch_size=16, epochs=50,
                      checkpoint_path=str(tmp_path / "ck"))
    model = models.GNNSimple(n_features=2, n_layers=3, dim_output=1)

    calls = {"n": 0}

    class SignallingLoader:
        def __init__(self, inner):
            self.inner = inner

        def __len__(self):
            return len(self.inner)

        def __iter__(self):
            calls["n"] += 1
            if calls["n"] == 3:  # third epoch: simulate preemption
                os.kill(os.getpid(), signal.SIGTERM)
            return iter(self.inner)

    base = batching.DenseLoader(tr, 16, task=0)

    def make(split):
        if split == "train":
            return SignallingLoader(base)
        return None

    ckpt = ckpt_lib.Checkpointer(cfg.checkpoint_path)
    state, history = train_lib.fit(model, make, cfg, checkpointer=ckpt)
    assert len(history) < 50  # stopped early
    assert ckpt.manager.latest_step() == len(history)


def test_predict_cli_roundtrip(tmp_path, capsys):
    """Train 2 epochs via the CLI runner, then predict from the checkpoint."""
    from hgnn2_tpu.cli import predict as predict_cli
    from hgnn2_tpu.cli import common
    from hgnn2_tpu.training.config import TrainConfig

    cache = str(tmp_path / "data.npz")
    qm9.save_cache(qm9.synthetic_qm9_like(64, seed=1), cache)

    cfg = TrainConfig(batch_size=16, epochs=2,
                      checkpoint_path=str(tmp_path / "ck"),
                      log_path=str(tmp_path / "log"))
    cfg.model.arch = "gnn"
    cfg.model.n_layers = 3
    cfg.model.n_features = 2
    cfg.data.data_path = cache
    common.run_experiment(cfg)

    out = str(tmp_path / "preds.npz")
    predict_cli.main([
        "--ckpt", str(tmp_path / "ck"), "--arch", "gnn", "--L", "3",
        "--h", "2", "--data_path", cache, "--out", out, "--bs", "16",
    ])
    z = np.load(out)
    assert z["predictions"].shape == (64,)
    assert np.isfinite(z["predictions"]).all()


def test_sharded_trainer_checkpoint_resume(tmp_path):
    """The edge-sharded trainer checkpoints params/opt_state per epoch and
    resumes from the latest epoch."""
    from hgnn2_tpu.cli import common
    from hgnn2_tpu.training.config import TrainConfig

    def cfg_for(epochs, resume):
        cfg = TrainConfig(batch_size=16, epochs=epochs, edge_shards=2,
                          checkpoint_path=str(tmp_path / "ck"),
                          log_path=str(tmp_path / f"log{epochs}"),
                          resume=resume)
        cfg.model.arch = "gnn"
        cfg.model.n_layers = 2
        cfg.model.n_features = 2
        cfg.optim.optim = "sgd"
        cfg.optim.lr = 1e-5
        cfg.optim.momentum = 0.0
        cfg.data.dataset = "qm9_synthetic"
        cfg.data.n_synthetic = 32
        return cfg

    _, h1 = common.run_experiment(cfg_for(2, resume=False))
    assert len(h1) == 2
    # resume continues from epoch 3 — only 2 more epochs run
    _, h2 = common.run_experiment(cfg_for(4, resume=True))
    assert len(h2) == 2
    assert np.isfinite(h2[-1]["train_loss"])


def test_sharded_checkpoint_export_predict_roundtrip(tmp_path):
    """Checkpoints from the edge-sharded trainer flow through the shipped
    export (--packed -> 'packed' serving bundle) and predict CLIs."""
    from hgnn2_tpu import serving
    from hgnn2_tpu.cli import common
    from hgnn2_tpu.cli import export as export_cli
    from hgnn2_tpu.cli import predict as predict_cli
    from hgnn2_tpu.training.config import TrainConfig

    cache = str(tmp_path / "data.npz")
    records = qm9.synthetic_qm9_like(32, seed=3)
    qm9.save_cache(records, cache)

    ck = str(tmp_path / "ck")
    cfg = TrainConfig(batch_size=16, epochs=1, edge_shards=2,
                      checkpoint_path=ck, log_path=str(tmp_path / "log"))
    cfg.model.arch = "gnn"
    cfg.model.n_layers = 2
    cfg.model.n_features = 2
    cfg.data.data_path = cache
    common.run_experiment(cfg)

    bundle = str(tmp_path / "bundle")
    export_cli.main([
        "--ckpt", ck, "--arch", "gnn", "--L", "2", "--h", "2", "--packed",
        "--bs", "8", "--platforms", "cpu", "--data_path", cache,
        "--out", bundle,
    ])
    sm = serving.load_bundle(bundle)
    assert sm.kind == "packed"
    preds = sm.predict(records[:10])
    assert preds.shape == (10,) and np.isfinite(preds).all()

    out = str(tmp_path / "preds.npz")
    predict_cli.main([
        "--ckpt", ck, "--arch", "gnn", "--L", "2", "--h", "2", "--packed",
        "--data_path", cache, "--out", out, "--bs", "16",
    ])
    z = np.load(out)
    assert z["predictions"].shape == (32,)
    assert np.isfinite(z["predictions"]).all()


def test_export_uses_training_stats_and_refuses_fallback(tmp_path):
    """Target stats persist next to the checkpoint at train time; export
    bakes THOSE into the bundle, and refuses to freeze stats recomputed
    from the synthetic fallback when they are absent."""
    import pytest

    from hgnn2_tpu import serving
    from hgnn2_tpu.cli import common
    from hgnn2_tpu.cli import export as export_cli
    from hgnn2_tpu.data import stats as stats_lib
    from hgnn2_tpu.training.config import TrainConfig

    cache = str(tmp_path / "data.npz")
    records = qm9.synthetic_qm9_like(48, seed=2)
    qm9.save_cache(records, cache)

    ck = str(tmp_path / "ck")
    cfg = TrainConfig(batch_size=16, epochs=1, checkpoint_path=ck,
                      log_path=str(tmp_path / "log"))
    cfg.model.arch = "gnn"
    cfg.model.n_layers = 2
    cfg.model.n_features = 2
    cfg.data.data_path = cache
    common.run_experiment(cfg)

    stats_path = os.path.join(ck, common.TARGET_STATS_FILE)
    assert os.path.exists(stats_path)
    train_stats = stats_lib.TargetStats.load(stats_path)

    # export WITHOUT --data_path: must pick up the persisted training stats
    bundle = str(tmp_path / "bundle")
    export_cli.main([
        "--ckpt", ck, "--arch", "gnn", "--L", "2", "--h", "2",
        "--bs", "8", "--n_max", "32", "--platforms", "cpu", "--out", bundle,
    ])
    meta = serving.load_bundle(bundle).meta
    np.testing.assert_allclose(meta["mean"], float(train_stats.mean[0]))
    np.testing.assert_allclose(meta["std"], float(train_stats.std[0]))

    # without persisted stats and without a dataset, export must refuse
    os.remove(stats_path)
    with pytest.raises(SystemExit, match="refusing to export"):
        export_cli.main([
            "--ckpt", ck, "--arch", "gnn", "--L", "2", "--h", "2",
            "--bs", "8", "--n_max", "32", "--platforms", "cpu",
            "--out", str(tmp_path / "bundle2"),
        ])


def test_hybrid_trainer_checkpoint_resume(tmp_path):
    """The HYBRID (--dp x --edge_shards) trainer checkpoints and resumes:
    restored state re-replicates over the (data, edge) mesh."""
    from hgnn2_tpu.cli import common
    from hgnn2_tpu.training.config import TrainConfig

    def cfg_for(epochs, resume):
        cfg = TrainConfig(batch_size=16, epochs=epochs, dp=2, edge_shards=2,
                          checkpoint_path=str(tmp_path / "hck"),
                          log_path=str(tmp_path / f"hlog{epochs}"),
                          resume=resume)
        cfg.model.arch = "lggnn"
        cfg.model.n_layers = 2
        cfg.model.n_features = 2
        cfg.model.order = 2
        cfg.optim.optim = "sgd"
        cfg.optim.lr = 1e-5
        cfg.optim.momentum = 0.0
        cfg.data.dataset = "qm9_synthetic"
        cfg.data.n_synthetic = 32
        return cfg

    _, h1 = common.run_experiment(cfg_for(2, resume=False))
    assert len(h1) == 2
    _, h2 = common.run_experiment(cfg_for(4, resume=True))
    assert len(h2) == 2
    assert np.isfinite(h2[-1]["train_loss"])
