"""Packed-sparse models agree with the dense-block models on identical
molecules and weights (the two layouts implement the same math)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hgnn2_tpu import graphs
from hgnn2_tpu.data import qm9
from hgnn2_tpu.nn import models, packed


def _data(n=6, seed=0):
    recs = qm9.synthetic_qm9_like(n, seed=seed)
    dense = graphs.make_dense_batch(recs, with_line_graph=True, task=0)
    pb = graphs.make_packed_batch(recs, task=0)
    return recs, dense, pb


def _copy_gnn_params(dense_params, n_layers):
    """Map GNNSimple params (layerN/{cv1,cv2,bn}) to PackedGNN names."""
    p = {}
    for i in range(n_layers - 1):
        src = dense_params[f"layer{i}"]
        p[f"layer{i}_cv1"] = src["cv1"]
        p[f"layer{i}_cv2"] = src["cv2"]
        p[f"layer{i}_bn"] = src["bn"]
    p["fc"] = dense_params["layerlast"]["fc"]
    return p


def test_packed_gnn_matches_dense(rng):
    recs, dense, pb = _data()
    L, h, J = 3, 3, 2
    m_dense = models.GNNSimple(n_features=h, n_layers=L, J=J)
    m_packed = packed.PackedGNN(n_features=h, n_layers=L, J=J)
    v_dense = m_dense.init(jax.random.key(0), dense, train=True)
    out_dense, _ = m_dense.apply(v_dense, dense, train=True, mutable=["batch_stats"])

    v_packed = m_packed.init(jax.random.key(0), pb, train=True)
    params = _copy_gnn_params(v_dense["params"], L)
    out_packed, _ = m_packed.apply(
        {"params": params, "batch_stats": v_packed["batch_stats"]},
        pb, train=True, mutable=["batch_stats"],
    )
    np.testing.assert_allclose(
        np.asarray(out_packed), np.asarray(out_dense), atol=2e-4
    )


def _copy_lg_params(dense_params, n_layers):
    p = {}
    for i in range(n_layers - 1):
        src = dense_params[f"layer{i}"]
        for part in ["node_cv1", "node_cv2", "node_bn", "edge_cv1",
                     "edge_cv2", "edge_bn"]:
            p[f"layer{i}_{part}"] = src[part]
    p["fc"] = dense_params["layerlast"]["fc"]
    return p


@pytest.mark.parametrize("order", [1, 2, 3])
def test_packed_lggnn_matches_dense(rng, order):
    recs, dense, pb = _data(seed=order)
    L, h, J = 3, 2, 1
    m_dense = models.GNNLineGraph(n_features=h, n_layers=L, J=J, order=order)
    m_packed = packed.PackedLGGNN(n_features=h, n_layers=L, J=J, order=order)
    v_dense = m_dense.init(jax.random.key(0), dense, train=True)
    out_dense, _ = m_dense.apply(v_dense, dense, train=True, mutable=["batch_stats"])

    v_packed = m_packed.init(jax.random.key(0), pb, train=True)
    params = _copy_lg_params(v_dense["params"], L)
    out_packed, _ = m_packed.apply(
        {"params": params, "batch_stats": v_packed["batch_stats"]},
        pb, train=True, mutable=["batch_stats"],
    )
    np.testing.assert_allclose(
        np.asarray(out_packed), np.asarray(out_dense), atol=2e-4
    )


def test_packed_cli_training_runs(tmp_path):
    """--packed trains PackedGNN/PackedLGGNN through the shipped trainer
    (PackedLoader + CachedLoader + scanned epochs) to finite losses."""
    import numpy as np

    from hgnn2_tpu.cli import common
    from hgnn2_tpu.training.config import TrainConfig

    for arch in ("gnn", "lggnn"):
        cfg = TrainConfig(batch_size=16, epochs=2,
                          log_path=str(tmp_path / f"packed_{arch}"))
        cfg.model.arch = arch
        cfg.model.packed = True
        cfg.model.n_layers = 3
        cfg.model.n_features = 2
        cfg.model.order = 2
        cfg.data.dataset = "qm9_synthetic"
        cfg.data.n_synthetic = 48
        _, history = common.run_experiment(cfg)
        assert len(history) == 2
        assert all(np.isfinite(h["train_loss"]) for h in history)
        assert history[1]["train_loss"] < history[0]["train_loss"] * 1.5


def test_packed_rejects_dp(tmp_path):
    import pytest

    from hgnn2_tpu.cli import common
    from hgnn2_tpu.training.config import TrainConfig

    cfg = TrainConfig(batch_size=16, epochs=1, dp=8,
                      log_path=str(tmp_path / "x"))
    cfg.model.arch = "gnn"
    cfg.model.packed = True
    cfg.data.dataset = "qm9_synthetic"
    cfg.data.n_synthetic = 32
    with pytest.raises(ValueError, match="edge_shards"):
        common.run_experiment(cfg)


def test_packed_cli_train_then_predict(tmp_path):
    """A --packed single-device training checkpoint (TrainState payload)
    round-trips through cli.predict --packed."""
    import json as json_lib

    from hgnn2_tpu.cli import common, predict
    from hgnn2_tpu.training.config import TrainConfig

    ck = str(tmp_path / "ck")
    cfg = TrainConfig(batch_size=16, epochs=2, checkpoint_path=ck,
                      log_path=str(tmp_path / "run"))
    cfg.model.arch = "lggnn"
    cfg.model.packed = True
    cfg.model.n_layers = 3
    cfg.model.n_features = 2
    cfg.model.order = 2
    cfg.data.dataset = "qm9_synthetic"
    cfg.data.n_synthetic = 48
    common.run_experiment(cfg)

    out = str(tmp_path / "preds.npz")
    predict.main([
        "--ckpt", ck, "--arch", "lggnn", "--L", "3", "--h", "2",
        "--update", "2", "--packed", "--n_synthetic", "48",
        "--bs", "16", "--out", out,
    ])
    import numpy as np

    data = np.load(out)
    assert len(data["predictions"]) == 48
    assert np.isfinite(data["predictions"]).all()
