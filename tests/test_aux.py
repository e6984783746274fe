"""Auxiliary-subsystem tests: plots, spatial normalization, sharding,
debug smoke harness, runtime helpers."""

import json
import os

import numpy as np

from hgnn2_tpu.data import qm9
from hgnn2_tpu.nn.layers import spatial_normalization
from hgnn2_tpu.training import metrics as metrics_lib
from hgnn2_tpu.training import plots


def test_spatial_normalization_matches_reference_math(rng):
    """Oracle re-derivation of legacy spatial_normalization (reference
    batching.py:188-201: masked per-sample mean, var = eps + masked mean of
    squared centered values, divide by sqrt). The legacy module itself
    can't be imported without RDKit, so the oracle is inlined."""
    B, N, F = 3, 6, 4
    ns = [6, 4, 5]
    h = rng.standard_normal((B, N, F)).astype(np.float32)
    mask = np.zeros((B, N), np.float32)
    for i, n in enumerate(ns):
        mask[i, :n] = 1.0

    ref = np.zeros_like(h)
    for b in range(B):
        n = ns[b]
        avg = h[b, :n].sum(0) / n
        centered = h[b] - avg
        var = 1e-15 + (centered[:n] ** 2).sum(0) / n
        ref[b] = centered / np.sqrt(var)
    ref *= mask[..., None]  # ours masks the output; legacy leaves -avg/std

    ours = np.asarray(spatial_normalization(h, mask, eps=1e-15))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_shard_split_partition():
    recs = qm9.synthetic_qm9_like(55, seed=0)
    shards = qm9.split_shards(recs, n_shards=10, seed=1)
    assert len(shards) == 10
    assert sum(len(s) for s in shards) == 55
    assert len(shards[-1]) == 10  # remainder goes to the last shard


def test_save_shards_roundtrip(tmp_path):
    recs = qm9.synthetic_qm9_like(20, seed=1)
    paths = qm9.save_shards(recs, str(tmp_path), n_shards=4)
    assert len(paths) == 4
    total = sum(len(qm9.load_cache(p)) for p in paths)
    assert total == 20


def test_plots_written(tmp_path):
    logger = metrics_lib.ExperimentLogger(str(tmp_path))
    for e in range(3):
        logger.log_epoch(e + 1, train_loss=1.0 / (e + 1), valid_loss=1.2 / (e + 1),
                         train_accuracy=0.5 + 0.1 * e)
    written = plots.plot_history(str(tmp_path))
    names = {os.path.basename(p) for p in written}
    assert "loss.png" in names
    assert "accuracy.png" in names
    for p in written:
        assert os.path.getsize(p) > 0


def test_logger_files(tmp_path):
    logger = metrics_lib.ExperimentLogger(str(tmp_path))
    logger.write_settings({"a": 1})
    logger.log_epoch(1, train_loss=0.5)
    logger.log_final(train_loss=0.5)
    with open(tmp_path / "results.jsonl") as f:
        row = json.loads(f.readline())
    assert row["train_loss"] == 0.5
    assert (tmp_path / "experiment.json").exists()
    assert (tmp_path / "final.json").exists()
    # a second logger on the same dir must NOT wipe it (unlike the
    # reference Logger, functions/logs.py:41-51)
    metrics_lib.ExperimentLogger(str(tmp_path))
    assert (tmp_path / "results.jsonl").exists()


def test_debug_smoke_gnn():
    from hgnn2_tpu.cli import debug

    result = debug.smoke("gnn")
    assert "train_loss" in result
