"""Serving/export tests: frozen cross-platform artifacts round-trip and
serve arbitrary request sizes through the exported bucket.

Replaces-and-extends the reference's only deployment path — reloading a
whole torch module into the training code (functions/logs.py:117-123) —
with a self-contained jax.export artifact.
"""

import numpy as np
import pytest

import jax

from hgnn2_tpu import graphs, serving
from hgnn2_tpu.data import qm9
from hgnn2_tpu.nn import ccn as ccn_mod
from hgnn2_tpu.nn import models


@pytest.fixture(scope="module")
def records():
    return qm9.synthetic_qm9_like(21, seed=0)


def test_gnn_export_roundtrip(tmp_path, records):
    batch = graphs.make_dense_batch(records[:8], n_max=32, batch_size=8, task=0)
    model = models.GNNSimple(n_features=2, n_layers=3, J=1)
    variables = model.init(jax.random.key(0), batch, train=False)
    direct = np.asarray(model.apply(variables, batch, train=False))

    # cross-platform: lowering for TPU works from this CPU-only process
    exp = serving.export_model(model, variables, batch, platforms=("cpu", "tpu"))
    assert set(exp.platforms) == {"cpu", "tpu"}

    serving.save_bundle(str(tmp_path / "b"), exp, kind="dense", task=0)
    sm = serving.load_bundle(str(tmp_path / "b"))
    assert sm.kind == "dense"
    assert sm.meta["input_spec"]["x"][0] == [8, 32, 5]
    # the frozen artifact must not demand labels at inference time,
    # but call() still accepts a full batch dict (labels filtered out)
    assert "y" not in sm.meta["input_spec"]
    out = np.asarray(sm.call(serving.batch_to_arrays(batch)))
    np.testing.assert_allclose(out, direct, atol=1e-6)
    unlabeled = serving.batch_to_arrays(batch, exclude=("y",))
    np.testing.assert_allclose(np.asarray(sm.call(unlabeled)), direct, atol=1e-6)


def test_lggnn_predict_chunks_pads_denormalizes(tmp_path, records):
    m_max = max(r.n_dir_edges for r in records)
    mean, std = 3.0, 2.0
    batch = graphs.make_dense_batch(
        records[:8], n_max=32, m_max=m_max, batch_size=8,
        with_line_graph=True, task=0,
    )
    model = models.GNNLineGraph(n_features=2, n_layers=3, J=1, order=2)
    variables = model.init(jax.random.key(1), batch, train=False)
    exp = serving.export_model(model, variables, batch, platforms=("cpu",))
    serving.save_bundle(str(tmp_path / "b"), exp, kind="dense", task=0,
                        mean=mean, std=std)
    sm = serving.load_bundle(str(tmp_path / "b"))

    # 21 records through the 8-wide bucket: 2 full chunks + padded tail
    preds = sm.predict(records)
    oracle = []
    for lo in range(0, len(records), 8):
        ch = records[lo : lo + 8]
        b = graphs.make_dense_batch(
            ch, n_max=32, m_max=m_max, batch_size=8,
            with_line_graph=True, task=0,
        )
        o = np.asarray(model.apply(variables, b, train=False))[: len(ch), 0]
        oracle.append(o * std + mean)
    np.testing.assert_allclose(preds, np.concatenate(oracle), atol=1e-5)


def test_predict_rejects_records_exceeding_bucket(tmp_path, records):
    small = [r for r in records if r.n_nodes <= 16]
    big = [r for r in records if r.n_nodes > 16]
    assert small and big, "fixture should span the 16-node boundary"
    batch = graphs.make_dense_batch(small[:4], n_max=16, batch_size=4, task=0)
    model = models.GNNSimple(n_features=2, n_layers=2, J=1)
    variables = model.init(jax.random.key(2), batch, train=False)
    exp = serving.export_model(model, variables, batch, platforms=("cpu",))
    serving.save_bundle(str(tmp_path / "b"), exp, kind="dense", task=0)
    sm = serving.load_bundle(str(tmp_path / "b"))
    with pytest.raises(ValueError, match="serving bucket"):
        sm.predict(small + big)
    assert sm.predict(small[:4]).shape == (4,)


def test_ccn_export_roundtrip(tmp_path, records):
    cb = ccn_mod.make_ccn_batch(records[:4], task=0)
    model = ccn_mod.CCN1D(hidden=3, n_layers=2, dim_output=1)
    variables = model.init(jax.random.key(3), cb, train=False)
    direct = np.asarray(model.apply(variables, cb, train=False))
    exp = serving.export_model(model, variables, cb, platforms=("cpu",))
    serving.save_bundle(str(tmp_path / "b"), exp, kind="ccn", task=0)
    sm = serving.load_bundle(str(tmp_path / "b"))
    assert sm.kind == "ccn"
    out = np.asarray(sm.call(serving.batch_to_arrays(cb)))
    np.testing.assert_allclose(out, direct, atol=1e-6)


def test_ccn_predict_chunks_packs_denormalizes(tmp_path, records):
    """CCN bundles serve raw GraphRecords: chunked into the exported
    (V, K, B) bucket, padded, denormalized — mirroring the dense path."""
    mean, std = 2.0, 3.0
    k_max = max(r.max_degree() + 1 for r in records)
    v_cap = 128
    bsz = 4
    sample = ccn_mod.make_ccn_batch(
        records[:bsz], k_max=k_max, vertex_capacity=v_cap, task=0,
        batch_size=bsz,
    )
    model = ccn_mod.CCN1D(hidden=3, n_layers=2, dim_output=1)
    variables = model.init(jax.random.key(4), sample, train=False)
    exp = serving.export_model(model, variables, sample, platforms=("cpu",))
    serving.save_bundle(str(tmp_path / "b"), exp, kind="ccn", task=0,
                        mean=mean, std=std)
    sm = serving.load_bundle(str(tmp_path / "b"))

    preds = sm.predict(records)
    assert preds.shape == (len(records),)
    # per-graph readouts are independent: a one-record batch is the oracle
    for i, r in enumerate(records):
        b = ccn_mod.make_ccn_batch(
            [r], k_max=k_max, vertex_capacity=v_cap, task=0, batch_size=bsz
        )
        o = float(np.asarray(model.apply(variables, b, train=False))[0, 0])
        np.testing.assert_allclose(preds[i], o * std + mean, rtol=1e-4)


def test_packed_predict_chunks_packs_denormalizes(tmp_path, records):
    """Packed (flat segment-sum) bundles export and serve GraphRecords."""
    from hgnn2_tpu.nn import packed

    mean, std = -1.0, 0.5
    v_cap, e_cap, bsz = 128, 512, 4
    sample = graphs.make_packed_batch(
        records[:bsz], node_capacity=v_cap, edge_capacity=e_cap, task=0,
        batch_size=bsz,
    )
    model = packed.PackedLGGNN(n_features=2, n_layers=2, J=1, order=2)
    variables = model.init(jax.random.key(5), sample, train=False)
    exp = serving.export_model(model, variables, sample, platforms=("cpu",))
    serving.save_bundle(str(tmp_path / "b"), exp, kind="packed", task=0,
                        mean=mean, std=std)
    sm = serving.load_bundle(str(tmp_path / "b"))
    assert "y" not in sm.meta["input_spec"]

    preds = sm.predict(records)
    assert preds.shape == (len(records),)
    for i, r in enumerate(records):
        b = graphs.make_packed_batch(
            [r], node_capacity=v_cap, edge_capacity=e_cap, task=0,
            batch_size=bsz,
        )
        o = float(np.asarray(model.apply(variables, b, train=False))[0, 0])
        np.testing.assert_allclose(preds[i], o * std + mean, rtol=1e-4)


def test_packed_predict_rejects_oversized_record(tmp_path, records):
    from hgnn2_tpu.nn import packed

    small = sorted(records, key=lambda r: r.n_dir_edges)[:2]
    cap = sum(r.n_dir_edges for r in small) + 2
    sample = graphs.make_packed_batch(
        small, node_capacity=48, edge_capacity=cap, task=0, batch_size=2
    )
    model = packed.PackedGNN(n_features=2, n_layers=2, J=1)
    variables = model.init(jax.random.key(6), sample, train=False)
    exp = serving.export_model(model, variables, sample, platforms=("cpu",))
    serving.save_bundle(str(tmp_path / "b"), exp, kind="packed", task=0)
    sm = serving.load_bundle(str(tmp_path / "b"))
    big = [r for r in records if r.n_dir_edges > cap]
    assert big, "fixture should contain records above the tiny bucket"
    with pytest.raises(ValueError, match="packed capacities"):
        sm.predict(big)


# ---- multi-bucket bundles (round 5): chunk-to-bucket routing ----------

def _counting_programs(sm):
    """Wrap each bucket program with a call counter keyed by slot count."""
    counts = {}

    def wrap(spec, jitted):
        key = serving.ServingModel._slots(spec)

        def call(arrays, _j=jitted, _k=key):
            counts[_k] = counts.get(_k, 0) + 1
            return _j(arrays)

        return spec, call

    sm._programs = [wrap(*p) for p in sm._programs]
    return counts


def test_dense_multi_bucket_routing(tmp_path, records):
    model = models.GNNSimple(n_features=2, n_layers=3, J=1)
    mk = lambda b: graphs.make_dense_batch(
        records[:b], n_max=32, batch_size=b, task=0)
    variables = model.init(jax.random.key(0), mk(4), train=False)
    exps = [serving.export_model(model, variables, mk(b),
                                 platforms=("cpu",)) for b in (4, 16)]
    serving.save_bundle(str(tmp_path / "b"), exps, kind="dense", task=0,
                        mean=1.0, std=2.0)
    sm = serving.load_bundle(str(tmp_path / "b"))
    assert len(sm._programs) == 2
    counts = _counting_programs(sm)
    # 21 records -> fill the 16-bucket, then ONE padded 16-call for the
    # 5-record tail (one round trip beats two 4-slot calls)
    out = sm.predict(records)
    assert counts == {16: 2}
    counts.clear()
    out3 = sm.predict(records[:3])  # small request -> the small bucket
    assert counts == {4: 1}
    np.testing.assert_allclose(out3, out[:3], rtol=1e-5, atol=1e-5)

    # single-bucket bundle serves identical values (eval-mode forward is
    # per-record; only the chunking differs)
    serving.save_bundle(str(tmp_path / "s"), exps[0], kind="dense", task=0,
                        mean=1.0, std=2.0)
    ref = serving.load_bundle(str(tmp_path / "s")).predict(records)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_packed_multi_bucket_routing(tmp_path, records):
    from hgnn2_tpu.nn import packed as packed_mod

    caps = {4: (80, 160), 16: (320, 640)}
    mk = lambda b: graphs.make_packed_batch(
        records[:b], node_capacity=caps[b][0], edge_capacity=caps[b][1],
        batch_size=b, task=0)
    model = packed_mod.PackedGNN(n_features=2, n_layers=3, J=1)
    variables = model.init(jax.random.key(1), mk(4), train=False)
    exps = [serving.export_model(model, variables, mk(b),
                                 platforms=("cpu",)) for b in (16, 4)]
    serving.save_bundle(str(tmp_path / "b"), exps, kind="packed", task=0)
    sm = serving.load_bundle(str(tmp_path / "b"))
    counts = _counting_programs(sm)
    reqs = records[:18]  # 16-slot head chunk + 2-record tail
    out = sm.predict(reqs)
    assert len(out) == len(reqs)
    assert np.isfinite(out).all()
    # the big bucket served the head, the small bucket the tail
    assert counts == {16: 1, 4: 1}

    serving.save_bundle(str(tmp_path / "s"), exps[0], kind="packed", task=0)
    ref = serving.load_bundle(str(tmp_path / "s")).predict(reqs)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_ccn_multi_bucket_routing(tmp_path, records):
    k_all = max(r.max_degree() for r in records) + 1
    mk = lambda b: ccn_mod.make_ccn_batch(
        records[:b], k_max=k_all,
        vertex_capacity=sum(r.n_nodes for r in records[:b]) + 8,
        task=0, batch_size=b)
    model = ccn_mod.CCN1D(hidden=2, n_layers=2)
    variables = model.init(jax.random.key(2), mk(4), train=False)
    exps = [serving.export_model(model, variables, mk(b),
                                 platforms=("cpu",)) for b in (4, 16)]
    serving.save_bundle(str(tmp_path / "b"), exps, kind="ccn", task=0)
    sm = serving.load_bundle(str(tmp_path / "b"))
    counts = _counting_programs(sm)
    out = sm.predict(records)
    assert len(out) == len(records) and np.isfinite(out).all()
    assert counts.get(16, 0) >= 1

    serving.save_bundle(str(tmp_path / "s"), exps[0], kind="ccn", task=0)
    ref = serving.load_bundle(str(tmp_path / "s")).predict(records)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_multi_bucket_mismatched_specs_rejected(tmp_path, records):
    model = models.GNNSimple(n_features=2, n_layers=3, J=1)
    small = [r for r in records if r.n_nodes <= 16]
    mk = lambda recs, b, n: graphs.make_dense_batch(
        recs[:b], n_max=n, batch_size=b, task=0)
    variables = model.init(jax.random.key(0), mk(records, 4, 32),
                           train=False)
    e32 = serving.export_model(model, variables, mk(records, 4, 32),
                               platforms=("cpu",))
    e16 = serving.export_model(model, variables, mk(small, 8, 16),
                               platforms=("cpu",))
    with pytest.raises(ValueError, match="capacity dim"):
        serving.save_bundle(str(tmp_path / "b"), [e32, e16], kind="dense")
