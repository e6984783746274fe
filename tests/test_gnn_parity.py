"""Per-layer/model activation parity against the reference torch models.

Weights are generated in torch, copied into the flax params, and both models
run in train mode on identical batches. Compat flags reproduce the
reference's BN/readout quirks so outputs must agree to float tolerance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hgnn2_tpu import graphs, operators
from hgnn2_tpu.nn import models
from hgnn2_tpu.nn.bundles import MaterializedBundle
from hgnn2_tpu.nn.layers import CompatConfig
from tests.conftest import random_adjacency


def _records(rng, sizes, F=5):
    recs = []
    for n in sizes:
        A = random_adjacency(rng, n, 0.5, weighted=True)
        x = rng.standard_normal((n, F)).astype(np.float32)
        recs.append(graphs.GraphRecord(x=x, adj=A, y=np.zeros(13, np.float32)))
    return recs


def _conv_to_dense(conv):
    """torch Conv1d(out,in,1) -> (kernel (in,out), bias (out,))."""
    w = conv.weight.detach().numpy()
    return w[:, :, 0].T.copy(), conv.bias.detach().numpy().copy()


def _copy_simple_params(gnn_t, params, L):
    """Copy reference GNN_simple weights into our flax params dict."""
    import torch  # noqa: F401

    p = jax.tree_util.tree_map(np.asarray, params)
    names = ["layer0"] + [f"layer{i+1}" for i in range(L - 2)]
    for name in names:
        layer_t = getattr(gnn_t, name) if name == "layer0" else gnn_t._modules[name]
        k1, b1 = _conv_to_dense(layer_t.cv1)
        k2, b2 = _conv_to_dense(layer_t.cv2)
        p[name]["cv1"]["kernel"] = k1
        p[name]["cv1"]["bias"] = b1
        p[name]["cv2"]["kernel"] = k2
        p[name]["cv2"]["bias"] = b2
        p[name]["bn"]["scale"] = layer_t.bn1.weight.detach().numpy().copy()
        p[name]["bn"]["bias"] = layer_t.bn1.bias.detach().numpy().copy()
    kf, bf = _conv_to_dense(gnn_t.layerlast.fc)
    p["layerlast"]["fc"]["kernel"] = kf
    p["layerlast"]["fc"]["bias"] = bf
    return jax.tree_util.tree_map(jnp.asarray, p)


def _prepare_ref_batch(reference_path, recs, task=0, J=1):
    """Run the reference prepare_batch on 7-tuples built with its own
    (buggy) operator builder."""
    import torch
    from functions.operators import graph_operators
    from functions.batching import prepare_batch

    data = []
    for r in recs:
        x_t = torch.from_numpy(r.x)
        a_t = torch.from_numpy(r.adj)
        W, WL, Pm, Pd = graph_operators([x_t, a_t], J=J, dual=True)
        t = torch.zeros(13)
        data.append([x_t, a_t, t, W, WL, Pm, Pd])
    return prepare_batch(data, task, J)


@pytest.mark.parametrize("L,h,J", [(3, 2, 1), (4, 3, 2)])
def test_gnn_simple_forward_parity(reference_path, rng, L, h, J):
    import torch
    from models.gnns import model_mnb

    recs = _records(rng, [6, 8, 5])
    X, W, T, XL, WL, Pm, Pd, mask, mask_lg, N_batch, E_batch = _prepare_ref_batch(
        reference_path, recs, J=J
    )
    torch.manual_seed(0)
    gnn_t = model_mnb.GNN_simple(0, h, L, 5, 1, J)
    gnn_t.train()
    with torch.no_grad():
        ref_out = gnn_t([X.clone(), W.clone()], N_batch, mask).numpy()

    batch = graphs.make_dense_batch(recs, task=0)
    model = models.GNNSimple(
        n_features=h, n_layers=L, dim_output=1, J=J, compat=CompatConfig.reference()
    )
    variables = model.init(jax.random.key(0), batch, train=True)
    params = _copy_simple_params(gnn_t, variables["params"], L)
    out, _ = model.apply(
        {"params": params, "batch_stats": variables["batch_stats"]},
        batch,
        train=True,
        mutable=["batch_stats"],
    )
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-4, rtol=1e-4)


def _copy_lg_params(gnn_t, params, L):
    p = jax.tree_util.tree_map(np.asarray, params)
    names = ["layer0"] + [f"layer{i+1}" for i in range(L - 2)]
    for name in names:
        lt = getattr(gnn_t, name) if name == "layer0" else gnn_t._modules[name]
        for ours, theirs, bn_ours, bn_theirs in [
            ("node_cv1", lt.cv1, None, None),
            ("node_cv2", lt.cv2, None, None),
            ("edge_cv1", lt.cv3, None, None),
            ("edge_cv2", lt.cv4, None, None),
        ]:
            k, b = _conv_to_dense(theirs)
            p[name][ours]["kernel"] = k
            p[name][ours]["bias"] = b
        p[name]["node_bn"]["scale"] = lt.bn1.weight.detach().numpy().copy()
        p[name]["node_bn"]["bias"] = lt.bn1.bias.detach().numpy().copy()
        p[name]["edge_bn"]["scale"] = lt.bn2.weight.detach().numpy().copy()
        p[name]["edge_bn"]["bias"] = lt.bn2.bias.detach().numpy().copy()
    kf, bf = _conv_to_dense(gnn_t.layerlast.fc)
    p["layerlast"]["fc"]["kernel"] = kf
    p["layerlast"]["fc"]["bias"] = bf
    return jax.tree_util.tree_map(jnp.asarray, p)


@pytest.mark.parametrize("order", [1, 2, 3])
def test_gnn_lg_forward_parity(reference_path, rng, order):
    """Line-graph model parity using the reference's own (buggy) operator
    tensors through a MaterializedBundle."""
    import torch
    from models.gnns import model_mnb

    L, h, J = 3, 2, 1
    recs = _records(rng, [6, 7])
    X, W, T, XL, WL, Pm, Pd, mask, mask_lg, N_batch, E_batch = _prepare_ref_batch(
        reference_path, recs, J=J
    )
    torch.manual_seed(1)
    # reference signature: GNN_lg(task, n_features, n_layers, dim_input,
    # dim_output, J, order)
    gnn_t = model_mnb.GNN_lg(0, h, L, 5, 1, J, order)
    gnn_t.train()
    with torch.no_grad():
        ref_out = gnn_t(
            [X.clone(), XL.clone(), W.clone(), WL.clone(), Pm.clone(), Pd.clone()],
            N_batch,
            mask,
            E_batch,
            mask_lg,
        ).numpy()

    batch = graphs.make_dense_batch(recs, task=0)
    batch = batch.replace(edge_mask=jnp.asarray(mask_lg[:, :, 0].numpy()))
    bundle = MaterializedBundle(
        W=jnp.asarray(W.numpy().transpose(0, 1, 2, 3)),
        WL=jnp.asarray(WL.numpy()),
        Pm=jnp.asarray(Pm.numpy()),
        Pd=jnp.asarray(Pd.numpy()),
    )
    model = models.GNNLineGraph(
        n_features=h, n_layers=L, dim_output=1, J=J, order=order,
        compat=CompatConfig.reference(),
    )
    variables = model.init(jax.random.key(0), batch, train=True, bundle=bundle)
    params = _copy_lg_params(gnn_t, variables["params"], L)
    out, _ = model.apply(
        {"params": params, "batch_stats": variables["batch_stats"]},
        batch,
        train=True,
        bundle=bundle,
        mutable=["batch_stats"],
    )
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=3e-4, rtol=1e-4)


def test_gru_update_forward_parity(reference_path, rng):
    """Our GRUUpdate matches the reference torch module bit-for-bit
    (models/layers/gru_update.py:24-33): same ih/hh parameterization,
    same (r, z, n) chunk order, o = (1-z)*n + z*h."""
    import torch
    from models.layers.gru_update import GRUUpdate as GRUUpdateT

    from hgnn2_tpu.nn.layers import GRUUpdate

    fmap_in, fmap_out, B, N = 7, 4, 3, 6
    torch.manual_seed(0)
    gru_t = GRUUpdateT(fmap_in, fmap_out)
    x = rng.standard_normal((B, N, fmap_in)).astype(np.float32)
    h = rng.standard_normal((B, N, fmap_out)).astype(np.float32)
    with torch.no_grad():
        ref = gru_t(torch.from_numpy(x), torch.from_numpy(h)).numpy()

    gru = GRUUpdate(features=fmap_out)
    variables = gru.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(h))
    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    p["ih"]["kernel"] = gru_t.ih.weight.detach().numpy().T.copy()
    p["ih"]["bias"] = gru_t.ih.bias.detach().numpy().copy()
    p["hh"]["kernel"] = gru_t.hh.weight.detach().numpy().T.copy()
    p["hh"]["bias"] = gru_t.hh.bias.detach().numpy().copy()
    out = gru.apply({"params": jax.tree_util.tree_map(jnp.asarray, p)},
                    jnp.asarray(x), jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


def test_gnn_gru_trains(rng):
    """GNNSimple(gru=True) constructs per-layer GRUUpdate params, its
    forward differs from the ungated model, and a few optimizer steps
    train it to a finite, decreasing loss with gradients reaching the
    gru parameters."""
    import optax

    recs = _records(rng, [6, 8, 5, 7])
    batch = graphs.make_dense_batch(recs, task=0)
    model = models.GNNSimple(n_features=3, n_layers=3, dim_output=1, gru=True)
    variables = model.init(jax.random.key(0), batch, train=True)
    assert "gru" in variables["params"]["layer0"]  # constructed, not dead
    out_g, _ = model.apply(variables, batch, train=True,
                           mutable=["batch_stats"])

    plain = models.GNNSimple(n_features=3, n_layers=3, dim_output=1)
    vp = plain.init(jax.random.key(0), batch, train=True)
    # shared submodules initialize identically; the gated forward differs
    out_p, _ = plain.apply(vp, batch, train=True, mutable=["batch_stats"])
    assert not np.allclose(np.asarray(out_g), np.asarray(out_p))

    y = jnp.asarray(rng.standard_normal(batch.y.shape).astype(np.float32))
    tx = optax.adamax(1e-3)
    params, bstats = variables["params"], variables["batch_stats"]
    opt_state = tx.init(params)

    def loss_fn(p, bs):
        out, upd = model.apply({"params": p, "batch_stats": bs}, batch,
                               train=True, mutable=["batch_stats"])
        return jnp.mean((out[:, 0] - y) ** 2), upd["batch_stats"]

    losses = []
    for _ in range(15):
        (loss, bstats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, bstats)
        g_gru = jax.tree_util.tree_leaves(grads["layer0"]["gru"])
        assert any(float(jnp.abs(g).max()) > 0 for g in g_gru)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_bn_running_stats_and_eval(rng):
    """Running stats follow running <- 0.9*batch + 0.1*running and eval
    uses them (reference batch_normalization.py:34-43)."""
    from hgnn2_tpu.nn.layers import MaskedBatchNorm

    bn = MaskedBatchNorm()
    h = jnp.asarray(rng.standard_normal((2, 4, 3)).astype(np.float32))
    mask = jnp.ones((2, 4))
    variables = bn.init(jax.random.key(0), h, mask, True)
    _, s1 = bn.apply(variables, h, mask, True, mutable=["batch_stats"])
    mean1 = np.asarray(s1["batch_stats"]["mean"])
    np.testing.assert_allclose(mean1, 0.9 * np.asarray(h).mean((0, 1)), atol=1e-5)
    # eval mode uses running stats
    out_eval = bn.apply(
        {"params": variables["params"], "batch_stats": s1["batch_stats"]},
        h, mask, False,
    )
    assert np.isfinite(np.asarray(out_eval)).all()


def test_gnn_permutation_invariance(rng):
    """Relabeling nodes leaves the (correct-mode) model output unchanged."""
    recs = _records(rng, [7])
    batch = graphs.make_dense_batch(recs, task=0)
    model = models.GNNSimple(n_features=3, n_layers=3, dim_output=1, J=2)
    variables = model.init(jax.random.key(0), batch, train=True)
    out1, _ = model.apply(variables, batch, train=True, mutable=["batch_stats"])

    perm = rng.permutation(7)
    r = recs[0]
    rp = graphs.GraphRecord(x=r.x[perm], adj=r.adj[perm][:, perm], y=r.y)
    batch_p = graphs.make_dense_batch([rp], task=0)
    out2, _ = model.apply(variables, batch_p, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-4)
