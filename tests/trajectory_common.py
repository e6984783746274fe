"""Shared harness for TRAINING-TRAJECTORY parity against the reference.

Trains the reference torch GNN_simple (CPU, via its own train/eval loops
scripts/train_mnb.py:25 / scripts/test_mnb.py:25 and its per-epoch
optimizer-re-creation + lr-damping schedule, main_gnn_qm9.py:185,204-205)
and this framework's GNNSimple from IDENTICAL initial weights on an
IDENTICAL committed fixture set with identical batch composition, and
returns per-epoch metric curves from both. Used by
scripts/parity_trajectory.py (full run, PARITY.md artifact) and
tests/test_trajectory_parity.py (short tolerance-asserted run).
"""

from __future__ import annotations

import copy
import os
import sys

import numpy as np

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "parity_molecules.npz")
REFERENCE_PATH = "/root/reference"


# ---------------------------------------------------------------------------
# Fixture: committed, deterministic molecule set.
# ---------------------------------------------------------------------------


def make_fixture(n=192, seed=3, path=FIXTURE):
    """Random weighted graphs (5-12 nodes, 5 features) with a learnable
    graph-level target (mean degree + feature mean + small noise) stored at
    task index 0 of a 13-vector (reference target layout)."""
    rng = np.random.default_rng(seed)
    xs, adjs, ys, sizes = [], [], [], []
    for _ in range(n):
        k = int(rng.integers(5, 13))
        a = (rng.random((k, k)) < 0.5).astype(np.float32)
        a *= rng.integers(1, 4, (k, k)).astype(np.float32)
        a = np.triu(a, 1)
        a[0, 1] = max(a[0, 1], 1.0)
        a = a + a.T
        x = rng.standard_normal((k, 5)).astype(np.float32)
        y = np.zeros(13, np.float32)
        y[0] = a.sum() / k + x.mean() + 0.1 * rng.standard_normal()
        xs.append(x)
        adjs.append(a)
        ys.append(y)
        sizes.append(k)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(
        path,
        sizes=np.asarray(sizes, np.int32),
        x=np.concatenate(xs, axis=0),
        adj=np.concatenate([a.reshape(-1) for a in adjs]),
        y=np.stack(ys),
    )
    return path


def load_fixture(path=FIXTURE):
    from hgnn2_tpu import graphs

    z = np.load(path)
    sizes = z["sizes"]
    recs = []
    xo = ao = 0
    for i, k in enumerate(sizes):
        k = int(k)
        x = z["x"][xo : xo + k]
        adj = z["adj"][ao : ao + k * k].reshape(k, k)
        recs.append(graphs.GraphRecord(x=x, adj=adj, y=z["y"][i]))
        xo += k
        ao += k * k
    return recs


def split_fixture(recs, n_train=160):
    return recs[:n_train], recs[n_train:]


# ---------------------------------------------------------------------------
# Reference side.
# ---------------------------------------------------------------------------


def _ref_paths():
    for p in (REFERENCE_PATH, os.path.join(REFERENCE_PATH, "scripts")):
        if p not in sys.path:
            sys.path.insert(0, p)


def build_reference_model(h, L, J, dim_input=5, task=0, seed=0,
                          arch="gnn", order=2):
    """Fresh reference GNN_simple / GNN_lg with a deterministic torch init;
    returns (live model, frozen deepcopy of the initial weights)."""
    _ref_paths()
    import torch
    from models.gnns import model_mnb

    torch.manual_seed(seed)
    if arch == "lggnn":
        gnn = model_mnb.GNN_lg(task, h, L, dim_input, 1, J, order)
    else:
        gnn = model_mnb.GNN_simple(task, h, L, dim_input, 1, J)
    return gnn, copy.deepcopy(gnn)


def to_reference_data(recs, J):
    _ref_paths()
    import torch
    from functions.operators import graph_operators

    data = []
    for r in recs:
        x_t = torch.from_numpy(np.ascontiguousarray(r.x))
        a_t = torch.from_numpy(np.ascontiguousarray(r.adj))
        W, WL, Pm, Pd = graph_operators([x_t, a_t], J=J, dual=True)
        t = torch.from_numpy(np.ascontiguousarray(r.y.astype(np.float32)))
        data.append([x_t, a_t, t, W, WL, Pm, Pd])
    return data


def target_stats(recs, task=0):
    """mean/std exactly as the reference's data_stats (functions/utils.py:105)."""
    ys = np.asarray([r.y[task] for r in recs], np.float32)
    return float(ys.mean()), float(1e-5 + ys.std(ddof=1))


def run_reference(gnn, recs_tr, recs_va, *, bs, lr, epochs, epoch_step=5,
                  damping=0.9, task=0):
    _ref_paths()
    import torch.nn as nn
    from torch import optim
    import train_mnb
    import test_mnb

    train_data = to_reference_data(recs_tr, gnn.J)
    val_data = to_reference_data(recs_va, gnn.J)
    mean, std = target_stats(recs_tr, task)
    criterion = nn.MSELoss()
    hist = []
    cur_lr = lr
    for epoch in range(epochs):
        # reference schedule: damp THEN re-create the optimizer
        # (main_gnn_qm9.py:185,204-205 — moments reset every epoch)
        if epoch != 0 and epoch % epoch_step == 0:
            cur_lr *= damping
        optimizer = optim.Adamax(gnn.parameters(), lr=cur_lr)
        tr_loss, tr_mae = train_mnb.train_with_mnb(
            gnn, train_data, task, criterion, optimizer, False, bs, mean, std
        )
        va_loss, va_mae = test_mnb.test_with_mnb(
            gnn, val_data, task, criterion, False, bs, mean, std, None
        )
        hist.append({
            "train_loss_ema": float(tr_loss),
            "train_mae_ema": float(tr_mae),
            "val_loss": float(va_loss),
            "val_mae": float(va_mae),
        })
    return {"mean": mean, "std": std, "history": hist}


# ---------------------------------------------------------------------------
# Our side.
# ---------------------------------------------------------------------------


def run_ours(torch_init, recs_tr, recs_va, *, h, L, J, bs, lr, epochs,
             epoch_step=5, damping=0.9, task=0, arch="gnn", order=2):
    """Same schedule/loss/batches as run_reference, initial weights copied
    from the torch model's init snapshot. arch='lggnn' runs the line-graph
    model over the reference's own (buggy) operator tensors via
    MaterializedBundle so the trajectories are bit-comparable."""
    import jax
    import jax.numpy as jnp
    import optax

    from hgnn2_tpu import graphs
    from hgnn2_tpu.nn import models
    from hgnn2_tpu.nn.bundles import MaterializedBundle
    from hgnn2_tpu.nn.layers import CompatConfig
    from tests.test_gnn_parity import (_copy_lg_params, _copy_simple_params,
                                       _prepare_ref_batch)

    mean, std = target_stats(recs_tr, task)
    if arch == "lggnn":
        model = models.GNNLineGraph(
            n_features=h, n_layers=L, dim_output=1, J=J, order=order,
            compat=CompatConfig.reference(),
        )
    else:
        model = models.GNNSimple(
            n_features=h, n_layers=L, dim_output=1, J=J,
            compat=CompatConfig.reference(),
        )

    def _batches(recs):
        # pad each batch to ITS OWN Nmax exactly like the reference's
        # prepare_batch: in compat mode the readout bias enters the sum
        # Nmax times (mask_readout_bias=False), so padding width is part
        # of the math being matched — bucketed padding would diverge.
        # For the line-graph model, consume the reference's own operator
        # tensors (including its edge-indexing bug) through a bundle.
        out = []
        for s in range(0, len(recs), bs):
            chunk = recs[s : s + bs]
            batch = graphs.make_dense_batch(chunk, task=task)
            barrs = None
            if arch == "lggnn":
                (X, W, T, XL, WL, Pm, Pd, mask, mask_lg, N_batch,
                 E_batch) = _prepare_ref_batch(REFERENCE_PATH, chunk, J=J)
                batch = batch.replace(
                    edge_mask=jnp.asarray(mask_lg[:, :, 0].numpy()))
                # bundle fields as a plain tuple (jit-traceable); the
                # MaterializedBundle is rebuilt inside the step
                barrs = (jnp.asarray(W.numpy()), jnp.asarray(WL.numpy()),
                         jnp.asarray(Pm.numpy()), jnp.asarray(Pd.numpy()))
            out.append((batch, barrs))
        return out

    tr_batches = _batches(recs_tr)
    va_batches = _batches(recs_va)

    def _bundle(barrs):
        return None if barrs is None else MaterializedBundle(*barrs)

    b0, barrs0 = tr_batches[0]
    variables = model.init(jax.random.key(0), b0, train=True,
                           bundle=_bundle(barrs0))
    if arch == "lggnn":
        params = _copy_lg_params(torch_init, variables["params"], L)
    else:
        params = _copy_simple_params(torch_init, variables["params"], L)
    bstats = variables["batch_stats"]
    tx = optax.inject_hyperparams(optax.adamax)(learning_rate=lr)

    def _metrics(out, batch):
        gm = (batch.n_nodes > 0).astype(jnp.float32)
        den = jnp.maximum(gm.sum(), 1.0)
        t = (batch.y - mean) / std
        err = out[:, 0] - t
        return ((err**2) * gm).sum() / den, (jnp.abs(err) * gm).sum() / den

    @jax.jit
    def train_step(params, bstats, opt_state, batch, barrs):
        def loss_fn(p):
            out, upd = model.apply(
                {"params": p, "batch_stats": bstats}, batch, train=True,
                bundle=_bundle(barrs), mutable=["batch_stats"],
            )
            loss, mae = _metrics(out, batch)
            return loss, (mae, upd["batch_stats"])

        (loss, (mae, bstats2)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), bstats2, opt_state, loss, mae

    @jax.jit
    def eval_step(params, bstats, batch, barrs):
        out = model.apply(
            {"params": params, "batch_stats": bstats}, batch, train=False,
            bundle=_bundle(barrs))
        return _metrics(out, batch)

    def ema(prev, new):
        return new if prev == 0.0 else 0.9 * new + 0.1 * prev

    hist = []
    cur_lr = lr
    for epoch in range(epochs):
        if epoch != 0 and epoch % epoch_step == 0:
            cur_lr *= damping
        opt_state = tx.init(params)  # fresh moments, like the reference
        opt_state.hyperparams["learning_rate"] = jnp.asarray(
            cur_lr, jnp.float32)
        loss_ema = mae_ema = 0.0
        for batch, barrs in tr_batches:
            params, bstats, opt_state, loss, mae = train_step(
                params, bstats, opt_state, batch, barrs)
            loss_ema = ema(loss_ema, float(loss))
            mae_ema = ema(mae_ema, float(mae))
        vl = vm = vn = 0.0
        for batch, barrs in va_batches:
            loss, mae = eval_step(params, bstats, batch, barrs)
            k = float(np.asarray((batch.n_nodes > 0)).sum())
            vl += float(loss) * k
            vm += float(mae) * k
            vn += k
        hist.append({
            "train_loss_ema": loss_ema,
            "train_mae_ema": mae_ema,
            "val_loss": vl / vn,
            "val_mae": vm / vn,
        })
    return {"mean": mean, "std": std, "history": hist}


# ---------------------------------------------------------------------------
# CCN trajectory parity (reference scripts/train_ccn.py:24 / test_ccn.py:23
# — per-molecule optimizer steps, bs=1, Adamax re-created every epoch).
# ---------------------------------------------------------------------------


def _patch_ccn_utils():
    """Modern-torch shim for the reference's _get_chi emptiness check (its
    nonzero().shape test predates torch's 2-D nonzero result) — same math,
    mirrors tests/conftest.reference_ccn_utils for non-pytest callers."""
    import torch
    from functions.utils_ccn import CompnetUtils

    def _get_chi(self, i, j):
        di = self.deg[i].item()
        dj = self.deg[j].item()
        chi = torch.zeros(di, dj)
        for k in range(di):
            ind_i = self.neighbors[i][k].item()
            ind_j = (self.neighbors[j] == ind_i).nonzero()
            if ind_j.numel() > 0:
                chi[k, ind_j.item()] = 1
        return chi

    CompnetUtils._get_chi = _get_chi


def build_reference_ccn(h, L, dim_input=5, seed=0):
    _ref_paths()
    import torch
    from models.compnets.model_ccn import CCN_1D

    _patch_ccn_utils()
    torch.manual_seed(seed)
    net = CCN_1D(input_feats=dim_input, n_outputs=1, hidden_size=h, layers=L)
    return net, copy.deepcopy(net)


def _to_ccn_data(recs):
    import torch

    z = torch.zeros(1)
    return [[torch.from_numpy(np.ascontiguousarray(r.x)),
             torch.from_numpy(np.ascontiguousarray(r.adj)),
             torch.from_numpy(np.ascontiguousarray(r.y.astype(np.float32))),
             z, z, z, z] for r in recs]


def run_reference_ccn(net, recs_tr, recs_va, *, lr, epochs, epoch_step=5,
                      damping=0.9, task=0):
    _ref_paths()
    import importlib.util

    import torch.nn as nn
    from torch import optim
    import train_ccn as train_ccn_mod

    # "import test_ccn" would collide with OUR tests/test_ccn.py (pytest
    # imports it as a top-level module) — load the reference loop by path
    spec = importlib.util.spec_from_file_location(
        "hgnn2_ref_test_ccn",
        os.path.join(REFERENCE_PATH, "scripts", "test_ccn.py"))
    test_ccn_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(test_ccn_mod)

    tr = _to_ccn_data(recs_tr)
    va = _to_ccn_data(recs_va)
    mean, std = target_stats(recs_tr, task)
    criterion = nn.MSELoss()
    hist = []
    cur_lr = lr
    for epoch in range(epochs):
        if epoch != 0 and epoch % epoch_step == 0:
            cur_lr *= damping
        optimizer = optim.Adamax(net.parameters(), lr=cur_lr)
        tr_loss, tr_err = train_ccn_mod.train_ccn(
            net, tr, task, criterion, optimizer, False, mean, std)
        va_loss, va_err, _ = test_ccn_mod.test_ccn(
            net, va, task, criterion, False, mean, std, None)
        hist.append({"train_loss_ema": float(tr_loss),
                     "train_mae_ema": float(tr_err),
                     "val_loss": float(va_loss), "val_mae": float(va_err)})
    return {"mean": mean, "std": std, "history": hist}


def run_ours_ccn(torch_init, recs_tr, recs_va, *, h, L, lr, epochs,
                 epoch_step=5, damping=0.9, task=0):
    """Per-molecule (bs=1) steps in the reference's order, weights copied
    from the torch init snapshot, same per-epoch Adamax re-creation."""
    import jax
    import jax.numpy as jnp
    import optax

    from hgnn2_tpu.nn import ccn as ccn_mod
    from tests.test_ccn import _copy_ccn_params

    mean, std = target_stats(recs_tr, task)
    model = ccn_mod.CCN1D(hidden=h, n_layers=L, dim_output=1)
    all_recs = list(recs_tr) + list(recs_va)
    k_max = max(r.max_degree() + 1 for r in all_recs)
    vcap = max(r.n_nodes for r in all_recs)

    def batch(r):
        return ccn_mod.make_ccn_batch(
            [r], k_max=k_max, vertex_capacity=vcap, add_self_loops=True,
            task=task)

    tr_batches = [batch(r) for r in recs_tr]
    va_batches = [batch(r) for r in recs_va]

    variables = model.init(jax.random.key(0), tr_batches[0], train=True)
    params = _copy_ccn_params(torch_init, variables["params"], L)
    tx = optax.inject_hyperparams(optax.adamax)(learning_rate=lr)

    def _err(out, cb):
        t = (cb.y[0] - mean) / (std + 1e-8)
        d = out[0, 0] - t
        return d**2, jnp.abs(d)

    @jax.jit
    def train_step(params, opt_state, cb):
        def loss_fn(p):
            out = model.apply({"params": p}, cb, train=True)
            loss, mae = _err(out, cb)
            return loss, mae

        (loss, mae), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, mae

    @jax.jit
    def eval_step(params, cb):
        out = model.apply({"params": params}, cb, train=False)
        return _err(out, cb)

    def ema(prev, new):
        return new if prev == 0.0 else 0.9 * new + 0.1 * prev

    hist = []
    cur_lr = lr
    for epoch in range(epochs):
        if epoch != 0 and epoch % epoch_step == 0:
            cur_lr *= damping
        opt_state = tx.init(params)  # fresh moments, like the reference
        opt_state.hyperparams["learning_rate"] = jnp.asarray(
            cur_lr, jnp.float32)
        loss_ema = mae_ema = 0.0
        for cb in tr_batches:
            params, opt_state, loss, mae = train_step(params, opt_state, cb)
            loss_ema = ema(loss_ema, float(loss))
            mae_ema = ema(mae_ema, float(mae))
        vl = vm = 0.0
        for cb in va_batches:
            loss, mae = eval_step(params, cb)
            vl += float(loss)
            vm += float(mae)
        hist.append({"train_loss_ema": loss_ema, "train_mae_ema": mae_ema,
                     "val_loss": vl / len(va_batches),
                     "val_mae": vm / len(va_batches)})
    return {"mean": mean, "std": std, "history": hist}


def run_both_ccn(*, h=4, L=2, lr=1e-3, epochs=3, n_mol=48, task=0):
    recs = load_fixture()[:n_mol]
    n_train = int(0.8 * n_mol)
    recs_tr, recs_va = recs[:n_train], recs[n_train:]
    net, init_snapshot = build_reference_ccn(
        h, L, dim_input=recs[0].x.shape[1])
    ours = run_ours_ccn(init_snapshot, recs_tr, recs_va, h=h, L=L, lr=lr,
                        epochs=epochs, task=task)
    ref = run_reference_ccn(net, recs_tr, recs_va, lr=lr, epochs=epochs,
                            task=task)
    return ref, ours


def run_both(*, h=2, L=3, J=1, bs=16, lr=1e-3, epochs=20, n_train=160,
             task=0, n_mol=None, arch="gnn", order=2):
    recs = load_fixture()
    if n_mol is not None:
        recs = recs[:n_mol]
        n_train = int(0.8 * n_mol) // bs * bs or bs
    recs_tr, recs_va = split_fixture(recs, n_train)
    gnn, init_snapshot = build_reference_model(h, L, J,
                                               dim_input=recs[0].x.shape[1],
                                               task=task, arch=arch,
                                               order=order)
    ours = run_ours(init_snapshot, recs_tr, recs_va, h=h, L=L, J=J, bs=bs,
                    lr=lr, epochs=epochs, task=task, arch=arch, order=order)
    ref = run_reference(gnn, recs_tr, recs_va, bs=bs, lr=lr, epochs=epochs,
                        task=task)
    return ref, ours
