"""Eval-mode parity: BatchNorm running statistics drive identical
inference outputs between our model and the reference torch model."""

import numpy as np

import jax
import jax.numpy as jnp

from hgnn2_tpu import graphs
from hgnn2_tpu.nn import models
from hgnn2_tpu.nn.layers import CompatConfig
from tests.test_gnn_parity import _copy_simple_params, _prepare_ref_batch, _records


def test_gnn_simple_eval_mode_parity(reference_path, rng):
    import torch
    from models.gnns import model_mnb

    L, h, J = 3, 2, 1
    recs = _records(rng, [6, 8, 5])
    X, W, T, XL, WL, Pm, Pd, mask, mask_lg, N_batch, E_batch = _prepare_ref_batch(
        reference_path, recs, J=J
    )
    torch.manual_seed(0)
    gnn_t = model_mnb.GNN_simple(0, h, L, 5, 1, J)

    batch = graphs.make_dense_batch(recs, task=0)
    model = models.GNNSimple(
        n_features=h, n_layers=L, dim_output=1, J=J, compat=CompatConfig.reference()
    )
    variables = model.init(jax.random.key(0), batch, train=True)
    params = _copy_simple_params(gnn_t, variables["params"], L)

    # one train pass on both sides to populate running stats identically
    gnn_t.train()
    with torch.no_grad():
        gnn_t([X.clone(), W.clone()], N_batch, mask)
    _, updates = model.apply(
        {"params": params, "batch_stats": variables["batch_stats"]},
        batch, train=True, mutable=["batch_stats"],
    )
    stats = updates["batch_stats"]

    # check our running stats match torch's BN buffers
    for i, name in enumerate(["layer0", "layer1"]):
        lt = getattr(gnn_t, name) if name == "layer0" else gnn_t._modules[name]
        np.testing.assert_allclose(
            np.asarray(stats[name]["bn"]["mean"]),
            lt.bn1.running_mean.numpy(), atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(stats[name]["bn"]["std"]),
            lt.bn1.running_std.numpy(), atol=1e-4,
        )

    # eval-mode outputs must agree (uses running stats)
    gnn_t.eval()
    with torch.no_grad():
        ref_out = gnn_t([X.clone(), W.clone()], N_batch, mask).numpy()
    out = model.apply(
        {"params": params, "batch_stats": stats}, batch, train=False
    )
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=5e-4, rtol=1e-4)
