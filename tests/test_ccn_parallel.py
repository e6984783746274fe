"""Vertex-sharded CCN execution on the virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hgnn2_tpu.data import qm9
from hgnn2_tpu.nn import ccn as ccn_mod
from hgnn2_tpu.parallel import ccn_parallel, spmd


@pytest.fixture(scope="module")
def mesh():
    return spmd.make_mesh(8, edge_axis=4)


def test_sharded_ccn_matches_local(mesh):
    recs = qm9.synthetic_qm9_like(16, seed=0)
    n_shards = mesh.shape["edge"]
    stacked = ccn_parallel.make_ccn_shards(
        recs, n_shards, k_max=6, vertex_capacity=128, graphs_per_shard=8, task=0
    )
    model = ccn_mod.CCN2D(hidden=2, n_layers=2, dim_output=1)
    sample_local = jax.tree_util.tree_map(lambda x: x[0], stacked)
    variables = model.init(jax.random.key(0), sample_local, train=True)

    with jax.sharding.set_mesh(mesh):
        apply = ccn_parallel.make_sharded_ccn_apply(model, mesh)
        out_sharded = np.asarray(jax.jit(apply)(variables, stacked))

    # oracle: apply per shard locally
    for s in range(n_shards):
        local = jax.tree_util.tree_map(lambda x: x[s], stacked)
        out_local = np.asarray(model.apply(variables, local, train=True))
        np.testing.assert_allclose(out_sharded[s], out_local, atol=1e-4)


def test_sharded_ccn_loss_and_grads(mesh):
    recs = qm9.synthetic_qm9_like(12, seed=1)
    n_shards = mesh.shape["edge"]
    stacked = ccn_parallel.make_ccn_shards(
        recs, n_shards, k_max=6, vertex_capacity=128, graphs_per_shard=6, task=0
    )
    model = ccn_mod.CCN2D(hidden=2, n_layers=2, dim_output=1)
    sample_local = jax.tree_util.tree_map(lambda x: x[0], stacked)
    variables = model.init(jax.random.key(1), sample_local, train=True)

    with jax.sharding.set_mesh(mesh):
        loss_fn = ccn_parallel.sharded_ccn_loss(model, mesh)
        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(variables, stacked)
    assert np.isfinite(float(loss))
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()

    # oracle loss: same molecules through one big local batch
    cb = ccn_mod.make_ccn_batch(recs, k_max=6, task=0)
    out = model.apply(variables, cb, train=True)
    expect = float(((np.asarray(out)[:, 0] - np.asarray(cb.y)) ** 2).mean())
    np.testing.assert_allclose(float(loss), expect, rtol=1e-4)
