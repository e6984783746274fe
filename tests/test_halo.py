"""Halo-exchange edge partitioning: exact agreement with the full SpMM,
gradients, and halo-size accounting."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hgnn2_tpu.ops import sparse
from hgnn2_tpu.parallel import halo, spmd


@pytest.fixture(scope="module")
def mesh():
    return spmd.make_mesh(8, edge_axis=4)


def _graph(rng, V=64, E=512):
    src = rng.integers(0, V, E).astype(np.int32)
    dst = rng.integers(0, V, E).astype(np.int32)
    w = rng.random(E).astype(np.float32)
    return src, dst, w


def test_halo_spmm_matches_full(mesh, rng):
    V, F = 64, 5
    src, dst, w = _graph(rng, V=V)
    S = mesh.shape["edge"]
    part = halo.build_halo_partition(src, dst, w, V, S)
    x = rng.standard_normal((V, F)).astype(np.float32)
    x_stacked = jnp.asarray(x.reshape(S, V // S, F))

    with jax.sharding.set_mesh(mesh):
        f = halo.halo_partitioned_spmm(mesh, part)
        out = np.asarray(jax.jit(f)(x_stacked)).reshape(V, F)

    expect = np.asarray(
        sparse.spmm(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w),
                    jnp.asarray(x), V)
    )
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_halo_spmm_gradients(mesh, rng):
    V, F = 32, 3
    src, dst, w = _graph(rng, V=V, E=200)
    S = mesh.shape["edge"]
    part = halo.build_halo_partition(src, dst, w, V, S)
    x = rng.standard_normal((V, F)).astype(np.float32)
    x_stacked = jnp.asarray(x.reshape(S, V // S, F))

    with jax.sharding.set_mesh(mesh):
        f = halo.halo_partitioned_spmm(mesh, part)
        g_part = np.asarray(
            jax.grad(lambda xx: (f(xx) ** 2).sum())(x_stacked)
        ).reshape(V, F)

    def full_loss(xx):
        return (
            sparse.spmm(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w), xx, V)
            ** 2
        ).sum()

    g_full = np.asarray(jax.grad(full_loss)(jnp.asarray(x)))
    np.testing.assert_allclose(g_part, g_full, atol=1e-4)


def _locality_record(rng, V=64, reach=2, n_long=6, F=5):
    """One connected graph with mostly-local edges (ring of neighborhoods)
    plus a few long-range edges — the giant-graph regime halo exchange is
    built for."""
    from hgnn2_tpu import graphs

    a = np.zeros((V, V), np.float32)
    for v in range(V):
        for d in range(1, reach + 1):
            a[v, (v + d) % V] = 1.0
    for _ in range(n_long):
        i, j = rng.integers(0, V, 2)
        if i != j:
            a[i, j] = 1.0
    a = np.maximum(np.triu(a, 1), np.triu(a.T, 1))
    a = a + a.T
    x = rng.standard_normal((V, F)).astype(np.float32)
    y = np.array([1.5] * 13, np.float32)
    return graphs.GraphRecord(x=x, adj=a, y=y)


def test_halo_full_lggnn_matches_single_chip(mesh, rng):
    """A FULL PackedLGGNN train-step loss + gradients under halo
    partitioning agree with single-chip execution on one giant graph."""
    from hgnn2_tpu import graphs
    from hgnn2_tpu.nn import packed

    S = mesh.shape["edge"]
    rec = _locality_record(rng, V=64)
    pb = graphs.make_packed_batch([rec], task=0)
    mean, std = 0.5, 2.0

    model_single = packed.PackedLGGNN(n_features=2, n_layers=3, J=1, order=2)
    variables = model_single.init(jax.random.key(0), pb, train=True)

    def loss_single(params):
        out, _ = model_single.apply(
            {**variables, "params": params}, pb, train=True,
            mutable=["batch_stats"],
        )
        t = (pb.y - mean) / (std + 1e-8)
        per = (out[:, 0] - t) ** 2
        return (per * pb.gmask).sum() / jnp.maximum(pb.gmask.sum(), 1.0)

    l1, g1 = jax.value_and_grad(loss_single)(variables["params"])

    model_halo = packed.PackedLGGNN(n_features=2, n_layers=3, J=1, order=2,
                                    bn_axis="edge")
    bundle = halo.build_halo_lg_bundle(pb, S)
    with jax.sharding.set_mesh(mesh):
        loss_fn = halo.halo_packed_loss(model_halo, mesh, bundle,
                                        mean=mean, std=std)
        l2, g2 = jax.jit(jax.value_and_grad(
            lambda p: loss_fn({**variables, "params": p})
        ))(variables["params"])

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    # every individual halo operator matches its single-chip twin to ~1e-6
    # (fwd and VJP); the residual model-level grad delta is f32
    # reduction-order noise through the BN statistics psum, so compare by
    # global relative L2 rather than elementwise on near-cancelling entries
    v1 = np.concatenate([np.asarray(l).ravel()
                         for l in jax.tree_util.tree_leaves(g1)])
    v2 = np.concatenate([np.asarray(l).ravel()
                         for l in jax.tree_util.tree_leaves(g2)])
    rel = np.linalg.norm(v1 - v2) / max(np.linalg.norm(v1), 1e-12)
    assert rel < 1e-3, rel


def test_halo_full_packed_gnn_matches_single_chip(mesh, rng):
    """halo_packed_loss also serves PackedGNN (ops bundle -> graph_op):
    loss + gradients agree with single-chip execution."""
    from hgnn2_tpu import graphs
    from hgnn2_tpu.nn import packed

    S = mesh.shape["edge"]
    rec = _locality_record(rng, V=64)
    pb = graphs.make_packed_batch([rec], task=0)
    mean, std = 0.5, 2.0

    model_single = packed.PackedGNN(n_features=2, n_layers=3, J=1)
    variables = model_single.init(jax.random.key(0), pb, train=True)

    def loss_single(params):
        out, _ = model_single.apply(
            {**variables, "params": params}, pb, train=True,
            mutable=["batch_stats"],
        )
        t = (pb.y - mean) / (std + 1e-8)
        per = (out[:, 0] - t) ** 2
        return (per * pb.gmask).sum() / jnp.maximum(pb.gmask.sum(), 1.0)

    l1, g1 = jax.value_and_grad(loss_single)(variables["params"])

    model_halo = packed.PackedGNN(n_features=2, n_layers=3, J=1,
                                  bn_axis="edge")
    bundle = halo.build_halo_lg_bundle(pb, S)
    with jax.sharding.set_mesh(mesh):
        loss_fn = halo.halo_packed_loss(model_halo, mesh, bundle,
                                        mean=mean, std=std)
        l2, g2 = jax.jit(jax.value_and_grad(
            lambda p: loss_fn({**variables, "params": p})
        ))(variables["params"])

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    v1 = np.concatenate([np.asarray(l).ravel()
                         for l in jax.tree_util.tree_leaves(g1)])
    v2 = np.concatenate([np.asarray(l).ravel()
                         for l in jax.tree_util.tree_leaves(g2)])
    rel = np.linalg.norm(v1 - v2) / max(np.linalg.norm(v1), 1e-12)
    assert rel < 1e-3, rel


def test_halo_lggnn_comm_far_below_psum_path(mesh, rng):
    """On a locality-friendly giant graph, the halo LGGNN's comm volume is
    a small fraction of the psum-replicated path's (V, F) all-reduces."""
    from hgnn2_tpu import graphs
    from hgnn2_tpu.nn import packed

    S = mesh.shape["edge"]
    rec = _locality_record(rng, V=256, reach=3, n_long=8)
    pb = graphs.make_packed_batch([rec], task=0)
    bundle = halo.build_halo_lg_bundle(pb, S)

    model = packed.PackedLGGNN(n_features=4, n_layers=3, J=1, order=2,
                               bn_axis="edge")
    # init with the axis-free twin (same params); bn_axis only changes
    # how statistics reduce inside the shard_map
    variables = packed.PackedLGGNN(
        n_features=4, n_layers=3, J=1, order=2
    ).init(jax.random.key(0), pb, train=True)
    log = halo.new_comm_log()
    with jax.sharding.set_mesh(mesh):
        loss_fn = halo.halo_packed_loss(model, mesh, bundle, comm_log=log)
        jax.eval_shape(loss_fn, variables)  # one trace fills the log
    hbytes = halo.halo_comm_bytes(log, bundle, S)
    assert hbytes["n_node_halo_fwd"] > 0 and hbytes["n_edge_halo_fwd"] > 0

    # psum-replicated fallback on the same graph + model
    with jax.sharding.set_mesh(mesh):
        lops = spmd.partitioned_packed_ops(mesh, pb, J=1)
        pmodel = packed.PackedLGGNN(n_features=4, n_layers=3, J=1, order=2)
        jax.eval_shape(
            lambda v: pmodel.apply(v, pb, train=True, ops=lops,
                                   mutable=["batch_stats"]),
            variables,
        )
    pbytes = lops.comm_bytes_per_step()
    ratio = hbytes["train_step_bytes_per_chip"] / pbytes["train_step_bytes_per_chip"]
    assert ratio < 0.25, (ratio, hbytes, pbytes)


def test_halo_volume_much_smaller_than_full_block(rng):
    """For a locality-friendly graph the halo is a small fraction of V."""
    V, S = 1024, 8
    # ring-of-cliques graph: mostly local edges + a few long-range ones
    src_l, dst_l = [], []
    for v in range(V):
        for _ in range(6):
            u = (v + int(rng.integers(-8, 9))) % V
            src_l.append(v)
            dst_l.append(u)
    for _ in range(40):  # long-range
        src_l.append(int(rng.integers(0, V)))
        dst_l.append(int(rng.integers(0, V)))
    src = np.array(src_l, np.int32)
    dst = np.array(dst_l, np.int32)
    w = np.ones(len(src), np.float32)
    part = halo.build_halo_partition(src, dst, w, V, S)
    halo_fraction = part.n_imports / (V // S)
    assert halo_fraction < 0.35, halo_fraction  # vs 8x for full replication
