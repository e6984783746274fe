"""Dense vs sparse vs materialized-oracle agreement for the graph ops."""

import numpy as np
import pytest

import jax.numpy as jnp

from hgnn2_tpu import graphs, operators
from hgnn2_tpu.ops import dense, sparse
from tests.conftest import random_adjacency


def _records(rng, sizes, F=3, p=0.5):
    recs = []
    for n in sizes:
        A = random_adjacency(rng, n, p)
        x = rng.standard_normal((n, F)).astype(np.float32)
        recs.append(graphs.GraphRecord(x=x, adj=A, y=np.float32(rng.standard_normal())))
    return recs


@pytest.mark.parametrize("J", [1, 2, 3])
def test_dense_graph_op_matches_materialized(rng, J):
    recs = _records(rng, [5, 7, 4])
    batch = graphs.make_dense_batch(recs, n_max=8)
    # oracle: materialized dense stacks per graph
    B, N, F = batch.x.shape
    W = np.zeros((B, N, N, J + 2), dtype=np.float32)
    for i, r in enumerate(recs):
        n = r.n_nodes
        W[i, :n, :n, :] = operators.operator_stack_dense(r.adj, J)
        W[i, :, :, 0] = 0.0
        W[i, :n, :n, 0] = np.eye(n)
    # padded identity slots must not leak: build identity over full N but
    # zero padded rows via mask
    eye = np.eye(N)[None] * np.asarray(batch.node_mask)[:, :, None]
    W[:, :, :, 0] = eye * np.asarray(batch.node_mask)[:, None, :]
    oracle = dense.graph_op_materialized(jnp.asarray(W), batch.x)

    pw = dense.adjacency_powers(batch.adj, J)
    deg = dense.degrees(batch.adj)
    ours = dense.graph_op(pw, deg, batch.x)
    # our identity block is x itself (nonzero only at real nodes anyway)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(oracle), atol=1e-4)


def test_nb_apply_matches_dense_matmul(rng):
    recs = _records(rng, [6, 5], F=2)
    batch = graphs.make_dense_batch(recs, with_line_graph=True)
    B, M = batch.lg_w.shape
    F = 2
    xl = rng.standard_normal((B, M, F)).astype(np.float32)
    xl *= np.asarray(batch.edge_mask)[:, :, None]

    s_src, s_dst = dense.edge_scatter_matrices(
        batch.lg_src, batch.lg_dst, batch.edge_mask, batch.x.shape[1]
    )
    ours = dense.nb_apply(s_src, s_dst, batch.lg_w, batch.lg_rev, jnp.asarray(xl))
    ours = np.asarray(ours) * np.asarray(batch.edge_mask)[:, :, None]

    for i, r in enumerate(recs):
        lg = r.line_graph()
        AL = operators.nb_adjacency_dense(lg)
        m = lg.num_edges
        expect = AL @ xl[i, :m]
        np.testing.assert_allclose(ours[i, :m], expect, atol=1e-4)
        np.testing.assert_allclose(ours[i, m:], 0.0, atol=1e-6)


def test_nb_degrees_match_dense(rng):
    recs = _records(rng, [6, 4], F=1)
    batch = graphs.make_dense_batch(recs, with_line_graph=True)
    s_src, s_dst = dense.edge_scatter_matrices(
        batch.lg_src, batch.lg_dst, batch.edge_mask, batch.x.shape[1]
    )
    dl = np.asarray(
        dense.nb_degrees(s_src, s_dst, batch.lg_w, batch.lg_rev)
    ) * np.asarray(batch.edge_mask)
    for i, r in enumerate(recs):
        AL = operators.nb_adjacency_dense(r.line_graph())
        np.testing.assert_allclose(dl[i, : AL.shape[0]], AL.sum(1), atol=1e-4)


def test_incidence_apply_matches_dense(rng):
    recs = _records(rng, [5, 7], F=2)
    batch = graphs.make_dense_batch(recs, with_line_graph=True)
    B, M = batch.lg_w.shape
    N = batch.x.shape[1]
    xl = rng.standard_normal((B, M, 2)).astype(np.float32)
    xl *= np.asarray(batch.edge_mask)[:, :, None]
    s_src, s_dst = dense.edge_scatter_matrices(
        batch.lg_src, batch.lg_dst, batch.edge_mask, N
    )
    pm_x = np.asarray(dense.incidence_apply(s_src, s_dst, jnp.asarray(xl), signed=False))
    pd_x = np.asarray(dense.incidence_apply(s_src, s_dst, jnp.asarray(xl), signed=True))
    for i, r in enumerate(recs):
        lg = r.line_graph()
        Pm, Pd = operators.incidence_dense(lg, r.n_nodes)
        m = lg.num_edges
        np.testing.assert_allclose(pm_x[i, : r.n_nodes], Pm @ xl[i, :m], atol=1e-4)
        np.testing.assert_allclose(pd_x[i, : r.n_nodes], Pd @ xl[i, :m], atol=1e-4)
    # transposed maps
    x = rng.standard_normal((B, N, 2)).astype(np.float32)
    x *= np.asarray(batch.node_mask)[:, :, None]
    pmt = np.asarray(dense.incidence_t_apply(s_src, s_dst, jnp.asarray(x), signed=False))
    pdt = np.asarray(dense.incidence_t_apply(s_src, s_dst, jnp.asarray(x), signed=True))
    for i, r in enumerate(recs):
        lg = r.line_graph()
        Pm, Pd = operators.incidence_dense(lg, r.n_nodes)
        m = lg.num_edges
        np.testing.assert_allclose(pmt[i, :m], Pm.T @ x[i, : r.n_nodes], atol=1e-4)
        np.testing.assert_allclose(pdt[i, :m], Pd.T @ x[i, : r.n_nodes], atol=1e-4)


@pytest.mark.parametrize("J", [1, 2])
def test_sparse_matches_dense_graph_op(rng, J):
    recs = _records(rng, [5, 8, 3], F=3)
    packed = graphs.make_packed_batch(recs, node_capacity=20, edge_capacity=80)
    out_sparse = np.asarray(
        sparse.graph_op(
            packed.src, packed.dst, packed.w, packed.x, packed.num_node_slots, J
        )
    )
    dense_batch = graphs.make_dense_batch(recs)
    pw = dense.adjacency_powers(dense_batch.adj, J)
    deg = dense.degrees(dense_batch.adj)
    out_dense = np.asarray(dense.graph_op(pw, deg, dense_batch.x))
    off = 0
    for i, r in enumerate(recs):
        n = r.n_nodes
        np.testing.assert_allclose(
            out_sparse[off : off + n], out_dense[i, :n], atol=1e-4
        )
        off += n


def test_sparse_lg_ops_match_dense(rng):
    recs = _records(rng, [6, 5], F=2)
    packed = graphs.make_packed_batch(recs, node_capacity=16, edge_capacity=64)
    C = packed.num_edge_slots
    xl = rng.standard_normal((C, 2)).astype(np.float32)
    xl *= np.asarray(packed.edge_mask)[:, None]
    out = np.asarray(
        sparse.nb_apply(
            packed.src,
            packed.dst,
            packed.w,
            packed.rev,
            packed.edge_mask,
            jnp.asarray(xl),
            packed.num_node_slots,
        )
    )
    off_e = 0
    for i, r in enumerate(recs):
        lg = r.line_graph()
        AL = operators.nb_adjacency_dense(lg)
        m = lg.num_edges
        np.testing.assert_allclose(out[off_e : off_e + m], AL @ xl[off_e : off_e + m], atol=1e-4)
        off_e += m
    # incidence
    pm_x = np.asarray(
        sparse.incidence_apply(
            packed.src, packed.dst, packed.edge_mask, jnp.asarray(xl),
            packed.num_node_slots, signed=False,
        )
    )
    off_e, off_n = 0, 0
    for i, r in enumerate(recs):
        lg = r.line_graph()
        Pm, _ = operators.incidence_dense(lg, r.n_nodes)
        m, n = lg.num_edges, r.n_nodes
        np.testing.assert_allclose(
            pm_x[off_n : off_n + n], Pm @ xl[off_e : off_e + m], atol=1e-4
        )
        off_e += m
        off_n += n


def test_graph_readout(rng):
    recs = _records(rng, [4, 6], F=2)
    packed = graphs.make_packed_batch(recs, node_capacity=12, edge_capacity=60)
    out = np.asarray(sparse.graph_readout(packed.x, packed.node_gid, packed.n_graphs))
    np.testing.assert_allclose(out[0], recs[0].x.sum(0), atol=1e-5)
    np.testing.assert_allclose(out[1], recs[1].x.sum(0), atol=1e-5)


def test_fused_lg_bundle_matches_unfused(rng):
    """FusedLGBundle: one combined-operator einsum per update reproduces
    [graph_op | Pm xl | Pd xl] and [lg_graph_op | Pm^T x | Pd^T x]
    exactly, and GNNLineGraph(fused_ops=True) matches the unfused model
    output for all three update orders."""
    import jax
    import jax.numpy as jnp

    from hgnn2_tpu import graphs
    from hgnn2_tpu.data import qm9
    from hgnn2_tpu.nn import models
    from hgnn2_tpu.nn.bundles import DenseBundle, FusedLGBundle

    records = qm9.synthetic_qm9_like(12, seed=3)
    batch = graphs.make_dense_batch(records, n_max=32, m_max=64,
                                    with_line_graph=True, batch_size=12,
                                    task=0)
    b = DenseBundle.from_batch(batch, J=2, with_line_graph=True)
    fb = FusedLGBundle.from_dense(b)
    B, N, M = b.s_src.shape
    F = 3
    x = jnp.asarray(rng.standard_normal((B, N, F)).astype(np.float32))
    xl = jnp.asarray(rng.standard_normal((B, M, F)).astype(np.float32))

    want_node = jnp.concatenate([b.graph_op(x), b.pm(xl), b.pd(xl)], -1)
    np.testing.assert_allclose(np.asarray(fb.node_input(x, xl)),
                               np.asarray(want_node), atol=1e-4)
    want_edge = jnp.concatenate([b.lg_graph_op(xl), b.pm_t(x), b.pd_t(x)], -1)
    np.testing.assert_allclose(np.asarray(fb.edge_input(x, xl)),
                               np.asarray(want_edge), atol=1e-4)

    for order in (1, 2, 3):
        m0 = models.GNNLineGraph(n_features=2, n_layers=3, J=1, order=order)
        m1 = models.GNNLineGraph(n_features=2, n_layers=3, J=1, order=order,
                                 fused_ops=True)
        variables = m0.init(jax.random.key(0), batch, train=False)
        y0 = m0.apply(variables, batch, train=False)
        y1 = m1.apply(variables, batch, train=False)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   rtol=1e-4, atol=1e-4)
        # train mode exercises the BN-stats path too
        y0t, _ = m0.apply(variables, batch, train=True,
                          mutable=["batch_stats"])
        y1t, _ = m1.apply(variables, batch, train=True,
                          mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(y1t), np.asarray(y0t),
                                   rtol=1e-4, atol=1e-4)
