"""Packed-sparse GNN: the scalable path over flat node/edge arrays.

Same math as models.GNNSimple / models.GNNLineGraph but over a
PackedGraphBatch (segment-sum aggregation, no dense blocks) with a
pluggable operator bundle so the identical modules run single-chip
(SparsePackedOps over ops.sparse) or edge-partitioned across a mesh
(parallel.spmd.partitioned_packed_ops / partitioned_graph_op). This is
the layout for graphs too large for dense blocks and for multi-chip edge
sharding.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
from flax import linen as nn

from hgnn2_tpu.graphs import PackedGraphBatch
from hgnn2_tpu.nn.layers import CompatConfig, MaskedBatchNorm, ref_init
from hgnn2_tpu.ops import sparse


class SparsePackedOps:
    """Single-chip operator bundle over a PackedGraphBatch.

    The interface the packed models are written against (graph_op /
    lg_graph_op / pm / pd / pm_t / pd_t — the sparse twin of
    nn/bundles.DenseBundle). parallel/spmd.partitioned_packed_ops provides
    the same interface with the edge set sharded across a mesh axis.
    """

    def __init__(self, pb: PackedGraphBatch, J: int):
        self.pb = pb
        self.J = J
        self.V = pb.num_node_slots
        self.deg = sparse.degrees(pb.src, pb.w, self.V)
        self.dl = sparse.nb_degrees(
            pb.src, pb.dst, pb.w, pb.rev, pb.edge_mask, self.V
        )

    def graph_op(self, x: jnp.ndarray) -> jnp.ndarray:
        pb = self.pb
        return sparse.graph_op(pb.src, pb.dst, pb.w, x, self.V, self.J,
                               deg=self.deg)

    def lg_graph_op(self, xl: jnp.ndarray) -> jnp.ndarray:
        pb = self.pb
        return sparse.lg_graph_op(pb.src, pb.dst, pb.w, pb.rev, pb.edge_mask,
                                  xl, self.V, self.J, dl=self.dl)

    def pm(self, xl: jnp.ndarray) -> jnp.ndarray:
        pb = self.pb
        return sparse.incidence_apply(pb.src, pb.dst, pb.edge_mask, xl,
                                      self.V, False)

    def pd(self, xl: jnp.ndarray) -> jnp.ndarray:
        pb = self.pb
        return sparse.incidence_apply(pb.src, pb.dst, pb.edge_mask, xl,
                                      self.V, True)

    def pm_t(self, x: jnp.ndarray) -> jnp.ndarray:
        pb = self.pb
        return sparse.incidence_t_apply(pb.src, pb.dst, pb.edge_mask, x, False)

    def pd_t(self, x: jnp.ndarray) -> jnp.ndarray:
        pb = self.pb
        return sparse.incidence_t_apply(pb.src, pb.dst, pb.edge_mask, x, True)

    def nb_degrees(self) -> jnp.ndarray:
        return self.dl


class PackedLGGNN(nn.Module):
    """Line-graph GNN over packed graphs; mirrors GNNLineGraph
    layer-for-layer using segment-sum aggregation (ops/sparse.py): the NB
    operator, incidence maps Pm/Pd and their transposes all run as
    gather/scatter over the flat edge arrays — the layout for graphs whose
    dense (B, M, M) blocks would not fit.

    ops: operator bundle (default SparsePackedOps; pass
    spmd.partitioned_packed_ops(...) for edge-partitioned execution).
    bn_axis: mesh axis for BatchNorm statistics when the module runs
    inside a shard_map (molecule-aligned sharding)."""

    n_features: int
    n_layers: int
    dim_output: int = 1
    J: int = 1
    order: int = 1
    compat: CompatConfig = CompatConfig()
    bn_axis: str | tuple | None = None

    @nn.compact
    def __call__(
        self, pb: PackedGraphBatch, train: bool = True, ops=None
    ) -> jnp.ndarray:
        if ops is None:
            ops = SparsePackedOps(pb, self.J)
        dl = ops.nb_degrees()
        vmask = pb.node_mask
        emask = pb.edge_mask

        def gop(x):
            return ops.graph_op(x * vmask[:, None])

        def lgop(xl):
            return ops.lg_graph_op(xl * emask[:, None])

        def pair(x1, mask, i, prefix, relu_second=False):
            a = nn.relu(
                nn.Dense(self.n_features, kernel_init=ref_init(),
                         bias_init=ref_init(), name=f"layer{i}_{prefix}cv1")(x1)
            )
            b = nn.Dense(self.n_features, kernel_init=ref_init(),
                         bias_init=ref_init(), name=f"layer{i}_{prefix}cv2")(x1)
            if relu_second:
                b = nn.relu(b)
            z = jnp.concatenate([b, a], axis=-1)
            return MaskedBatchNorm(
                compat=self.compat, axis_name=self.bn_axis,
                name=f"layer{i}_{prefix}bn",
            )(z[None], mask[None], train)[0]

        x = pb.x
        xl = dl[:, None]
        for i in range(self.n_layers - 1):
            xa = gop(x)
            xda = lgop(xl)

            def node_update(edge_state, i=i, xa=xa):
                x1 = jnp.concatenate(
                    [xa, ops.pm(edge_state), ops.pd(edge_state)], -1
                )
                return pair(x1, vmask, i, "node_")

            def edge_update(node_state, i=i, xda=xda):
                xd1 = jnp.concatenate(
                    [xda, ops.pm_t(node_state), ops.pd_t(node_state)], -1
                )
                return pair(xd1, emask, i, "edge_")

            if self.order == 1:
                x_new = node_update(xl)
                xl = edge_update(x_new)
                x = x_new
            elif self.order == 2:
                xl = edge_update(x)
                x = node_update(xl)
            else:
                x_new = node_update(xl)
                xl = edge_update(x)
                x = x_new
        xm = xl * emask[:, None]
        x1 = jnp.concatenate([gop(x), ops.pm(xm), ops.pd(xm)], -1)
        y = nn.Dense(self.dim_output, kernel_init=ref_init(),
                     bias_init=ref_init(), name="fc")(x1)
        y = y * vmask[:, None]
        return sparse.graph_readout(y, pb.node_gid, pb.n_graphs)


class PackedGNN(nn.Module):
    """Power GNN over packed graphs; mirrors GNNSimple layer-for-layer.

    Accepts either a bare graph_op_fn or a full operator bundle (ops=) with
    the SparsePackedOps interface — the latter is what partitioned
    executors (spmd.partitioned_packed_ops, parallel.halo.HaloLocalOps)
    hand every packed model, so the same loss drivers serve PackedGNN and
    PackedLGGNN."""

    n_features: int
    n_layers: int
    dim_output: int = 1
    J: int = 1
    compat: CompatConfig = CompatConfig()
    bn_axis: str | tuple | None = None

    @nn.compact
    def __call__(
        self,
        pb: PackedGraphBatch,
        train: bool = True,
        graph_op_fn: Callable | None = None,
        ops=None,
    ) -> jnp.ndarray:
        V = pb.num_node_slots
        if graph_op_fn is None and ops is not None:
            graph_op_fn = ops.graph_op
        if graph_op_fn is None:
            deg = sparse.degrees(pb.src, pb.w, V)

            def graph_op_fn(x):
                return sparse.graph_op(pb.src, pb.dst, pb.w, x, V, self.J, deg=deg)

        x = pb.x
        vmask = pb.node_mask
        for i in range(self.n_layers - 1):
            h = graph_op_fn(x * vmask[:, None])
            a = nn.relu(
                nn.Dense(self.n_features, kernel_init=ref_init(), bias_init=ref_init(),
                         name=f"layer{i}_cv1")(h)
            )
            b = nn.relu(
                nn.Dense(self.n_features, kernel_init=ref_init(), bias_init=ref_init(),
                         name=f"layer{i}_cv2")(h)
            )
            z = jnp.concatenate([b, a], axis=-1)
            x = MaskedBatchNorm(
                compat=self.compat, axis_name=self.bn_axis, name=f"layer{i}_bn"
            )(z[None], vmask[None], train)[0]
        h = graph_op_fn(x * vmask[:, None])
        y = nn.Dense(
            self.dim_output, kernel_init=ref_init(), bias_init=ref_init(), name="fc"
        )(h)
        y = y * vmask[:, None]
        return sparse.graph_readout(y, pb.node_gid, pb.n_graphs)
