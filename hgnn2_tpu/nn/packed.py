"""Packed-sparse GNN: the scalable path over flat node/edge arrays.

Same math as models.GNNSimple but over a PackedGraphBatch (segment-sum
aggregation, no dense blocks) with a pluggable aggregation function so the
identical module runs single-chip (ops.sparse) or edge-partitioned across
a mesh (parallel.spmd.partitioned_graph_op). This is the layout for graphs
too large for dense blocks and for multi-chip edge sharding.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
from flax import linen as nn

from hgnn2_tpu.graphs import PackedGraphBatch
from hgnn2_tpu.nn.layers import CompatConfig, MaskedBatchNorm, ref_init
from hgnn2_tpu.ops import sparse


class PackedGNN(nn.Module):
    """Power GNN over packed graphs; mirrors GNNSimple layer-for-layer."""

    n_features: int
    n_layers: int
    dim_output: int = 1
    J: int = 1
    compat: CompatConfig = CompatConfig()

    @nn.compact
    def __call__(
        self,
        pb: PackedGraphBatch,
        train: bool = True,
        graph_op_fn: Callable | None = None,
    ) -> jnp.ndarray:
        V = pb.num_node_slots
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
            x = MaskedBatchNorm(compat=self.compat, name=f"layer{i}_bn")(
                z[None], vmask[None], train
            )[0]
        h = graph_op_fn(x * vmask[:, None])
        y = nn.Dense(
            self.dim_output, kernel_init=ref_init(), bias_init=ref_init(), name="fc"
        )(h)
        y = y * vmask[:, None]
        return sparse.graph_readout(y, pb.node_gid, pb.n_graphs)
