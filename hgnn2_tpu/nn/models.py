"""GNN models: the power GNN and the line-graph (edge-dual) GNN.

Re-designs reference models/gnns/model_mnb.py (GNN_simple:19, GNN_lg:69)
over the operator-bundle interface: the stack is layer0 (input featuremap)
+ (n_layers - 2) middle layers + a readout, with hidden widths
[in -> h], [2h -> h], [2h -> out] exactly as the reference builds its
featuremaps (model_mnb.py:48-50, :98-100).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from hgnn2_tpu.nn import layers
from hgnn2_tpu.nn.bundles import DenseBundle, MaterializedBundle
from hgnn2_tpu.nn.layers import CompatConfig


class GNNSimple(nn.Module):
    """Power GNN over the operator stack {I, D, A, A^2, ...}.

    Args mirror the reference GNN_simple(task, n_features, n_layers,
    dim_input, dim_output, J, gru) minus task (loss-side concern here).
    """

    n_features: int
    n_layers: int
    dim_output: int = 1
    J: int = 1
    compat: CompatConfig = CompatConfig()
    dtype: jnp.dtype | None = None  # bf16 compute (params/BN stats stay f32)
    # gated node-state update in every non-readout layer (reference
    # GNN_simple(gru=True) -> layer_simple constructs GRUUpdate,
    # layers_mnb.py:38-41; here it is also APPLIED — see GRUUpdate's
    # docstring for the deviation note)
    gru: bool = False

    @nn.compact
    def __call__(self, batch, train: bool = True, bundle=None) -> jnp.ndarray:
        if bundle is None:
            bundle = DenseBundle.from_batch(batch, self.J, dtype=self.dtype)
        x, mask = batch.x, batch.node_mask
        if self.dtype is not None:
            x = x.astype(self.dtype)
        for i in range(self.n_layers - 1):
            x = layers.PowerLayer(self.n_features, self.compat,
                                  dtype=self.dtype, gru=self.gru,
                                  name=f"layer{i}")(
                bundle, x, mask, train
            )
        return layers.ReadoutLayer(self.dim_output, self.compat,
                                   dtype=self.dtype, name="layerlast")(
            bundle, x, mask, train
        )


class GNNLineGraph(nn.Module):
    """GNN on the graph + its non-backtracking line graph (reference GNN_lg).

    order selects the node/edge update schedule (1: node first, 2: edge
    first, 3: simultaneous), cf. model_mnb.py:102-119.
    """

    n_features: int
    n_layers: int
    dim_output: int = 1
    J: int = 1
    order: int = 1
    compat: CompatConfig = CompatConfig()
    dtype: jnp.dtype | None = None  # bf16 compute (params/BN stats stay f32)
    # combine every update's operator applications into ONE batched einsum
    # against a precomputed (B, K, rows, N+M) tensor (FusedLGBundle) — the
    # kernel-count cut that wins at small h where the step is launch-
    # latency-bound (runs/profile_lggnn); identical math, tested
    fused_ops: bool = False

    @nn.compact
    def __call__(self, batch, train: bool = True, bundle=None) -> jnp.ndarray:
        if bundle is None:
            bundle = DenseBundle.from_batch(batch, self.J, with_line_graph=True,
                                            dtype=self.dtype)
        fb = None
        if self.fused_ops:
            from hgnn2_tpu.nn.bundles import FusedLGBundle

            fb = FusedLGBundle.from_dense(bundle)
        x, mask = batch.x, batch.node_mask
        if self.dtype is not None:
            x = x.astype(self.dtype)
        edge_mask = batch.edge_mask if batch.edge_mask is not None else None
        if edge_mask is None:
            edge_mask = jnp.ones(bundle.w.shape, x.dtype)
        xl = bundle.edge_features().astype(x.dtype)
        x, xl = layers.LGLayer(
            self.n_features, self.order, self.compat, dtype=self.dtype,
            name="layer0"
        )(bundle, x, xl, mask, edge_mask, train, fused_bundle=fb)
        for i in range(self.n_layers - 2):
            x, xl = layers.LGLayer(
                self.n_features, self.order, self.compat, dtype=self.dtype,
                name=f"layer{i+1}"
            )(bundle, x, xl, mask, edge_mask, train, fused_bundle=fb)
        return layers.LGReadoutLayer(self.dim_output, self.compat,
                                     dtype=self.dtype, name="layerlast")(
            bundle, x, xl, mask, train, fused_bundle=fb
        )
