"""Sharded CCN execution: vertex partitioning across the mesh.

BASELINE.json config[4] ("CCN order-2 at full batch scale, multi-host
edge-partitioned"): the CCN's parallel axis is the flattened vertex set.
Molecules are packed whole into shards (spmd.partition_records), so chi
promotion gathers F[nbr] only within a shard — no collective per layer.
The only cross-shard communication is the loss/gradient psum that jit
inserts, riding ICI.

Usage:
    shards = make_ccn_shards(records, mesh.shape["edge"], ...)
    step = make_sharded_ccn_train_step(model, tx, mesh, kind, mean, std)
    state, metrics = step(state, shards)

The stacked CCNBatch has a leading shard axis sharded over 'edge'; the
model is applied per shard under shard_map and per-graph outputs are
reassembled (each shard owns a disjoint set of graphs).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from hgnn2_tpu.graphs import GraphRecord
from hgnn2_tpu.nn import ccn as ccn_mod
from hgnn2_tpu.parallel import spmd


def make_ccn_shards(
    records: Sequence[GraphRecord],
    n_shards: int,
    k_max: int,
    vertex_capacity: int,
    graphs_per_shard: int,
    task: int | None = None,
    parts=None,
) -> ccn_mod.CCNBatch:
    """Partition molecules into n_shards balanced shards and stack their
    CCNBatches along a new leading axis (to be sharded over 'edge')."""
    if parts is None:
        parts = spmd.partition_records(records, n_shards)
    feature_dim = y_dtype = None
    if records:
        feature_dim = records[0].x.shape[1]
        y0 = np.asarray(records[0].y if task is None else records[0].y[task])
        y_dtype = y0.dtype if np.issubdtype(y0.dtype, np.integer) else np.float32
    batches = []
    for part in parts:
        if len(part) > graphs_per_shard:
            raise ValueError(
                f"shard holds {len(part)} graphs > graphs_per_shard={graphs_per_shard}"
            )
        batches.append(
            ccn_mod.make_ccn_batch(
                part,
                k_max=k_max,
                vertex_capacity=vertex_capacity,
                task=task,
                batch_size=graphs_per_shard,
                feature_dim=feature_dim,
                y_dtype=y_dtype,
            )
        )
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *batches
    )
    return stacked


def make_sharded_ccn_apply(model, mesh):
    """(variables, stacked CCNBatch) -> (S, B_shard, out) under shard_map."""

    def local_apply(variables, batch):
        local = jax.tree_util.tree_map(lambda x: x[0], batch)
        out = model.apply(variables, local, train=True)
        return out[None]

    def apply(variables, stacked):
        return shard_map(
            local_apply,
            mesh=mesh,
            in_specs=(P(), P("edge")),
            out_specs=P("edge"),
            check_rep=False,
        )(variables, stacked)

    return apply


def sharded_ccn_loss(model, mesh, kind: str = "regression",
                     mean: float = 0.0, std: float = 1.0):
    """Masked loss over all shards' graphs; differentiable."""
    apply = make_sharded_ccn_apply(model, mesh)

    def loss_fn(variables, stacked):
        out = apply(variables, stacked)  # (S, B, out)
        y = stacked.y
        gmask = stacked.gmask
        denom = jnp.maximum(gmask.sum(), 1.0)
        if kind == "classification":
            import optax

            ce = optax.softmax_cross_entropy_with_integer_labels(out, y)
            return (ce * gmask).sum() / denom
        t = (y - mean) / (std + 1e-8)
        return (((out[..., 0] - t) ** 2) * gmask).sum() / denom

    return loss_fn
