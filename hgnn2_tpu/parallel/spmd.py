"""Multi-chip execution: device meshes, data parallelism, edge partitioning.

The reference has NO distribution story (single process; its SLURM
--nodes flags are unused — SURVEY.md §2.3). This module is the TPU-native
replacement, built on jax.sharding + shard_map over a named mesh
('data', 'edge'):

  * data axis — batch-level data parallelism: the padded batch is sharded
    on its leading axis; under jit, XLA inserts the gradient psum and
    computes masked BatchNorm statistics globally (the collectives ride
    ICI, nothing is hand-written).
  * edge axis — edge partitioning, the graph analog of tensor/sequence
    parallelism: the packed edge set is sharded across chips, each chip
    segment-sums its local edges' messages and a psum over the edge axis
    assembles full node aggregates. Boundary exchange therefore costs one
    psum of the (V, F) node block per operator application.

Pipeline parallelism is not meaningful for these models (layer state is a
few KB; a microbatch pipeline would be pure overhead) — scale comes from
the two axes above.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import mesh_utils
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None, edge_axis: int = 1, devices=None
) -> Mesh:
    """A ('data', 'edge') mesh over the first n devices."""
    devices = list(devices or jax.devices())
    n = n_devices or len(devices)
    if n % edge_axis != 0:
        raise ValueError(f"n_devices {n} not divisible by edge axis {edge_axis}")
    arr = mesh_utils.create_device_mesh((n // edge_axis, edge_axis), devices[:n])
    return Mesh(arr, ("data", "edge"))


def shard_batch(mesh: Mesh, batch):
    """Shard every array field of a batch pytree on its leading (batch)
    axis over the 'data' mesh axis; scalars replicate."""

    def _shard(x):
        if not hasattr(x, "ndim") or x.ndim == 0:
            return x
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(_shard, batch)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def make_dp_train_step(train_step: Callable, mesh: Mesh):
    """Wrap a single-chip train step for data parallelism: the batch is
    sharded over 'data' (shard_batch), state replicated (replicate); XLA
    inserts the gradient psum and global BN statistics."""

    @functools.partial(jax.jit, donate_argnums=0)
    def dp_step(state, batch):
        return train_step(state, batch)

    return dp_step


# ---------------------------------------------------------------------------
# Edge-partitioned sparse aggregation (shard_map over the 'edge' axis).
# ---------------------------------------------------------------------------


def edge_partition_spec() -> P:
    return P("edge")


def partitioned_spmm(mesh: Mesh, num_nodes: int):
    """Edge-partitioned SpMM: edges sharded over 'edge', node features
    replicated; each chip aggregates its local edges, one psum over
    'edge' assembles the full result. Returns f(src, dst, w, x) -> (V, F).

    Differentiable (shard_map transposes the psum automatically).
    """

    def local(src, dst, w, x):
        partial = jax.ops.segment_sum(
            w[:, None] * x[dst], src, num_segments=num_nodes
        )
        return jax.lax.psum(partial, "edge")

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P("edge"), P("edge"), P("edge"), P()),
        out_specs=P(),
        check_rep=False,
    )


def partitioned_graph_op(mesh: Mesh, num_nodes: int, J: int):
    """Edge-partitioned multi-operator apply [X | dX | AX | A^2X ...].

    Equivalent to ops.sparse.graph_op with the edge set sharded over the
    'edge' mesh axis.
    """
    spmm = partitioned_spmm(mesh, num_nodes)

    def apply(src, dst, w, x):
        deg = spmm(src, dst, w, jnp.ones((x.shape[0], 1), x.dtype))[:, 0]
        blocks = [x, deg[:, None] * x]
        cur = x
        applied = 0
        for j in range(J):
            target = 2**j
            while applied < target:
                cur = spmm(src, dst, w, cur)
                applied += 1
            blocks.append(cur)
        return jnp.concatenate(blocks, axis=1)

    return apply


def local_partitioned_spmm(mesh: Mesh, nodes_per_shard: int):
    """Molecule-aligned edge partitioning: nodes AND edges are sharded over
    'edge' with shard-local indices, so aggregation is fully local (no
    collective per apply — molecules never span shards when batches are
    packed molecule-by-molecule, so the cut is empty). Inputs are stacked
    (S, El) / (S, Vl, F) arrays sharded on their leading axis.

    This is the scaling-efficient configuration for many-small-graphs
    training; partitioned_spmm (replicated x + psum) is the fallback for a
    single giant graph whose cut cannot be emptied.
    """

    def local(src, dst, w, x):
        # shard_map passes (1, El), (1, Vl, F) blocks
        out = jax.ops.segment_sum(
            w[0][:, None] * x[0][dst[0]], src[0], num_segments=nodes_per_shard
        )
        return out[None]

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P("edge"), P("edge"), P("edge"), P("edge")),
        out_specs=P("edge"),
        check_rep=False,
    )


def partition_records(records, n_shards: int):
    """Greedy bin-pack molecules into n_shards shards balanced by edge
    count (the 'minimize cut edges' partitioner is trivial for disconnected
    molecules: never split one)."""
    order = sorted(range(len(records)), key=lambda i: -records[i].n_dir_edges)
    shards = [[] for _ in range(n_shards)]
    loads = [0] * n_shards
    for i in order:
        k = loads.index(min(loads))
        shards[k].append(records[i])
        loads[k] += records[i].n_dir_edges
    return shards


def pad_edges_for_partition(arrays: dict, n_shards: int, num_nodes: int):
    """Pad packed edge arrays so the edge count divides n_shards.

    Padding edges carry weight 0 and point at node num_nodes - 1; padded
    "rev" slots are self-referential (a zero-weight edge is its own
    reverse, matching make_packed_batch's padding convention). arrays:
    dict with src, dst, w (+ optional rev / edge_gid / edge_mask / extras
    padded with zeros).
    """
    c = len(arrays["src"])
    target = ((c + n_shards - 1) // n_shards) * n_shards
    pad = target - c
    if pad == 0:
        return dict(arrays)
    out = {}
    for k, v in arrays.items():
        v = np.asarray(v)
        if k in ("src", "dst"):
            fill = np.full((pad,), num_nodes - 1, v.dtype)
        elif k == "rev":
            fill = np.arange(c, c + pad, dtype=v.dtype)
        else:
            fill = np.zeros((pad,) + v.shape[1:], v.dtype)
        out[k] = np.concatenate([v, fill], axis=0)
    return out
