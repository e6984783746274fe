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


class ShardedLoader:
    """Wraps a batch loader so every yielded batch is sharded on its leading
    (batch) axis over the mesh's 'data' axis. Composes under
    data.batching.CachedLoader, which then caches the already-sharded,
    device-resident batches — the shipped trainer's DP path."""

    def __init__(self, inner, mesh: Mesh):
        self.inner = inner
        self.mesh = mesh

    def __iter__(self):
        for batch in self.inner:
            yield shard_batch(self.mesh, batch)

    def __len__(self) -> int:
        return len(self.inner)


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


def partitioned_packed_ops(
    mesh: Mesh,
    pb,
    J: int,
    use_ring: bool = False,
    ring_interpret: bool = False,
):
    """Edge-partitioned implementation of the SparsePackedOps interface
    (nn/packed.py) for a full PackedLGGNN/PackedGNN training step.

    Edges are sharded over the 'edge' mesh axis; node and edge feature
    states stay replicated. Every operator application whose output lives
    on nodes is one shard-local segment-sum + one all-reduce of the (V, F)
    node block over 'edge'; purely per-edge arithmetic (the NB operator's
    reverse-edge correction, Pm^T/Pd^T gathers) is elementwise on
    replicated arrays and costs no communication. Comm per apply =
    psum of V*F floats (see comm_bytes_per_step).

    use_ring swaps lax.psum for the Pallas RDMA ring all-reduce
    (ops/pallas/ring.ring_psum); requires a mesh whose only non-trivial
    axis is 'edge' (LOGICAL device ids address a single-axis ring).
    """
    num_nodes = pb.num_node_slots
    axis_size = mesh.shape["edge"]
    if use_ring and len(mesh.axis_names) != 1:
        # pallas RDMA LOGICAL device ids address a single named axis only
        raise ValueError("ring psum needs a single-axis ('edge',) mesh")

    def _reduce(x):
        if use_ring:
            from hgnn2_tpu.ops.pallas.ring import ring_psum

            return ring_psum(x, "edge", axis_size, interpret=ring_interpret)
        return jax.lax.psum(x, "edge")

    def _seg_local(idx, vals):
        return _reduce(jax.ops.segment_sum(vals, idx, num_segments=num_nodes))

    _seg = shard_map(
        _seg_local,
        mesh=mesh,
        in_specs=(P("edge"), P("edge")),
        out_specs=P(),
        check_rep=False,
    )

    class _Ops:
        def __init__(self):
            # every node-block all-reduce is logged (trace-time) so comm
            # volume per step is exact, not estimated
            self.psum_widths: list[int] = []
            # degree once per bundle (replicated); NB degree derives from
            # it with no extra collective: nb_deg[e] = deg[dst(e)] - w(rev)
            self.deg = self._seg(pb.src, pb.w[:, None])[:, 0]
            self.dl = (self.deg[pb.dst] - pb.w[pb.rev]) * pb.edge_mask

        def _seg(self, idx, vals):
            self.psum_widths.append(int(vals.shape[1]))
            return _seg(idx, vals)

        def _spmm(self, x):
            return self._seg(pb.src, pb.w[:, None] * x[pb.dst])

        def graph_op(self, x):
            blocks = [x, self.deg[:, None] * x]
            cur = x
            applied = 0
            for j in range(J):
                target = 2**j
                while applied < target:
                    cur = self._spmm(cur)
                    applied += 1
                blocks.append(cur)
            return jnp.concatenate(blocks, axis=1)

        def _nb(self, xl):
            y = self._seg(pb.src, pb.w[:, None] * xl)
            out = y[pb.dst] - pb.w[pb.rev][:, None] * xl[pb.rev]
            return out * pb.edge_mask[:, None]

        def lg_graph_op(self, xl):
            blocks = [xl, self.dl[:, None] * xl]
            cur = xl
            applied = 0
            for j in range(J):
                target = 2**j
                while applied < target:
                    cur = self._nb(cur)
                    applied += 1
                blocks.append(cur)
            return jnp.concatenate(blocks, axis=1)

        def pm(self, xl):
            xm = xl * pb.edge_mask[:, None]
            return self._seg(pb.src, xm) + self._seg(pb.dst, xm)

        def pd(self, xl):
            xm = xl * pb.edge_mask[:, None]
            return self._seg(pb.src, xm) - self._seg(pb.dst, xm)

        def pm_t(self, x):
            return (x[pb.src] + x[pb.dst]) * pb.edge_mask[:, None]

        def pd_t(self, x):
            return (x[pb.src] - x[pb.dst]) * pb.edge_mask[:, None]

        def nb_degrees(self):
            return self.dl

        def comm_bytes_per_step(self, dtype_bytes: int = 4) -> dict:
            """Exact all-reduce volume of the traced forward (call after
            tracing a forward/step through this bundle). A ring all-reduce
            of a replicated (V, width) block moves
            2 * (n-1)/n * V * width * dtype_bytes per chip; the backward
            transposes every psum into an equal-size collective, doubling
            the total."""
            ring = 2.0 * (axis_size - 1) / max(axis_size, 1)
            fwd = sum(
                ring * num_nodes * wd * dtype_bytes for wd in self.psum_widths
            )
            return {
                "n_allreduce_fwd": len(self.psum_widths),
                "forward_bytes_per_chip": fwd,
                "train_step_bytes_per_chip": 2 * fwd,
                "ring_factor": ring,
            }

    return _Ops()


# ---------------------------------------------------------------------------
# Molecule-aligned whole-model sharding (zero comm per operator apply).
# ---------------------------------------------------------------------------


def make_packed_shards(
    records,
    n_shards: int,
    node_capacity: int,
    edge_capacity: int,
    graphs_per_shard: int,
    task: int | None = None,
    parts=None,
):
    """Partition molecules into n_shards edge-balanced shards and stack
    their PackedGraphBatches along a new leading axis (sharded over
    'edge'). Molecules never split, so every operator apply inside a shard
    is fully local; only BatchNorm statistics (two (F,) psums per BN) and
    the loss reduction cross shards. parts: precomputed partition_records
    output (callers that already partitioned for capacity scans)."""
    from hgnn2_tpu import graphs as graphs_lib

    if parts is None:
        parts = partition_records(records, n_shards)
    # empty shards (fewer graphs than shards) still need shape/dtype-
    # matched all-padding blocks
    feature_dim = y_dtype = None
    if records:
        feature_dim = records[0].x.shape[1]
        y0 = np.asarray(records[0].y if task is None else records[0].y[task])
        y_dtype = y0.dtype if np.issubdtype(y0.dtype, np.integer) else np.float32
    batches = []
    for part in parts:
        if len(part) > graphs_per_shard:
            raise ValueError(
                f"shard holds {len(part)} graphs > graphs_per_shard="
                f"{graphs_per_shard}"
            )
        batches.append(
            graphs_lib.make_packed_batch(
                part,
                node_capacity=node_capacity,
                edge_capacity=edge_capacity,
                task=task,
                batch_size=graphs_per_shard,
                feature_dim=feature_dim,
                y_dtype=y_dtype,
            )
        )
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *batches)


def sharded_packed_loss(model, mesh, kind: str = "regression",
                        mean: float = 0.0, std: float = 1.0):
    """Masked loss of a packed model (built with bn_axis='edge') over
    stacked molecule-aligned shards; differentiable. Returns
    loss_fn(variables, stacked) for use with jax.value_and_grad."""

    def local_fwd(variables, batch):
        local = jax.tree_util.tree_map(lambda v: v[0], batch)
        out, _ = model.apply(
            variables, local, train=True, mutable=["batch_stats"]
        )
        y = local.y
        gmask = local.gmask
        if kind == "classification":
            import optax

            per = optax.softmax_cross_entropy_with_integer_labels(out, y)
        else:
            t = (y - mean) / (std + 1e-8)
            per = (out[:, 0] - t) ** 2
        num = (per * gmask).sum()
        den = gmask.sum()
        num, den = jax.lax.psum((num, den), "edge")
        return (num / jnp.maximum(den, 1.0))[None]

    def loss_fn(variables, stacked):
        losses = shard_map(
            local_fwd,
            mesh=mesh,
            in_specs=(P(), P("edge")),
            out_specs=P("edge"),
            check_rep=False,
        )(variables, stacked)
        return losses.mean()

    return loss_fn


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
