"""Graph containers: host-side records and device-side batched pytrees.

Replaces the reference's per-batch Python padding loop
(/root/reference/functions/batching.py:77 ``prepare_batch``) with static
bucketed packing: batches are padded to one of a small set of fixed
(Nmax, Mmax) bucket shapes so XLA compiles once per bucket, and batch
assembly is vectorized numpy (no per-sample torch.cat chains).

Two device layouts:
  * DenseGraphBatch — (B, N, N) dense adjacency blocks. The TPU-first
    layout for small molecules: every operator apply is one batched einsum
    on the MXU.
  * PackedGraphBatch — flat node/edge arrays with segment ids for
    gather/scatter segment-sum aggregation; the scalable layout for large
    graphs and edge-partitioned multi-chip execution.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np
import jax.numpy as jnp
from flax import struct

from hgnn2_tpu import operators


# ---------------------------------------------------------------------------
# Host-side record for one graph/molecule.
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class GraphRecord:
    """One graph on the host: features, adjacency and targets (numpy)."""

    x: np.ndarray  # (N, F) node features
    adj: np.ndarray  # (N, N) weighted symmetric adjacency
    y: np.ndarray  # (T,) regression targets or () int label
    lg: operators.LineGraph | None = None  # built lazily
    _max_degree: int | None = None  # memoized (CCN receptive-field scan)

    @property
    def n_nodes(self) -> int:
        return int(self.x.shape[0])

    def max_degree(self) -> int:
        """Largest unweighted degree (no self-loop); memoized so repeated
        loader construction (per split, per run) scans each record once."""
        if self._max_degree is None:
            self._max_degree = int((np.asarray(self.adj) > 0).sum(1).max())
        return self._max_degree

    def line_graph(self) -> operators.LineGraph:
        if self.lg is None:
            self.lg = operators.build_line_graph(self.adj)
        return self.lg

    @property
    def n_dir_edges(self) -> int:
        return self.line_graph().num_edges


# ---------------------------------------------------------------------------
# Dense-block batched layout.
# ---------------------------------------------------------------------------


@struct.dataclass
class DenseGraphBatch:
    """Padded dense batch. All shapes static per bucket.

    x:         (B, N, F) node features (zero at padded nodes)
    adj:       (B, N, N) adjacency (zero rows/cols at padding)
    node_mask: (B, N) 1.0 for real nodes
    y:         (B,) float targets or (B,) int labels
    n_nodes:   (B,) int32
    Line-graph fields (None when not built):
    lg_src/lg_dst: (B, M) int32 endpoints of directed edges (0 at padding)
    lg_w:      (B, M) edge weights (0 at padding)
    lg_rev:    (B, M) int32 reverse-edge index
    edge_mask: (B, M) 1.0 for real directed edges
    n_edges:   (B,) int32 directed edge counts
    """

    x: jnp.ndarray
    adj: jnp.ndarray
    node_mask: jnp.ndarray
    y: jnp.ndarray
    n_nodes: jnp.ndarray
    lg_src: jnp.ndarray | None = None
    lg_dst: jnp.ndarray | None = None
    lg_w: jnp.ndarray | None = None
    lg_rev: jnp.ndarray | None = None
    edge_mask: jnp.ndarray | None = None
    n_edges: jnp.ndarray | None = None

    @property
    def batch_size(self) -> int:
        return self.x.shape[0]

    @property
    def has_line_graph(self) -> bool:
        return self.lg_src is not None


def pad_to_bucket(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= n; raises if none fits."""
    for b in sorted(buckets):
        if b >= n:
            return b
    raise ValueError(f"size {n} exceeds largest bucket {max(buckets)}")


def make_dense_batch(
    records: Sequence[GraphRecord],
    n_max: int | None = None,
    m_max: int | None = None,
    with_line_graph: bool = False,
    batch_size: int | None = None,
    task: int | None = None,
) -> DenseGraphBatch:
    """Assemble a DenseGraphBatch from host records, padded to static shapes.

    batch_size pads the batch dimension itself (extra all-zero graphs with
    node_mask 0) so bucketed training reuses one compiled step.
    task selects one regression target column (reference prepare_batch
    T[i] = t[task], functions/batching.py:176).
    """
    bs = len(records)
    B = batch_size or bs
    N = n_max or max(r.n_nodes for r in records)
    F = records[0].x.shape[1]
    x = np.zeros((B, N, F), dtype=np.float32)
    adj = np.zeros((B, N, N), dtype=np.float32)
    node_mask = np.zeros((B, N), dtype=np.float32)
    n_nodes = np.zeros((B,), dtype=np.int32)
    ys = []
    for i, r in enumerate(records):
        n = r.n_nodes
        x[i, :n] = r.x
        adj[i, :n, :n] = r.adj
        node_mask[i, :n] = 1.0
        n_nodes[i] = n
        ys.append(r.y if task is None else r.y[task])
    y = np.stack([np.asarray(t) for t in ys], axis=0)
    if np.issubdtype(y.dtype, np.integer):
        y = np.concatenate([y, np.zeros((B - bs,) + y.shape[1:], y.dtype)])
    else:
        y = np.concatenate(
            [y.astype(np.float32), np.zeros((B - bs,) + y.shape[1:], np.float32)]
        )

    kw = {}
    if with_line_graph:
        lgs = [r.line_graph() for r in records]
        M = m_max or max(lg.num_edges for lg in lgs)
        lg_src = np.zeros((B, M), dtype=np.int32)
        lg_dst = np.zeros((B, M), dtype=np.int32)
        lg_w = np.zeros((B, M), dtype=np.float32)
        lg_rev = np.zeros((B, M), dtype=np.int32)
        edge_mask = np.zeros((B, M), dtype=np.float32)
        n_edges = np.zeros((B,), dtype=np.int32)
        for i, lg in enumerate(lgs):
            m = lg.num_edges
            lg_src[i, :m] = lg.src
            lg_dst[i, :m] = lg.dst
            lg_w[i, :m] = lg.w
            lg_rev[i, :m] = lg.rev
            edge_mask[i, :m] = 1.0
            n_edges[i] = m
        kw = dict(
            lg_src=jnp.asarray(lg_src),
            lg_dst=jnp.asarray(lg_dst),
            lg_w=jnp.asarray(lg_w),
            lg_rev=jnp.asarray(lg_rev),
            edge_mask=jnp.asarray(edge_mask),
            n_edges=jnp.asarray(n_edges),
        )
    return DenseGraphBatch(
        x=jnp.asarray(x),
        adj=jnp.asarray(adj),
        node_mask=jnp.asarray(node_mask),
        y=jnp.asarray(y),
        n_nodes=jnp.asarray(n_nodes),
        **kw,
    )


# ---------------------------------------------------------------------------
# Packed-sparse layout.
# ---------------------------------------------------------------------------


@struct.dataclass
class PackedGraphBatch:
    """Flat packed layout with segment ids (the scalable representation).

    x:        (V, F) node features, V = static node capacity
    node_gid: (V,) int32 graph id per node; padding rows point at graph B
              (one past the last real graph) so segment-sums drop them
    node_mask:(V,) 1.0 for real nodes
    src/dst:  (C,) int32 directed-edge endpoints as *global* node indices,
              C = static edge capacity; padded edges point at node V-1 with
              weight 0
    w:        (C,) edge weight (0 at padding)
    rev:      (C,) int32 global reverse-edge index
    edge_gid: (C,) int32 graph id per edge (B at padding)
    edge_mask:(C,)
    y:        (B,) targets
    gmask:    (B,) 1.0 for real graphs (0 for batch-size padding)
    n_graphs: static int (B)
    """

    x: jnp.ndarray
    node_gid: jnp.ndarray
    node_mask: jnp.ndarray
    src: jnp.ndarray
    dst: jnp.ndarray
    w: jnp.ndarray
    rev: jnp.ndarray
    edge_gid: jnp.ndarray
    edge_mask: jnp.ndarray
    y: jnp.ndarray
    gmask: jnp.ndarray = None
    n_graphs: int = struct.field(pytree_node=False, default=0)

    @property
    def num_node_slots(self) -> int:
        return self.x.shape[0]

    @property
    def num_edge_slots(self) -> int:
        return self.src.shape[0]


def make_packed_batch(
    records: Sequence[GraphRecord],
    node_capacity: int | None = None,
    edge_capacity: int | None = None,
    task: int | None = None,
    batch_size: int | None = None,
    feature_dim: int | None = None,
    y_dtype=None,
) -> PackedGraphBatch:
    """Pack many graphs into flat arrays with static capacities.

    batch_size pads the graph axis with empty graphs (gmask 0) so bucketed
    or sharded execution reuses one compiled program. An EMPTY record list
    builds an all-padding batch (every mask 0) — feature_dim and y_dtype
    must then be given so shapes/dtypes match sibling shards."""
    bs = len(records)
    B = batch_size or bs
    if bs > B:
        raise ValueError(f"{bs} records exceed batch_size {B}")
    tot_n = sum(r.n_nodes for r in records)
    lgs = [r.line_graph() for r in records]
    tot_m = sum(lg.num_edges for lg in lgs)
    V = node_capacity or tot_n
    C = edge_capacity or tot_m
    if tot_n > V:
        raise ValueError(f"node capacity too small: {tot_n} nodes > capacity {V}")
    if tot_m > C:
        raise ValueError(f"edge capacity too small: {tot_m} edges > capacity {C}")
    if records:
        F = records[0].x.shape[1]
    elif feature_dim is not None:
        F = feature_dim
    else:
        raise ValueError("feature_dim is required for an empty record list")
    if V < 1 or C < 1:
        raise ValueError("capacities must be >= 1 (padding needs one slot)")

    x = np.zeros((V, F), dtype=np.float32)
    node_gid = np.full((V,), B, dtype=np.int32)
    node_mask = np.zeros((V,), dtype=np.float32)
    src = np.full((C,), V - 1, dtype=np.int32)
    dst = np.full((C,), V - 1, dtype=np.int32)
    w = np.zeros((C,), dtype=np.float32)
    rev = np.arange(C, dtype=np.int32)
    edge_gid = np.full((C,), B, dtype=np.int32)
    edge_mask = np.zeros((C,), dtype=np.float32)

    n_off = 0
    e_off = 0
    ys = []
    for g, (r, lg) in enumerate(zip(records, lgs)):
        n, m = r.n_nodes, lg.num_edges
        x[n_off : n_off + n] = r.x
        node_gid[n_off : n_off + n] = g
        node_mask[n_off : n_off + n] = 1.0
        src[e_off : e_off + m] = lg.src + n_off
        dst[e_off : e_off + m] = lg.dst + n_off
        w[e_off : e_off + m] = lg.w
        rev[e_off : e_off + m] = lg.rev + e_off
        edge_gid[e_off : e_off + m] = g
        edge_mask[e_off : e_off + m] = 1.0
        n_off += n
        e_off += m
        ys.append(r.y if task is None else r.y[task])
    if ys:
        y = np.stack([np.asarray(t) for t in ys], axis=0)
        if not np.issubdtype(y.dtype, np.integer):
            y = y.astype(np.float32)
        if B > bs:
            y = np.concatenate([y, np.zeros((B - bs,) + y.shape[1:], y.dtype)])
    else:
        y = np.zeros((B,), y_dtype or np.float32)
    gmask = np.zeros((B,), np.float32)
    gmask[:bs] = 1.0
    return PackedGraphBatch(
        x=jnp.asarray(x),
        node_gid=jnp.asarray(node_gid),
        node_mask=jnp.asarray(node_mask),
        src=jnp.asarray(src),
        dst=jnp.asarray(dst),
        w=jnp.asarray(w),
        rev=jnp.asarray(rev),
        edge_gid=jnp.asarray(edge_gid),
        edge_mask=jnp.asarray(edge_mask),
        y=jnp.asarray(y),
        gmask=jnp.asarray(gmask),
        n_graphs=B,
    )
