"""Halo-exchange edge partitioning for a single giant graph.

parallel/spmd.py offers two aggregation schemes: replicated-x + psum
(general, O(V F) comm per apply) and molecule-aligned local (zero comm,
only for disconnected batches). This module covers the hard middle case —
one connected graph too large to replicate — with locality-aware
partitioning:

  * nodes are split into contiguous ranges, one per shard;
  * every edge lives on its source's shard (so all aggregation outputs are
    shard-local);
  * each shard exports only the node rows that other shards' edges
    reference (the halo); one all_gather of the (padded) export buffers
    replaces the full-block psum, cutting comm from O(V F) to
    O(S * Hmax * F) where Hmax is the largest halo.

This is the graph analog of sequence-parallel boundary exchange: partial
per-shard aggregation overlapped with a boundary feature exchange over
ICI. The host-side partitioner is numpy; the device side is one shard_map
with a single all_gather (differentiable).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P


@dataclasses.dataclass
class HaloPartition:
    """Device arrays for halo_partitioned_spmm; leading axis = shard."""

    src_local: jnp.ndarray  # (S, El) int32 — local node index of edge source
    dst_local: jnp.ndarray  # (S, El) int32 — index into [x_local | halo]
    w: jnp.ndarray  # (S, El)
    export_idx: jnp.ndarray  # (S, Hx) int32 local node ids to export
    import_flat: jnp.ndarray  # (S, Hi) int32 into the (S*Hx) gathered rows
    nodes_per_shard: int
    n_imports: int

    @property
    def n_shards(self) -> int:
        return self.src_local.shape[0]


def build_halo_partition(
    src: np.ndarray, dst: np.ndarray, w: np.ndarray, num_nodes: int, n_shards: int
) -> HaloPartition:
    """Contiguous-range node partition; edges owned by their source shard."""
    if num_nodes % n_shards:
        raise ValueError(f"num_nodes {num_nodes} % n_shards {n_shards} != 0")
    vl = num_nodes // n_shards
    owner_src = src // vl
    owner_dst = dst // vl

    per_src, per_dst, per_w, per_import = [], [], [], []
    exports: list[set] = [set() for _ in range(n_shards)]
    for s in range(n_shards):
        sel = owner_src == s
        e_src = src[sel] - s * vl
        e_dst = dst[sel]
        e_own = owner_dst[sel]
        remote = e_own != s
        for node in np.unique(e_dst[remote]):
            exports[int(node // vl)].add(int(node))
        per_src.append(e_src.astype(np.int32))
        per_dst.append((e_dst, e_own, remote))
        per_w.append(w[sel].astype(np.float32))

    export_lists = [np.array(sorted(e), dtype=np.int64) for e in exports]
    hx = max((len(e) for e in export_lists), default=0)
    hx = max(hx, 1)
    export_idx = np.zeros((n_shards, hx), np.int32)
    slot_of = {}
    for s, lst in enumerate(export_lists):
        export_idx[s, : len(lst)] = (lst - s * vl).astype(np.int32)
        for j, node in enumerate(lst):
            slot_of[int(node)] = (s, j)

    # per-shard import tables + remap dst to [x_local | halo]
    el = max(len(a) for a in per_src)
    S = n_shards
    src_pad = np.zeros((S, el), np.int32)
    dst_pad = np.zeros((S, el), np.int32)
    w_pad = np.zeros((S, el), np.float32)
    import_lists = []
    for s in range(S):
        e_dst, e_own, remote = per_dst[s]
        imp = np.unique(e_dst[remote])
        imp_pos = {int(n): i for i, n in enumerate(imp)}
        imp_idx = np.array(
            [imp_pos.get(int(n), 0) for n in e_dst], dtype=np.int64
        ) if len(e_dst) else np.zeros(0, np.int64)
        dl = np.where(remote, vl + imp_idx, e_dst - s * vl).astype(np.int32)
        n = len(per_src[s])
        src_pad[s, :n] = per_src[s]
        dst_pad[s, :n] = dl
        w_pad[s, :n] = per_w[s]
        import_lists.append(imp)

    hi = max((len(i) for i in import_lists), default=0)
    hi = max(hi, 1)
    import_flat = np.zeros((S, hi), np.int32)
    for s, imp in enumerate(import_lists):
        for i, node in enumerate(imp):
            o, j = slot_of[int(node)]
            import_flat[s, i] = o * hx + j

    return HaloPartition(
        src_local=jnp.asarray(src_pad),
        dst_local=jnp.asarray(dst_pad),
        w=jnp.asarray(w_pad),
        export_idx=jnp.asarray(export_idx),
        import_flat=jnp.asarray(import_flat),
        nodes_per_shard=vl,
        n_imports=hi,
    )


def halo_partitioned_spmm(mesh: Mesh, part: HaloPartition):
    """Returns f(x_stacked (S, Vl, F) sharded over 'edge') -> same shape:
    the full-graph SpMM with only halo rows exchanged."""
    vl = part.nodes_per_shard

    def local(src, dst, w, export_idx, import_flat, x):
        x0 = x[0]
        exports = x0[export_idx[0]]  # (Hx, F)
        gathered = jax.lax.all_gather(exports, "edge")  # (S, Hx, F)
        halo = gathered.reshape(-1, x0.shape[-1])[import_flat[0]]  # (Hi, F)
        xx = jnp.concatenate([x0, halo], axis=0)
        out = jax.ops.segment_sum(
            w[0][:, None] * xx[dst[0]], src[0], num_segments=vl
        )
        return out[None]

    spec = P("edge")
    return lambda x: shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec, spec),
        out_specs=spec,
        check_rep=False,
    )(part.src_local, part.dst_local, part.w, part.export_idx,
      part.import_flat, x)
