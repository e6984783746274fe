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


def _halo_exchange_tables(ref_shard, items, item_owner, item_local,
                          n_shards: int, id_space: int):
    """Vectorized export/import tables for one halo exchange.

    ref_shard/items: per-reference arrays (e.g. one entry per cut edge) of
    the REFERENCING shard and the referenced global item id.
    item_owner(ids) -> owning shard; item_local(ids) -> the item's index in
    its owner's export source array. Returns
    (export_idx (S, cap), import_flat (S, icap), icap, up, imp_slot) where
    up is the sorted unique (shard, item) pair-key array and imp_slot the
    per-pair slot within its shard's (item-sorted) import list — feed both
    to _remap_refs to rewrite per-reference indices into [local | halo]."""
    S = n_shards
    pair = ref_shard.astype(np.int64) * id_space + items
    up = np.unique(pair)
    imp_shard = up // id_space
    imp_item = up % id_space
    # export side: unique items grouped by owner, item-sorted within owner
    exp_items = np.unique(imp_item)
    exp_owner = np.asarray(item_owner(exp_items), np.int64)
    order = np.argsort(exp_owner, kind="stable")
    eo = exp_owner[order]
    counts = np.bincount(eo, minlength=S)
    cap = max(int(counts.max()) if exp_items.size else 0, 1)
    start = np.concatenate([[0], np.cumsum(counts)])
    slot = np.arange(len(eo)) - start[eo]
    export_idx = np.zeros((S, cap), np.int32)
    export_idx[eo, slot] = np.asarray(
        item_local(exp_items[order]), np.int64
    ).astype(np.int32)
    # flat slot of each export item in the (S*cap) all_gather buffer,
    # aligned with the item-sorted exp_items for searchsorted lookups
    flat_by_item = np.zeros(len(exp_items), np.int64)
    flat_by_item[order] = eo * cap + slot
    # import side: up is sorted by (shard, item), so one pass gives every
    # shard's item-sorted import list
    icounts = np.bincount(imp_shard, minlength=S)
    icap = max(int(icounts.max()) if up.size else 0, 1)
    istart = np.concatenate([[0], np.cumsum(icounts)])
    imp_slot = np.arange(len(up)) - istart[imp_shard]
    import_flat = np.zeros((S, icap), np.int32)
    if up.size:
        pos = np.searchsorted(exp_items, imp_item)
        import_flat[imp_shard, imp_slot] = flat_by_item[pos].astype(np.int32)
    return export_idx, import_flat, icap, up, imp_slot


def _remap_refs(ref_shard, items, remote, up, imp_slot, id_space: int,
                local_vals, offset: int):
    """Per-reference index into [local | halo]: local_vals where local,
    offset + the shard's import slot where remote."""
    if not up.size:
        return np.asarray(local_vals, np.int64)
    pair = ref_shard.astype(np.int64) * id_space + items
    pos = np.clip(np.searchsorted(up, pair), 0, len(up) - 1)
    return np.where(remote, offset + imp_slot[pos], local_vals)


def _shard_scatter_plan(owner, n_shards: int, min_cap: int = 0):
    """Row/col scatter coordinates that place each element into its shard's
    padded row while preserving original order within a shard. Returns
    (row, col, order, cap)."""
    order = np.argsort(owner, kind="stable")
    counts = np.bincount(owner, minlength=n_shards)
    cap = max(int(counts.max()) if len(owner) else 0, min_cap)
    starts = np.concatenate([[0], np.cumsum(counts)])
    row = owner[order]
    col = np.arange(len(order)) - starts[row]
    return row, col, order, cap


def build_halo_partition(
    src: np.ndarray, dst: np.ndarray, w: np.ndarray, num_nodes: int,
    n_shards: int, to_device: bool = True
) -> HaloPartition:
    """Contiguous-range node partition; edges owned by their source shard.

    Fully vectorized host-side build (numpy sort/unique/bincount group-bys,
    O(E log E)) — the giant-graph regime this partitioning exists for means
    millions of edges, where per-edge Python loops would dominate the run.
    bench_suite.py's halo_partition_build row records build time at 10^6+
    edges. to_device=False keeps the tables as numpy (jax converts on first
    use) — benchmarks use it to time the host build separately from the
    device transfer."""
    if num_nodes % n_shards:
        raise ValueError(f"num_nodes {num_nodes} % n_shards {n_shards} != 0")
    vl = num_nodes // n_shards
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    w = np.asarray(w)
    S = n_shards
    owner_src = src // vl
    remote = owner_src != dst // vl

    export_idx, import_flat, hi, up, imp_slot = _halo_exchange_tables(
        owner_src[remote], dst[remote],
        item_owner=lambda n: n // vl, item_local=lambda n: n - (n // vl) * vl,
        n_shards=S, id_space=num_nodes,
    )
    dst_local_g = _remap_refs(owner_src, dst, remote, up, imp_slot,
                              num_nodes, dst - owner_src * vl, vl)

    # scatter edges into padded (S, el) rows, original order per shard
    row, col, order, el = _shard_scatter_plan(owner_src, S)
    src_pad = np.zeros((S, el), np.int32)
    dst_pad = np.zeros((S, el), np.int32)
    w_pad = np.zeros((S, el), np.float32)
    src_pad[row, col] = (src[order] - row * vl).astype(np.int32)
    dst_pad[row, col] = dst_local_g[order].astype(np.int32)
    w_pad[row, col] = w[order].astype(np.float32)

    conv = jnp.asarray if to_device else (lambda a: a)
    return HaloPartition(
        src_local=conv(src_pad),
        dst_local=conv(dst_pad),
        w=conv(w_pad),
        export_idx=conv(export_idx),
        import_flat=conv(import_flat),
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


# ---------------------------------------------------------------------------
# Full LGGNN under halo partitioning.
#
# Every line-graph operator reduces to two halo primitives once edges are
# owned by their SOURCE node's shard:
#   * node halo — rows of a per-shard (Vl, F) node array referenced by local
#     edges' remote dst (feeds SpMM, Pm^T/Pd^T and the NB operator's
#     y[dst] term);
#   * edge halo — features of the REVERSE edges of cut edges, which live on
#     the dst node's shard (feeds the NB correction term and turns
#     Pm/Pd into purely local scatters via
#     sum_{e: dst=v} f(e)  ==  sum_{e': src=v} f(rev(e'))  — reverse pairs
#     exchange roles, so the dst-sum over remote-owned edges becomes a
#     src-sum over local edges of halo-imported reverse features).
# Reference semantics matched at giant-graph scale:
# /root/reference/functions/operators.py:68-71 (NB line graph) and
# functions/utils.py:55 (Pmul).
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class HaloLGBundle:
    """Stacked (leading axis = shard) device arrays for a full packed
    GNN/LGGNN under halo partitioning, plus replicated per-graph arrays."""

    arrays: dict  # stacked per-shard arrays, shard on 'edge'
    y: jnp.ndarray  # (B,) replicated
    gmask: jnp.ndarray  # (B,)
    n_graphs: int
    nodes_per_shard: int
    halo_sizes: dict  # {"node_export": Hx, "node_import": Hi,
    #                    "edge_export": Gx, "edge_import": Gi}

    @property
    def n_shards(self) -> int:
        return self.arrays["x"].shape[0]


def build_halo_lg_bundle(pb, n_shards: int) -> HaloLGBundle:
    """Partition a PackedGraphBatch (typically one giant graph) into
    n_shards contiguous node ranges with full halo tables for every
    line-graph operator. Requires num_node_slots % n_shards == 0.

    Host-side build is fully vectorized (same group-by machinery as
    build_halo_partition) so million-edge giant graphs partition in
    O(E log E) numpy time, not per-edge Python."""
    V = pb.num_node_slots
    if V % n_shards:
        raise ValueError(f"node slots {V} % n_shards {n_shards} != 0")
    vl = V // n_shards
    S = n_shards
    src = np.asarray(pb.src, np.int64)
    dst = np.asarray(pb.dst, np.int64)
    w = np.asarray(pb.w, np.float32)
    rev = np.asarray(pb.rev, np.int64)
    emask = np.asarray(pb.edge_mask, np.float32)
    E = len(src)
    owner = src // vl

    # edges to shards, original order preserved; global slot map
    row, col, order, el = _shard_scatter_plan(owner, S, min_cap=1)
    slot_of_edge = np.empty(E, np.int64)
    slot_of_edge[order] = col

    # node halo: per-shard unique remote dst nodes
    n_remote = dst // vl != owner
    nexport_idx, nimport_flat, hi, n_up, n_slot = _halo_exchange_tables(
        owner[n_remote], dst[n_remote],
        item_owner=lambda n: n // vl, item_local=lambda n: n - (n // vl) * vl,
        n_shards=S, id_space=V,
    )
    hx = nexport_idx.shape[1]

    # edge halo: per-shard unique remote REVERSE edges of local edges
    r_owner = owner[rev]
    e_remote = r_owner != owner
    eexport_idx, eimport_flat, gi, e_up, e_slot = _halo_exchange_tables(
        owner[e_remote], rev[e_remote],
        item_owner=lambda ge: owner[ge], item_local=lambda ge: slot_of_edge[ge],
        n_shards=S, id_space=max(E, 1),
    )
    gx = eexport_idx.shape[1]

    # per-edge remaps into [local | halo] coordinates
    d_ext = _remap_refs(owner, dst, n_remote, n_up, n_slot, V,
                        dst - owner * vl, vl)
    r_ext = _remap_refs(owner, rev, e_remote, e_up, e_slot, max(E, 1),
                        slot_of_edge[rev], el)

    # per-shard local edge arrays (scatter, original order per shard)
    src_local = np.zeros((S, el), np.int32)
    dst_ext = np.zeros((S, el), np.int32)
    w_pad = np.zeros((S, el), np.float32)
    w_rev = np.zeros((S, el), np.float32)
    rev_ext = np.tile(np.arange(el, dtype=np.int32), (S, 1))  # self at padding
    em_pad = np.zeros((S, el), np.float32)
    src_local[row, col] = (src[order] - row * vl).astype(np.int32)
    dst_ext[row, col] = d_ext[order].astype(np.int32)
    w_pad[row, col] = w[order]
    w_rev[row, col] = w[rev[order]]
    em_pad[row, col] = emask[order]
    rev_ext[row, col] = r_ext[order].astype(np.int32)

    x = np.asarray(pb.x)
    node_gid = np.asarray(pb.node_gid)
    node_mask = np.asarray(pb.node_mask, np.float32)
    arrays = {
        "x": jnp.asarray(x.reshape(S, vl, -1)),
        "node_gid": jnp.asarray(node_gid.reshape(S, vl)),
        "node_mask": jnp.asarray(node_mask.reshape(S, vl)),
        "src_local": jnp.asarray(src_local),
        "dst_ext": jnp.asarray(dst_ext),
        "w": jnp.asarray(w_pad),
        "w_rev": jnp.asarray(w_rev),
        "rev_ext": jnp.asarray(rev_ext),
        "edge_mask": jnp.asarray(em_pad),
        "nexport_idx": jnp.asarray(nexport_idx),
        "nimport_flat": jnp.asarray(nimport_flat),
        "eexport_idx": jnp.asarray(eexport_idx),
        "eimport_flat": jnp.asarray(eimport_flat),
    }
    return HaloLGBundle(
        arrays=arrays,
        y=jnp.asarray(pb.y),
        gmask=jnp.asarray(
            pb.gmask if pb.gmask is not None else np.ones(pb.y.shape, np.float32)
        ),
        n_graphs=pb.n_graphs,
        nodes_per_shard=vl,
        halo_sizes={"node_export": hx, "node_import": hi,
                    "edge_export": gx, "edge_import": gi},
    )


class HaloLocalOps:
    """SparsePackedOps-compatible operator bundle for ONE shard, used inside
    a shard_map over the 'edge' axis. Aggregation outputs are shard-local by
    edge ownership; remote reads go through the two halo exchanges
    (all_gather of the small export buffers — O(S * H * F) instead of the
    psum path's O(V * F) per apply). comm_log, when given, records the
    feature width of every halo exchange at trace time for exact
    comm-volume accounting."""

    def __init__(self, t: dict, J: int, axis: str = "edge",
                 comm_log: dict | None = None):
        self.t = t
        self.J = J
        self.axis = axis
        self.comm_log = comm_log
        # identity-memoized exchanges: pm+pd (and pm_t+pd_t) read the SAME
        # input per layer — one all_gather serves both, and comm_log then
        # counts exactly what the compiled program sends. The cache holds a
        # strong ref to the key array so ids cannot be recycled; the ops
        # object lives for a single trace, bounding the cache's lifetime.
        self._ext_cache: dict = {}
        vl = t["x"].shape[0]
        self.vl = vl
        self.deg = jax.ops.segment_sum(t["w"], t["src_local"], num_segments=vl)
        deg_ext = self._node_ext(self.deg[:, None])
        self.dl = (deg_ext[t["dst_ext"], 0] - t["w_rev"]) * t["edge_mask"]

    def _log(self, kind: str, width: int):
        if self.comm_log is not None:
            self.comm_log[kind].append(int(width))

    def _cached(self, kind: str, x, compute):
        key = (kind, id(x))
        hit = self._ext_cache.get(key)
        if hit is not None and hit[0] is x:
            return hit[1]
        out = compute()
        self._ext_cache[key] = (x, out)
        return out

    def _node_ext(self, x):
        """[x_local | halo rows imported from other shards]: (Vl+Hi, F)."""

        def compute():
            self._log("node_halo", x.shape[-1])
            exports = x[self.t["nexport_idx"]]
            gathered = jax.lax.all_gather(exports, self.axis)
            halo = gathered.reshape(-1, x.shape[-1])[self.t["nimport_flat"]]
            return jnp.concatenate([x, halo], axis=0)

        return self._cached("node", x, compute)

    def _edge_ext(self, xl):
        """[xl_local | reverse-edge halo]: (El+Gi, F)."""

        def compute():
            self._log("edge_halo", xl.shape[-1])
            exports = xl[self.t["eexport_idx"]]
            gathered = jax.lax.all_gather(exports, self.axis)
            halo = gathered.reshape(-1, xl.shape[-1])[self.t["eimport_flat"]]
            return jnp.concatenate([xl, halo], axis=0)

        return self._cached("edge", xl, compute)

    def _spmm(self, x):
        xx = self._node_ext(x)
        return jax.ops.segment_sum(
            self.t["w"][:, None] * xx[self.t["dst_ext"]],
            self.t["src_local"], num_segments=self.vl,
        )

    def graph_op(self, x):
        blocks = [x, self.deg[:, None] * x]
        cur = x
        applied = 0
        for j in range(self.J):
            target = 2**j
            while applied < target:
                cur = self._spmm(cur)
                applied += 1
            blocks.append(cur)
        return jnp.concatenate(blocks, axis=1)

    def _nb(self, xl):
        t = self.t
        y = jax.ops.segment_sum(
            t["w"][:, None] * xl, t["src_local"], num_segments=self.vl
        )
        yy = self._node_ext(y)
        xle = self._edge_ext(xl)
        out = yy[t["dst_ext"]] - t["w_rev"][:, None] * xle[t["rev_ext"]]
        return out * t["edge_mask"][:, None]

    def lg_graph_op(self, xl):
        blocks = [xl, self.dl[:, None] * xl]
        cur = xl
        applied = 0
        for j in range(self.J):
            target = 2**j
            while applied < target:
                cur = self._nb(cur)
                applied += 1
            blocks.append(cur)
        return jnp.concatenate(blocks, axis=1)

    def _pm_pd(self, xl, signed: bool):
        t = self.t
        xle = self._edge_ext(xl)
        xrev = xle[t["rev_ext"]]
        contrib = (xl - xrev) if signed else (xl + xrev)
        return jax.ops.segment_sum(
            contrib * t["edge_mask"][:, None],
            t["src_local"], num_segments=self.vl,
        )

    def pm(self, xl):
        return self._pm_pd(xl, signed=False)

    def pd(self, xl):
        return self._pm_pd(xl, signed=True)

    def _pm_pd_t(self, x, signed: bool):
        t = self.t
        xx = self._node_ext(x)
        a = x[t["src_local"]]
        b = xx[t["dst_ext"]]
        out = (a - b) if signed else (a + b)
        return out * t["edge_mask"][:, None]

    def pm_t(self, x):
        return self._pm_pd_t(x, signed=False)

    def pd_t(self, x):
        return self._pm_pd_t(x, signed=True)

    def nb_degrees(self):
        return self.dl


def halo_packed_loss(model, mesh: Mesh, bundle: HaloLGBundle,
                     kind: str = "regression", mean: float = 0.0,
                     std: float = 1.0, comm_log: dict | None = None):
    """Masked training loss of a packed model (PackedLGGNN or PackedGNN,
    built with bn_axis='edge') over a halo-partitioned bundle;
    differentiable. The model receives the HaloLocalOps bundle via ops=
    (PackedGNN uses only its graph_op). Per-shard readouts are partial
    sums (each shard owns a node range), assembled by one psum of the tiny
    (B, dim) output block."""
    from hgnn2_tpu.graphs import PackedGraphBatch

    def local_fwd(variables, arrays, y, gmask):
        t = jax.tree_util.tree_map(lambda v: v[0], arrays)
        ops = HaloLocalOps(t, J=model.J, comm_log=comm_log)
        pb = PackedGraphBatch(
            x=t["x"], node_gid=t["node_gid"], node_mask=t["node_mask"],
            src=t["src_local"], dst=t["dst_ext"], w=t["w"],
            rev=t["rev_ext"], edge_gid=jnp.zeros_like(t["src_local"]),
            edge_mask=t["edge_mask"], y=y, gmask=gmask,
            n_graphs=bundle.n_graphs,
        )
        out, _ = model.apply(variables, pb, train=True, ops=ops,
                             mutable=["batch_stats"])
        out = jax.lax.psum(out, "edge")  # assemble partial readouts
        if kind == "classification":
            import optax

            per = optax.softmax_cross_entropy_with_integer_labels(out, y)
        else:
            t_norm = (y - mean) / (std + 1e-8)
            per = (out[:, 0] - t_norm) ** 2
        loss = (per * gmask).sum() / jnp.maximum(gmask.sum(), 1.0)
        return loss[None]

    def loss_fn(variables, bundle_arrays=None):
        arrays = bundle_arrays if bundle_arrays is not None else bundle.arrays
        losses = shard_map(
            local_fwd,
            mesh=mesh,
            in_specs=(P(), P("edge"), P(), P()),
            out_specs=P("edge"),
            check_rep=False,
        )(variables, arrays, bundle.y, bundle.gmask)
        return losses.mean()

    return loss_fn


def halo_comm_bytes(comm_log: dict, bundle: HaloLGBundle, n_shards: int,
                    dtype_bytes: int = 4) -> dict:
    """Exact halo-exchange volume of one traced forward (fill comm_log by
    tracing a forward through halo_packed_loss). An all_gather of a (H, F)
    export buffer delivers (S-1) remote buffers to each chip:
    (S-1) * H * F * dtype_bytes received per chip per exchange. The
    backward transposes each all_gather into a reduce_scatter of equal
    volume, doubling the training-step total."""
    hx = bundle.halo_sizes["node_export"]
    gx = bundle.halo_sizes["edge_export"]
    node = sum((n_shards - 1) * hx * f * dtype_bytes
               for f in comm_log.get("node_halo", []))
    edge = sum((n_shards - 1) * gx * f * dtype_bytes
               for f in comm_log.get("edge_halo", []))
    return {
        "n_node_halo_fwd": len(comm_log.get("node_halo", [])),
        "n_edge_halo_fwd": len(comm_log.get("edge_halo", [])),
        "forward_bytes_per_chip": node + edge,
        "train_step_bytes_per_chip": 2 * (node + edge),
        "node_halo_rows": hx,
        "edge_halo_rows": gx,
    }


def new_comm_log() -> dict:
    return {"node_halo": [], "edge_halo": []}
