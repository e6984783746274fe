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
    line-graph operator. Requires num_node_slots % n_shards == 0."""
    V = pb.num_node_slots
    if V % n_shards:
        raise ValueError(f"node slots {V} % n_shards {n_shards} != 0")
    vl = V // n_shards
    src = np.asarray(pb.src)
    dst = np.asarray(pb.dst)
    w = np.asarray(pb.w, np.float32)
    rev = np.asarray(pb.rev)
    emask = np.asarray(pb.edge_mask, np.float32)
    owner = src // vl

    # edges to shards, original order preserved; global slot map
    gids = [np.where(owner == s)[0] for s in range(n_shards)]
    el = max((len(g) for g in gids), default=0)
    el = max(el, 1)
    slot_of_edge = np.empty(len(src), np.int64)
    for s, g in enumerate(gids):
        slot_of_edge[g] = np.arange(len(g))

    # node halo: per-shard unique remote dst nodes
    nexports: list[set] = [set() for _ in range(n_shards)]
    nimp_lists = []
    for s, g in enumerate(gids):
        remote = dst[g] // vl != s
        imp = np.unique(dst[g][remote])
        nimp_lists.append(imp)
        for node in imp:
            nexports[int(node // vl)].add(int(node))
    nexp_lists = [np.array(sorted(e), dtype=np.int64) for e in nexports]
    hx = max(max((len(e) for e in nexp_lists), default=0), 1)
    hi = max(max((len(i) for i in nimp_lists), default=0), 1)
    nexport_idx = np.zeros((n_shards, hx), np.int32)
    node_slot = {}
    for s, lst in enumerate(nexp_lists):
        nexport_idx[s, : len(lst)] = (lst - s * vl).astype(np.int32)
        for j, node in enumerate(lst):
            node_slot[int(node)] = s * hx + j
    nimport_flat = np.zeros((n_shards, hi), np.int32)
    for s, imp in enumerate(nimp_lists):
        for i, node in enumerate(imp):
            nimport_flat[s, i] = node_slot[int(node)]

    # edge halo: per-shard unique remote REVERSE edges of local edges
    eexports: list[set] = [set() for _ in range(n_shards)]
    eimp_lists = []
    for s, g in enumerate(gids):
        r = rev[g]
        r_owner = src[r] // vl
        imp = np.unique(r[r_owner != s])
        eimp_lists.append(imp)
        for ge in imp:
            eexports[int(src[ge] // vl)].add(int(ge))
    eexp_lists = [np.array(sorted(e), dtype=np.int64) for e in eexports]
    gx = max(max((len(e) for e in eexp_lists), default=0), 1)
    gi = max(max((len(i) for i in eimp_lists), default=0), 1)
    eexport_idx = np.zeros((n_shards, gx), np.int32)
    edge_slot = {}
    for s, lst in enumerate(eexp_lists):
        eexport_idx[s, : len(lst)] = slot_of_edge[lst].astype(np.int32)
        for j, ge in enumerate(lst):
            edge_slot[int(ge)] = s * gx + j
    eimport_flat = np.zeros((n_shards, gi), np.int32)
    for s, imp in enumerate(eimp_lists):
        for i, ge in enumerate(imp):
            eimport_flat[s, i] = edge_slot[int(ge)]

    # per-shard local edge arrays
    S = n_shards
    src_local = np.zeros((S, el), np.int32)
    dst_ext = np.zeros((S, el), np.int32)
    w_pad = np.zeros((S, el), np.float32)
    w_rev = np.zeros((S, el), np.float32)
    rev_ext = np.tile(np.arange(el, dtype=np.int32), (S, 1))  # self at padding
    em_pad = np.zeros((S, el), np.float32)
    for s, g in enumerate(gids):
        n = len(g)
        src_local[s, :n] = (src[g] - s * vl).astype(np.int32)
        # dst into [x_local | node_halo]
        d = dst[g]
        remote = d // vl != s
        imp_pos = {int(node): i for i, node in enumerate(nimp_lists[s])}
        d_ext = np.where(
            remote,
            vl + np.array([imp_pos.get(int(x), 0) for x in d], np.int64),
            d - s * vl,
        )
        dst_ext[s, :n] = d_ext.astype(np.int32)
        w_pad[s, :n] = w[g]
        w_rev[s, :n] = w[rev[g]]
        em_pad[s, :n] = emask[g]
        # rev into [xl_local | edge_halo]
        r = rev[g]
        r_owner = src[r] // vl
        r_remote = r_owner != s
        rimp_pos = {int(ge): i for i, ge in enumerate(eimp_lists[s])}
        r_ext = np.where(
            r_remote,
            el + np.array([rimp_pos.get(int(x), 0) for x in r], np.int64),
            slot_of_edge[r],
        )
        rev_ext[s, :n] = r_ext.astype(np.int32)

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
    """Masked training loss of a packed model (bn_axis='edge') over a
    halo-partitioned bundle; differentiable. Per-shard readouts are partial
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
