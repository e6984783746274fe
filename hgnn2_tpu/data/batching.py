"""Static bucketed batching.

Replaces the reference's per-batch Python padding (functions/batching.py:
get_batches:52 + prepare_batch:77, which re-pads every batch to that
batch's own (Nmax, Emax)) with shape-bucketed batching: every batch is
padded to one of a small fixed set of (node, edge) bucket shapes and to a
fixed batch size, so XLA compiles one program per bucket and reuses it for
the whole run. Graph-count padding appends empty graphs (mask 0) that the
loss ignores.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Sequence

import numpy as np

from hgnn2_tpu import graphs
from hgnn2_tpu.graphs import GraphRecord, pad_to_bucket
from hgnn2_tpu.nn import ccn as ccn_mod

DEFAULT_NODE_BUCKETS = (16, 32, 64, 128)
DEFAULT_EDGE_BUCKETS = (32, 64, 128, 256, 512, 1024, 2048)


@dataclasses.dataclass
class DenseLoader:
    """Yields DenseGraphBatch objects with static bucketed shapes.

    sort=True groups graphs of similar size into the same batches
    (reference sort_batch, functions/batching.py:58-68) which minimizes
    padding waste; shuffle randomizes order each epoch.
    """

    records: Sequence[GraphRecord]
    batch_size: int
    task: int | None = None
    with_line_graph: bool = False
    node_buckets: Sequence[int] = DEFAULT_NODE_BUCKETS
    edge_buckets: Sequence[int] = DEFAULT_EDGE_BUCKETS
    sort: bool = True
    shuffle: bool = False
    seed: int = 0
    _epoch: int = 0

    def __iter__(self) -> Iterator[graphs.DenseGraphBatch]:
        idx = np.arange(len(self.records))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
            self._epoch += 1
        if self.sort:
            sizes = np.array([self.records[i].n_nodes for i in idx])
            idx = idx[np.argsort(sizes, kind="stable")]
        for s in range(0, len(idx), self.batch_size):
            chunk = [self.records[i] for i in idx[s : s + self.batch_size]]
            n_bucket = pad_to_bucket(max(r.n_nodes for r in chunk), self.node_buckets)
            kw = {}
            if self.with_line_graph:
                m_bucket = pad_to_bucket(
                    max(r.n_dir_edges for r in chunk), self.edge_buckets
                )
                kw = dict(m_max=m_bucket)
            yield graphs.make_dense_batch(
                chunk,
                n_max=n_bucket,
                with_line_graph=self.with_line_graph,
                batch_size=self.batch_size,
                task=self.task,
                **kw,
            )

    def __len__(self) -> int:
        return (len(self.records) + self.batch_size - 1) // self.batch_size


@dataclasses.dataclass
class CachedLoader:
    """Builds every batch of an inner loader once and replays the (already
    device-resident) batches on later epochs, reshuffling batch ORDER only.

    The reference re-pads every batch on the host every epoch
    (functions/batching.py:77) which makes real epochs host-bound; caching
    keeps epochs device-bound at the cost of fixed batch composition —
    molecules are NOT re-dealt into new batches each epoch (a deliberate
    SGD-semantics divergence from the reference; order-level shuffling
    keeps stochasticity for bucketed same-shape batches). redeal_every=K
    rebuilds the batches from the inner loader every K iterations — give
    the inner loader shuffle=True so each rebuild is a fresh deal. Build
    cost is paid once per (re)build, on first use or materialize().
    """

    inner: object
    shuffle: bool = True
    seed: int = 0
    redeal_every: int = 0
    _batches: list | None = None
    _epoch: int = 0
    _iters: int = 0

    def materialize(self) -> "CachedLoader":
        if self._batches is None:
            self._batches = list(self.inner)
        return self

    def peek_sample(self):
        """First cached batch WITHOUT starting an iteration — __iter__
        advances the re-deal clock, which would shift the redeal_every
        cadence by one epoch. The public way to get a tracing sample."""
        self.materialize()
        return self._batches[0]

    def batches(self) -> list:
        """The materialized batch list (built if needed), in deal order.
        The scanned-epoch path stacks these into bucket groups and then
        calls release(); re-deal cadence stays with maybe_redeal()."""
        self.materialize()
        return self._batches

    def release(self) -> None:
        """Drop the cached batches (rebuilt from the inner loader on the
        next materialize). The scanned-epoch path calls this after stacking
        the batches into bucket groups, so the per-batch copies don't stay
        resident alongside the stacks for the whole run."""
        self._batches = None

    def maybe_redeal(self) -> bool:
        """Advance the epoch counter; drop the cache when a re-deal is due
        (every redeal_every-th iteration). Returns True when the next
        materialize() will rebuild. Called by __iter__; the scanned-epoch
        path (which bypasses __iter__) calls it once per epoch and restacks
        its bucket groups when it returns True."""
        due = bool(
            self.redeal_every
            and self._iters
            and self._iters % self.redeal_every == 0
        )
        self._iters += 1
        if due:
            self._batches = None
        return due

    def __iter__(self):
        self.maybe_redeal()
        self.materialize()
        order = np.arange(len(self._batches))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
            self._epoch += 1
        for i in order:
            yield self._batches[i]

    def __len__(self) -> int:
        if self._batches is not None:
            return len(self._batches)
        return len(self.inner)


# capacity ladder for packed batches: ~1.06x steps, so a handful of
# compiled shapes cover a full run while padding waste stays <6%
_PACKED_BUCKETS = tuple(sorted({
    (1 << k) * m // 16 for k in range(4, 26) for m in range(16, 32)
}))


@dataclasses.dataclass
class PackedLoader:
    """Yields PackedGraphBatch objects (flat node/edge arrays + segment
    ids) with static bucketed capacities — the segment-sum layout
    (nn/packed.py PackedGNN/PackedLGGNN) as a shipped training path.

    Operator applications read int32 index arrays (4 B/edge) instead of
    the dense path's one-hot scatter matrices (4*N bytes/edge) — but TPU
    scatters process rows serially, so on ONE chip at molecule scale this
    layout loses to the dense one-hot MXU path at EVERY width measured
    (runs/packed_crossover: dense/packed epoch ratio 11.9x at GNN h=1
    narrowing to 4.1x at h=64; LGGNN 4.8x -> 2.2x — the gather cost
    amortizes over width but never crosses by h=64). Its role is the
    scaling layout (molecule-aligned sharding via --edge_shards) and the
    layout for graphs too large for dense blocks. uniform_caps (default)
    keeps the whole epoch ONE compiled program; the measured tradeoff vs
    the per-batch capacity ladder (GNN h=1, 32k molecules): 24 s compile
    + 0.47 s/epoch uniform vs 176 s compile + 0.23 s/epoch across 16
    ladder programs — uniform wins runs shorter than ~600 epochs on a
    cold compile cache, the ladder wins with a warm one (set
    uniform_caps=False). Compose with CachedLoader exactly like
    DenseLoader."""

    records: Sequence[GraphRecord]
    batch_size: int
    task: int | None = None
    sort: bool = True
    shuffle: bool = False
    seed: int = 0
    # ONE (node, edge) capacity for the whole epoch (the max batch load,
    # bucketed) instead of per-batch bucketing: every batch then shares
    # one compiled program and the scanned-epoch path stacks the epoch
    # into ONE bucket group (the per-batch ladder fragmented packed
    # epochs into ~30 scan groups, paying ~15x dense's dispatch count —
    # round-4 BENCH_DETAILS scanned_bucket_groups). Padding waste is
    # bounded by the sorted batches' load spread (QM9: <= ~25%).
    uniform_caps: bool = True
    _epoch: int = 0

    def __iter__(self) -> Iterator[graphs.PackedGraphBatch]:
        idx = np.arange(len(self.records))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
            self._epoch += 1
        if self.sort:
            sizes = np.array([self.records[i].n_nodes for i in idx])
            idx = idx[np.argsort(sizes, kind="stable")]
        chunks = [
            [self.records[i] for i in idx[s : s + self.batch_size]]
            for s in range(0, len(idx), self.batch_size)
        ]
        caps = [
            (sum(r.n_nodes for r in c), sum(r.n_dir_edges for r in c))
            for c in chunks
        ]
        if self.uniform_caps and caps:
            vmax = max(v for v, _ in caps)
            emax = max(e for _, e in caps)
            caps = [(vmax, emax)] * len(chunks)
        for chunk, (v, e) in zip(chunks, caps):
            yield graphs.make_packed_batch(
                chunk,
                node_capacity=pad_to_bucket(v, _PACKED_BUCKETS),
                edge_capacity=pad_to_bucket(e, _PACKED_BUCKETS),
                task=self.task,
                batch_size=self.batch_size,
            )

    def __len__(self) -> int:
        return (len(self.records) + self.batch_size - 1) // self.batch_size


@dataclasses.dataclass
class CCNLoader:
    """Yields CCNBatch objects with a static vertex capacity per batch."""

    records: Sequence[GraphRecord]
    batch_size: int
    task: int | None = None
    k_max: int | None = None
    vertex_buckets: Sequence[int] = (64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384)
    shuffle: bool = False
    seed: int = 0
    add_self_loops: bool = True
    _epoch: int = 0

    def __post_init__(self):
        if self.k_max is None:
            # global max receptive-field size so every batch shares one K;
            # per-record degrees are memoized on the GraphRecord so this
            # scan is O(records) on every loader after the first
            bump = 1 if self.add_self_loops else 0
            self.k_max = max(r.max_degree() + bump for r in self.records)

    def __iter__(self) -> Iterator[ccn_mod.CCNBatch]:
        idx = np.arange(len(self.records))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
            self._epoch += 1
        for s in range(0, len(idx), self.batch_size):
            chunk = [self.records[i] for i in idx[s : s + self.batch_size]]
            cap = pad_to_bucket(
                sum(r.n_nodes for r in chunk), self.vertex_buckets
            )
            yield ccn_mod.make_ccn_batch(
                chunk,
                k_max=self.k_max,
                vertex_capacity=cap,
                add_self_loops=self.add_self_loops,
                task=self.task,
                batch_size=self.batch_size,
            )

    def __len__(self) -> int:
        return (len(self.records) + self.batch_size - 1) // self.batch_size
