"""Graph-operator construction (host-side, numpy).

Replaces the reference's dense operator builder
(/root/reference/functions/operators.py:11 ``graph_operators``) with an
edge-list-first construction:

  * the power-operator stack {I, D, A, A^2, A^4, ...} is never materialized
    on device — models apply the operators directly (see ops/dense.py,
    ops/sparse.py). The dense materializers here exist for preprocessing,
    tests and oracles.
  * the directed line graph is represented as (src, dst, w, rev) int arrays;
    the non-backtracking (NB) operator and the signed incidence maps Pm/Pd
    are derived from it.  This fixes, by construction, the reference's
    edge-indexing bug (operators.py:49-66: the edge counter `e` is bumped
    only once per undirected edge so reverse edges get overwritten and
    slots E+1..2E-1 stay zero).  ``line_graph_dense_compat`` reproduces the
    reference's buggy output bit-for-bit for parity testing.

Conventions (matching the reference's intent):
  * Directed edges come in (forward, reverse) pairs: e_{2k} = (i->j),
    e_{2k+1} = (j->i) for the k-th undirected edge (i<j), scanning the
    upper triangle row-major.  M = 2E. Self-loops are excluded (the
    reference scans j>i only).
  * Pm[u, e] = Pm[v, e] = 1 for e = (u->v); Pd[u, e] = +1, Pd[v, e] = -1
    (i.e. +1 at the source, -1 at the destination — reference
    operators.py:52-63 writes +1 at the lexicographically smaller endpoint
    of the forward copy and the sign-flipped pattern for the reverse copy,
    which is exactly source:+1 / dest:-1 for both).
  * NB adjacency: AL[m1, m2] = w(m2) iff dst(m1) == src(m2) and
    src(m1) != dst(m2) (no backtracking), cf. operators.py:68-71.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class LineGraph:
    """Directed line-graph (edge-dual) structure of one graph.

    Attributes:
      src: (M,) int32 — source node of each directed edge.
      dst: (M,) int32 — destination node.
      w:   (M,) float32 — edge weight (bond order for QM9).
      rev: (M,) int32 — index of the reverse edge (rev[2k] = 2k+1).
    """

    src: np.ndarray
    dst: np.ndarray
    w: np.ndarray
    rev: np.ndarray

    @property
    def num_edges(self) -> int:
        return int(self.src.shape[0])


def undirected_edges(A: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Upper-triangular (i<j) edge list of a symmetric adjacency.

    Returns (edges, weights): edges (E, 2) int32 row-major over the upper
    triangle, weights (E,) float32 = A[i, j]. Self-loops excluded.
    """
    A = np.asarray(A)
    iu, ju = np.triu_indices(A.shape[0], k=1)
    keep = A[iu, ju] != 0
    edges = np.stack([iu[keep], ju[keep]], axis=1).astype(np.int32)
    return edges, A[iu[keep], ju[keep]].astype(np.float32)


def build_line_graph(A: np.ndarray, use_native: bool = True) -> LineGraph:
    """Directed line graph with interleaved forward/reverse edge pairs.

    Uses the C++ library (hgnn2_tpu.native) when available; the numpy path
    below is the reference implementation and fallback.
    """
    if use_native:
        try:
            from hgnn2_tpu import native

            out = native.build_line_graph_native(np.asarray(A, dtype=np.float32))
            if out is not None:
                src, dst, w, rev = out
                return LineGraph(src=src, dst=dst, w=w, rev=rev)
        except ImportError:
            pass
    edges, w = undirected_edges(A)
    E = edges.shape[0]
    src = np.empty(2 * E, dtype=np.int32)
    dst = np.empty(2 * E, dtype=np.int32)
    ww = np.empty(2 * E, dtype=np.float32)
    src[0::2], dst[0::2] = edges[:, 0], edges[:, 1]
    src[1::2], dst[1::2] = edges[:, 1], edges[:, 0]
    ww[0::2] = w
    ww[1::2] = w
    rev = np.arange(2 * E, dtype=np.int32)
    rev[0::2] += 1
    rev[1::2] -= 1
    return LineGraph(src=src, dst=dst, w=ww, rev=rev)


def degrees(A: np.ndarray) -> np.ndarray:
    """Weighted degree vector d[i] = sum_j A[i, j] (reference operators.py:22)."""
    return np.asarray(A, dtype=np.float32).sum(axis=1)


def operator_stack_dense(A: np.ndarray, J: int = 1) -> np.ndarray:
    """Dense (N, N, J+2) stack [I, diag(d), A, A^2, A^4, ...].

    Slot j+2 holds A^(2^(j-1)) obtained by repeated squaring, matching
    reference operators.py:26-29 (C <- C @ C per extra slot).
    """
    A = np.asarray(A, dtype=np.float32)
    N = A.shape[0]
    out = np.zeros((N, N, J + 2), dtype=np.float32)
    out[:, :, 0] = np.eye(N, dtype=np.float32)
    out[:, :, 1] = np.diag(degrees(A))
    out[:, :, 2] = A
    C = A.copy()
    for j in range(1, J):
        C = C @ C
        out[:, :, j + 2] = C
    return out


def nb_adjacency_dense(lg: LineGraph) -> np.ndarray:
    """Dense (M, M) non-backtracking adjacency: AL[m1, m2] = w(m2) iff
    dst(m1) == src(m2) and src(m1) != dst(m2)."""
    M = lg.num_edges
    cont = lg.dst[:, None] == lg.src[None, :]
    backtrack = lg.src[:, None] == lg.dst[None, :]
    AL = np.where(cont & ~backtrack, lg.w[None, :], 0.0)
    return AL.astype(np.float32).reshape(M, M)


def incidence_dense(lg: LineGraph, n_nodes: int) -> tuple[np.ndarray, np.ndarray]:
    """Dense signed incidence maps Pm, Pd of shape (N, M).

    Pm[u, e] = Pm[v, e] = 1 for e = (u -> v); Pd[src, e] = +1,
    Pd[dst, e] = -1.
    """
    M = lg.num_edges
    Pm = np.zeros((n_nodes, M), dtype=np.float32)
    Pd = np.zeros((n_nodes, M), dtype=np.float32)
    e = np.arange(M)
    Pm[lg.src, e] = 1.0
    Pm[lg.dst, e] = 1.0
    Pd[lg.src, e] = 1.0
    Pd[lg.dst, e] = -1.0
    return Pm, Pd


def line_graph_operator_stack_dense(A: np.ndarray, J: int = 1):
    """Dense intended-semantics line-graph operators.

    Returns (WL, Pm, Pd): WL (M, M, J+2) = [I, diag(dL), AL, AL^2, ...],
    Pm/Pd (N, M).  M = 2E (all reverse edges present — the fixed semantics,
    unlike the reference's overwritten slots).
    """
    A = np.asarray(A, dtype=np.float32)
    lg = build_line_graph(A)
    M = lg.num_edges
    AL = nb_adjacency_dense(lg)
    WL = np.zeros((M, M, J + 2), dtype=np.float32)
    WL[:, :, 0] = np.eye(M, dtype=np.float32)
    WL[:, :, 1] = np.diag(AL.sum(axis=1))
    WL[:, :, 2] = AL
    CL = AL.copy()
    for j in range(1, J):
        CL = CL @ CL
        WL[:, :, j + 2] = CL
    Pm, Pd = incidence_dense(lg, A.shape[0])
    return WL, Pm, Pd


def line_graph_dense_compat(A: np.ndarray, J: int = 1):
    """Bit-faithful emulation of the reference's buggy line-graph builder.

    Reference operators.py:36-83: M = nnz(A) (counts self-loops once and
    both triangle halves), and the edge slot counter advances only once per
    undirected edge, so each forward edge k >= 1 overwrites the reverse copy
    of edge k-1 in `edges` while Pm/Pd retain the stale writes (no zeroing).
    Only needed to validate numerical parity against reference checkpoints;
    new code should use line_graph_operator_stack_dense.
    """
    A = np.asarray(A, dtype=np.float32)
    N = A.shape[0]
    M = int(np.count_nonzero(A))
    Pm = np.zeros((N, M), dtype=np.float32)
    Pd = np.zeros((N, M), dtype=np.float32)
    edges = np.zeros((M, 3), dtype=np.float32)
    e = 0
    for i in range(N):
        for j in range(i + 1, N):
            if A[i, j] != 0:
                Pm[i, e] = 1.0
                Pm[j, e] = 1.0
                Pd[i, e] = 1.0
                Pd[j, e] = -1.0
                edges[e] = (i, j, A[i, j])
                e += 1
                Pm[i, e] = 1.0
                Pm[j, e] = 1.0
                Pd[i, e] = -1.0
                Pd[j, e] = 1.0
                edges[e] = (j, i, A[i, j])
                # NOTE: no second increment — faithful to the reference bug.
    cont = edges[:, 1][:, None] == edges[:, 0][None, :]
    backtrack = edges[:, 0][:, None] == edges[:, 1][None, :]
    AL = np.where(cont & ~backtrack, edges[:, 2][None, :], 0.0).astype(np.float32)
    # Edge rows never written remain (0, 0, 0): the all-zeros row pattern
    # makes cont[m1, m2] true for pairs of zero rows; the reference computes
    # the same comparisons on its zero rows, so this matches it exactly.
    WL = np.zeros((M, M, J + 2), dtype=np.float32)
    WL[:, :, 0] = np.eye(M, dtype=np.float32)
    WL[:, :, 1] = np.diag(AL.sum(axis=1))
    WL[:, :, 2] = AL
    CL = AL.copy()
    for j in range(1, J):
        CL = CL @ CL
        WL[:, :, j + 2] = CL
    return WL, Pm, Pd
