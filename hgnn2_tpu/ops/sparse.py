"""Packed-sparse graph operators (segment-sum path).

Gather/scatter implementation over flat (node, edge) arrays with segment
ids — the scalable layout for graphs too large for dense blocks and for
edge-partitioned multi-chip execution (see parallel/edge_partition.py).
Semantics identical to ops/dense.py; tests cross-check the two paths.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def spmm(
    src: jnp.ndarray, dst: jnp.ndarray, w: jnp.ndarray, x: jnp.ndarray, num_nodes: int
) -> jnp.ndarray:
    """(A @ X)[i] = sum_{e: src(e)=i} w(e) * X[dst(e)].  x: (V, F) -> (V, F).

    Padded edges carry w = 0 so they contribute nothing wherever they point.
    """
    return jax.ops.segment_sum(w[:, None] * x[dst], src, num_segments=num_nodes)


def degrees(src: jnp.ndarray, w: jnp.ndarray, num_nodes: int) -> jnp.ndarray:
    """Weighted degree d[i] = sum_{e: src(e)=i} w(e)."""
    return jax.ops.segment_sum(w, src, num_segments=num_nodes)


def graph_op(
    src, dst, w, x: jnp.ndarray, num_nodes: int, J: int, deg: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Packed multi-operator apply [X | d*X | A X | A^2 X | ...] -> (V, (J+2)F).

    A^(2^(j-1)) X is computed by repeated application of A (never
    materializing powers) — same operator semantics as reference
    operators.py:26-29 at O(E) per application.
    """
    if deg is None:
        deg = degrees(src, w, num_nodes)
    blocks = [x, deg[:, None] * x]
    cur = x
    applied = 0
    for j in range(J):
        target = 2**j
        while applied < target:
            cur = spmm(src, dst, w, cur, num_nodes)
            applied += 1
        blocks.append(cur)
    return jnp.concatenate(blocks, axis=1)


# ---------------------------------------------------------------------------
# Line-graph operators.
# ---------------------------------------------------------------------------


def nb_apply(
    src, dst, w, rev, edge_mask, xl: jnp.ndarray, num_nodes: int
) -> jnp.ndarray:
    """(AL @ XL)[e] = Y[dst(e)] - w(rev(e)) XL[rev(e)];  xl: (C, F)."""
    y = jax.ops.segment_sum(w[:, None] * xl, src, num_segments=num_nodes)
    out = y[dst] - w[rev][:, None] * xl[rev]
    return out * edge_mask[:, None]


def nb_degrees(src, dst, w, rev, edge_mask, num_nodes: int) -> jnp.ndarray:
    ones = jnp.ones(w.shape + (1,), w.dtype)
    return nb_apply(src, dst, w, rev, edge_mask, ones, num_nodes)[:, 0]


def lg_graph_op(
    src, dst, w, rev, edge_mask, xl: jnp.ndarray, num_nodes: int, J: int,
    dl: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Packed line-graph multi-operator apply -> (C, (J+2)F)."""
    if dl is None:
        dl = nb_degrees(src, dst, w, rev, edge_mask, num_nodes)
    blocks = [xl, dl[:, None] * xl]
    cur = xl
    applied = 0
    for j in range(J):
        target = 2**j
        while applied < target:
            cur = nb_apply(src, dst, w, rev, edge_mask, cur, num_nodes)
            applied += 1
        blocks.append(cur)
    return jnp.concatenate(blocks, axis=1)


def incidence_apply(
    src, dst, edge_mask, xl: jnp.ndarray, num_nodes: int, signed: bool
) -> jnp.ndarray:
    """Pm @ XL / Pd @ XL: edge features (C, F) -> node features (V, F)."""
    xm = xl * edge_mask[:, None]
    a = jax.ops.segment_sum(xm, src, num_segments=num_nodes)
    b = jax.ops.segment_sum(xm, dst, num_segments=num_nodes)
    return a - b if signed else a + b


def incidence_t_apply(
    src, dst, edge_mask, x: jnp.ndarray, signed: bool
) -> jnp.ndarray:
    """Pm^T @ X / Pd^T @ X: node features (V, F) -> edge features (C, F)."""
    out = x[src] - x[dst] if signed else x[src] + x[dst]
    return out * edge_mask[:, None]


def graph_readout(
    x: jnp.ndarray, gid: jnp.ndarray, n_graphs: int
) -> jnp.ndarray:
    """Per-graph sum readout: (V, F) + (V,) -> (B, F); padding rows use
    gid = n_graphs and are dropped."""
    return jax.ops.segment_sum(x, gid, num_segments=n_graphs + 1)[:n_graphs]
