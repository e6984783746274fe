"""Dense-block batched graph operators (the MXU path).

Replaces the reference's hot op ``graph_op`` (/root/reference/functions/
utils.py:24 — a Python double loop of bs x J torch.mm calls) and ``Pmul``
(:55) with single batched einsums over the whole padded batch: one
``jnp.einsum('bjnm,bmf->bnjf', ...)`` drives the entire multi-operator
apply through the MXU, and XLA fuses the scale/concat elementwise work.

The line-graph (edge-dual) operators never materialize the M x M
non-backtracking matrix: with directed edges e = (u -> v) and rev(e) the
opposite edge,

    (AL @ XL)[e] = Y[dst(e)] - w(rev(e)) * XL[rev(e)],
    Y[n] = sum_{e': src(e') = n} w(e') XL[e']

which is two small einsums against {0,1} scatter/gather matrices built
from src/dst — exactly the reference's NB operator semantics
(operators.py:68-71) with the edge-overwrite bug fixed by construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _acc_einsum(spec: str, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Einsum with f32 accumulation, output in b's (compute) dtype.

    On TPU this is the MXU-native bf16-in/f32-accumulate dot; the CPU
    backend (tests) lacks BF16xBF16=F32 dots, so there bf16 inputs are
    upcast first — same math, different rounding, covered by tolerances.
    """
    if a.dtype == jnp.bfloat16 and jax.default_backend() == "cpu":
        out = jnp.einsum(spec, a.astype(jnp.float32), b.astype(jnp.float32))
    else:
        out = jnp.einsum(spec, a, b, preferred_element_type=jnp.float32)
    return out.astype(b.dtype)


def adjacency_powers(adj: jnp.ndarray, J: int) -> jnp.ndarray:
    """(B, N, N) -> (B, J, N, N) stack [A, A^2, A^4, ...] by repeated squaring.

    Matches reference operators.py:26-29 (slot j+2 = A^(2^(j-1))).
    """
    powers = [adj]
    C = adj
    for _ in range(1, J):
        C = jnp.einsum("bnk,bkm->bnm", C, C, preferred_element_type=jnp.float32)
        powers.append(C)
    return jnp.stack(powers, axis=1)


def degrees(adj: jnp.ndarray) -> jnp.ndarray:
    """(B, N, N) -> (B, N) weighted degrees."""
    return adj.sum(axis=2)


def graph_op(
    adj_powers: jnp.ndarray,
    deg: jnp.ndarray,
    x: jnp.ndarray,
    node_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Fused multi-operator apply: [I, diag(d), A, A^2, ...] against X.

    adj_powers: (B, J, N, N), deg: (B, N), x: (B, N, F)
    Returns (B, N, (J+2)*F) with feature blocks ordered [X | d*X | A X | ...],
    the same block order as reference graph_op (functions/utils.py:42-50).

    node_mask zeroes padded rows of the identity block — the padded
    identity operator is eye(N_i) extended with zero rows, i.e. diag(mask),
    which matters when upstream activations are nonzero at padded nodes.
    """
    B, N, F = x.shape
    mask = None if node_mask is None else node_mask.astype(x.dtype)
    ident = x if mask is None else x * mask[:, :, None]
    # f32 MXU accumulation; output rounds back to the compute dtype so the
    # bf16 path halves HBM traffic end to end
    ax = _acc_einsum("bjnm,bmf->bnjf", adj_powers, x)
    blocks = jnp.concatenate(
        [ident[:, :, None, :], (deg[:, :, None] * x)[:, :, None, :], ax], axis=2
    )
    return blocks.reshape(B, N, -1)


# ---------------------------------------------------------------------------
# Line-graph operators from (src, dst, w, rev) edge arrays.
# ---------------------------------------------------------------------------


def edge_scatter_matrices(
    src: jnp.ndarray, dst: jnp.ndarray, edge_mask: jnp.ndarray, n_nodes: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One-hot scatter matrices S_src, S_dst of shape (B, N, M).

    S_src[b, n, e] = 1 iff src[b, e] == n and edge e is real.  These turn
    every scatter/gather between nodes and edges into an MXU matmul.
    """
    n_ids = jnp.arange(n_nodes, dtype=src.dtype)[None, :, None]
    s_src = (src[:, None, :] == n_ids).astype(jnp.float32) * edge_mask[:, None, :]
    s_dst = (dst[:, None, :] == n_ids).astype(jnp.float32) * edge_mask[:, None, :]
    return s_src, s_dst


def edge_to_node(s: jnp.ndarray, xl: jnp.ndarray) -> jnp.ndarray:
    """(B, N, M) x (B, M, F) -> (B, N, F) scatter-sum (f32 accumulation,
    output in the compute dtype)."""
    return _acc_einsum("bnm,bmf->bnf", s, xl)


def node_to_edge(s: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """(B, N, M) x (B, N, F) -> (B, M, F) gather (f32 accumulation, output
    in the compute dtype)."""
    return _acc_einsum("bnm,bnf->bmf", s, x)


def incidence_apply(s_src, s_dst, xl: jnp.ndarray, signed: bool) -> jnp.ndarray:
    """Pm @ XL (signed=False) or Pd @ XL (signed=True): (B, M, F) -> (B, N, F).

    Pm[u, e] = Pm[v, e] = 1 and Pd[src, e] = +1, Pd[dst, e] = -1 for
    e = (u -> v) (reference operators.py:52-63).
    """
    a = edge_to_node(s_src, xl)
    b = edge_to_node(s_dst, xl)
    return a - b if signed else a + b


def incidence_t_apply(s_src, s_dst, x: jnp.ndarray, signed: bool) -> jnp.ndarray:
    """Pm^T @ X or Pd^T @ X: (B, N, F) -> (B, M, F)."""
    a = node_to_edge(s_src, x)
    b = node_to_edge(s_dst, x)
    return a - b if signed else a + b


def nb_apply(
    s_src: jnp.ndarray,
    s_dst: jnp.ndarray,
    w: jnp.ndarray,
    rev: jnp.ndarray,
    xl: jnp.ndarray,
) -> jnp.ndarray:
    """Non-backtracking operator apply (AL @ XL) without materializing AL.

    w: (B, M), rev: (B, M), xl: (B, M, F). Returns (B, M, F).
    """
    y = edge_to_node(s_src, w[:, :, None] * xl)  # (B, N, F)
    cont = node_to_edge(s_dst, y)  # Y[dst(e)]
    w_rev = jnp.take_along_axis(w, rev, axis=1)
    xl_rev = jnp.take_along_axis(xl, rev[:, :, None], axis=1)
    return cont - w_rev[:, :, None] * xl_rev


def nb_degrees(s_src, s_dst, w: jnp.ndarray, rev: jnp.ndarray) -> jnp.ndarray:
    """NB line-graph degrees dl[e] = sum_m2 AL[e, m2] (B, M)."""
    ones = jnp.ones(w.shape + (1,), w.dtype)
    return nb_apply(s_src, s_dst, w, rev, ones)[..., 0]


def lg_graph_op(
    s_src, s_dst, w, rev, dl: jnp.ndarray, xl: jnp.ndarray, J: int,
    edge_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Line-graph multi-operator apply [I, diag(dL), AL, AL^2, ...] @ XL.

    AL^(2^(j-1)) is applied by repeated application (2^(j-1) times) rather
    than materializing powers. Returns (B, M, (J+2)*F), block order
    [XL | dL*XL | AL XL | AL^2 XL | ...]. edge_mask zeroes padded rows of
    the identity block (the padded identity operator is diag(mask)).
    """
    B, M, F = xl.shape
    emask = None if edge_mask is None else edge_mask.astype(xl.dtype)
    ident = xl if emask is None else xl * emask[:, :, None]
    blocks = [ident, dl.astype(xl.dtype)[:, :, None] * xl]
    cur = xl
    applied = 0
    for j in range(J):
        target = 2**j  # slot j+2 is AL^(2^(j-1)) for j>=1; slot 2 is AL^1
        while applied < target:
            cur = nb_apply(s_src, s_dst, w, rev, cur)
            applied += 1
        blocks.append(cur)
    return jnp.concatenate(blocks, axis=2)


# Reference-oracle helpers (materialized operators) used by tests.


def graph_op_materialized(W: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Apply a dense (B, N, N, J) operator stack: oracle for graph_op."""
    B, N, _, J = W.shape
    out = jnp.einsum("bnmj,bmf->bnjf", W, x, preferred_element_type=jnp.float32)
    return out.reshape(B, N, -1)
