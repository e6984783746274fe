"""Operator bundles: the interface between models and graph operators.

A bundle packages "apply the graph operator stack / line-graph operators /
incidence maps to features" for one batch. Models are written once against
this interface; two implementations exist:

  * DenseBundle — production path. Built from a DenseGraphBatch's adjacency
    and (src, dst, w, rev) edge arrays; everything is batched einsum on the
    MXU and the non-backtracking operator is applied via gather/scatter
    (ops/dense.py).
  * MaterializedBundle — consumes explicit dense (B, N, N, J+2) /
    (B, M, M, J+2) operator stacks and (B, N, M) incidence matrices, the
    reference's own data layout (functions/batching.py:77). Used for parity
    tests against the reference (including its buggy line-graph tensors)
    and as an oracle for the production path.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from hgnn2_tpu.ops import dense as D


@dataclasses.dataclass
class DenseBundle:
    """Operator bundle computed from batch adjacency + edge lists."""

    adj_powers: jnp.ndarray  # (B, J, N, N)
    deg: jnp.ndarray  # (B, N)
    J: int
    node_mask: jnp.ndarray | None = None  # (B, N)
    # line-graph pieces (None for simple-GNN batches)
    s_src: jnp.ndarray | None = None  # (B, N, M)
    s_dst: jnp.ndarray | None = None
    w: jnp.ndarray | None = None  # (B, M)
    rev: jnp.ndarray | None = None
    dl: jnp.ndarray | None = None  # (B, M) NB degrees
    edge_mask: jnp.ndarray | None = None

    @classmethod
    def from_batch(cls, batch, J: int, with_line_graph: bool = False,
                   dtype=None):
        """dtype casts the operator tensors (adjacency powers, incidence
        scatter matrices, weights) for bf16 mixed precision; operator
        powers are computed in f32 first, then cast."""
        adj_powers = D.adjacency_powers(batch.adj, J)
        deg = D.degrees(batch.adj)
        if dtype is not None:
            adj_powers = adj_powers.astype(dtype)
            deg = deg.astype(dtype)
        if not (with_line_graph and batch.has_line_graph):
            return cls(adj_powers=adj_powers, deg=deg, J=J, node_mask=batch.node_mask)
        n_nodes = batch.x.shape[1]
        s_src, s_dst = D.edge_scatter_matrices(
            batch.lg_src, batch.lg_dst, batch.edge_mask, n_nodes
        )
        dl = D.nb_degrees(s_src, s_dst, batch.lg_w, batch.lg_rev) * batch.edge_mask
        w = batch.lg_w
        if dtype is not None:
            s_src, s_dst = s_src.astype(dtype), s_dst.astype(dtype)
            dl, w = dl.astype(dtype), w.astype(dtype)
        return cls(
            adj_powers=adj_powers,
            deg=deg,
            J=J,
            node_mask=batch.node_mask,
            s_src=s_src,
            s_dst=s_dst,
            w=w,
            rev=batch.lg_rev,
            dl=dl,
            edge_mask=batch.edge_mask,
        )

    @property
    def has_line_graph(self) -> bool:
        return self.s_src is not None

    def graph_op(self, x: jnp.ndarray) -> jnp.ndarray:
        return D.graph_op(self.adj_powers, self.deg, x, self.node_mask)

    def lg_graph_op(self, xl: jnp.ndarray) -> jnp.ndarray:
        return D.lg_graph_op(
            self.s_src, self.s_dst, self.w, self.rev, self.dl, xl, self.J,
            self.edge_mask,
        )

    def pm(self, xl: jnp.ndarray) -> jnp.ndarray:
        return D.incidence_apply(self.s_src, self.s_dst, xl, signed=False)

    def pd(self, xl: jnp.ndarray) -> jnp.ndarray:
        return D.incidence_apply(self.s_src, self.s_dst, xl, signed=True)

    def pm_t(self, x: jnp.ndarray) -> jnp.ndarray:
        return D.incidence_t_apply(self.s_src, self.s_dst, x, signed=False)

    def pd_t(self, x: jnp.ndarray) -> jnp.ndarray:
        return D.incidence_t_apply(self.s_src, self.s_dst, x, signed=True)

    def edge_features(self) -> jnp.ndarray:
        """Initial edge state XL = NB line-graph degrees, the reference's
        xl = diag(WL[:, :, 1]) (functions/batching.py:171)."""
        return self.dl[:, :, None]


@dataclasses.dataclass
class MaterializedBundle:
    """Bundle over explicit dense operator tensors (reference layout)."""

    W: jnp.ndarray  # (B, N, N, J+2)
    WL: jnp.ndarray | None = None  # (B, M, M, J+2)
    Pm: jnp.ndarray | None = None  # (B, N, M)
    Pd: jnp.ndarray | None = None

    @property
    def has_line_graph(self) -> bool:
        return self.WL is not None

    def graph_op(self, x: jnp.ndarray) -> jnp.ndarray:
        return D.graph_op_materialized(self.W, x)

    def lg_graph_op(self, xl: jnp.ndarray) -> jnp.ndarray:
        return D.graph_op_materialized(self.WL, xl)

    def pm(self, xl: jnp.ndarray) -> jnp.ndarray:
        return jnp.einsum("bnm,bmf->bnf", self.Pm, xl, preferred_element_type=jnp.float32)

    def pd(self, xl: jnp.ndarray) -> jnp.ndarray:
        return jnp.einsum("bnm,bmf->bnf", self.Pd, xl, preferred_element_type=jnp.float32)

    def pm_t(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.einsum("bnm,bnf->bmf", self.Pm, x, preferred_element_type=jnp.float32)

    def pd_t(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.einsum("bnm,bnf->bmf", self.Pd, x, preferred_element_type=jnp.float32)

    def edge_features(self) -> jnp.ndarray:
        dl = jnp.diagonal(self.WL[:, :, :, 1], axis1=1, axis2=2)
        return dl[:, :, None]
