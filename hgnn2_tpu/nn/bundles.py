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
class FusedLGBundle:
    """Combined-operator bundle: each LGLayer update's full operator input
    ([graph_op X | Pm XL | Pd XL] node-side, [lg_graph_op XL | Pm^T X |
    Pd^T X] edge-side) becomes ONE batched einsum against a precomputed
    (B, K, rows, N+M) operator tensor.

    Motivation (runs/profile_lggnn, real-chip xprof trace): at h=1 the
    scanned dense LGGNN step is latency-bound on MANY tiny batched
    matmuls — each operator kernel costs ~0.3-0.6 us/molecule while moving
    data at 0.5-3 GB/s, nowhere near the 819 GB/s HBM roof — so collapsing
    the 6-8 operator kernels per update into one trades cheap extra FLOPs
    and bytes for a K-fold cut in serialized kernel launches. The NB
    operator is materialized as a dense (B, M, M) block here (reference
    semantics, ops/dense.nb_apply as an explicit matrix) — fine at
    molecule scale (M <= 64); giant graphs use the packed/halo paths.

    MEASURED VERDICT (v5e, 2048-molecule steps, L=5 h=1, scanned epochs —
    runs/profile_lggnn/summary_dense_fused_h1.json): the fused path LOSES
    3x (54.6 ms/step vs the unfused 18.6 ms). Device op time HALVES as
    intended (58 ms vs 121 ms per 8-step epoch), but the combined-operator
    tensors are batch-dependent and must be rebuilt inside every scan
    iteration — 126 + 252 MB of materialization plus the layout copies
    XLA inserts around the convolutions it lowers the big contraction to —
    and that build swamps the kernel-count win. Pre-computing the tensors
    per cached batch would cost ~20 GB resident at the 107k-molecule
    scale, so the rebuild is inherent. Kept as a tested opt-in
    (GNNLineGraph(fused_ops=True)); the unfused dense path remains the
    shipped default.

    Block order matches the unfused concatenations exactly:
    node rows k = [diag(mask), diag(deg), A^powers..., Pm, Pd],
    edge rows k = [diag(emask), diag(dL), AL^powers..., Pm^T, Pd^T].
    """

    t_node: jnp.ndarray  # (B, J+4, N, N+M)
    t_edge: jnp.ndarray  # (B, J+4, M, N+M)
    J: int

    @classmethod
    def from_dense(cls, b: DenseBundle) -> "FusedLGBundle":
        import jax

        s_src, s_dst = b.s_src, b.s_dst
        B, N, M = s_src.shape
        J = b.J
        dt = s_src.dtype
        eye_n = jnp.eye(N, dtype=dt)
        eye_m = jnp.eye(M, dtype=dt)
        mask = (b.node_mask.astype(dt) if b.node_mask is not None
                else jnp.ones((B, N), dt))
        emask = (b.edge_mask.astype(dt) if b.edge_mask is not None
                 else jnp.ones((B, M), dt))

        diag_mask = (eye_n[None] * mask[:, :, None])[:, None]
        diag_deg = (eye_n[None] * b.deg[:, :, None])[:, None]
        node_x_blocks = jnp.concatenate(
            [diag_mask, diag_deg, b.adj_powers], axis=1
        )  # (B, J+2, N, N) acting on x
        t_node = jnp.concatenate([
            jnp.concatenate(
                [node_x_blocks, jnp.zeros((B, J + 2, N, M), dt)], -1),
            jnp.concatenate(
                [jnp.zeros((B, 1, N, N), dt), (s_src + s_dst)[:, None]], -1),
            jnp.concatenate(
                [jnp.zeros((B, 1, N, N), dt), (s_src - s_dst)[:, None]], -1),
        ], axis=1)

        # AL[e, e'] = sum_n S_dst[n,e] S_src[n,e'] w[e'] - 1[e'=rev(e)] w[e']
        sw = s_src * b.w[:, None, :]
        al = jnp.einsum("bne,bnf->bef", s_dst, sw,
                        preferred_element_type=jnp.float32).astype(dt)
        al = al - jax.nn.one_hot(b.rev, M, dtype=dt) * b.w[:, None, :]
        al_powers = [al]
        cur = al
        for _ in range(1, J):
            cur = jnp.einsum("bef,bfg->beg", cur, cur,
                             preferred_element_type=jnp.float32).astype(dt)
            al_powers.append(cur)
        diag_emask = (eye_m[None] * emask[:, :, None])[:, None]
        diag_dl = (eye_m[None] * b.dl[:, :, None])[:, None]
        edge_xl_blocks = jnp.concatenate(
            [diag_emask, diag_dl, jnp.stack(al_powers, axis=1)], axis=1
        )  # (B, J+2, M, M) acting on xl
        pm_t = jnp.swapaxes(s_src + s_dst, 1, 2)
        pd_t = jnp.swapaxes(s_src - s_dst, 1, 2)
        t_edge = jnp.concatenate([
            jnp.concatenate(
                [jnp.zeros((B, J + 2, M, N), dt), edge_xl_blocks], -1),
            jnp.concatenate([pm_t[:, None], jnp.zeros((B, 1, M, M), dt)], -1),
            jnp.concatenate([pd_t[:, None], jnp.zeros((B, 1, M, M), dt)], -1),
        ], axis=1)
        return cls(t_node=t_node, t_edge=t_edge, J=J)

    def _apply(self, t, spec, x, xl, lead_width, tail_width):
        """Shared combined apply with mismatched feature widths handled by
        zero-padding to a common width and slicing the block outputs (only
        the model's first layer mixes widths: x has the input feature
        count, xl starts at 1). The operand order is always [x; xl]; the
        FIRST J+2 row blocks produce lead_width-wide features, the last
        two produce tail_width-wide ones."""
        fx, fl = x.shape[-1], xl.shape[-1]
        fc = max(fx, fl)
        xp = x if fx == fc else jnp.pad(x, ((0, 0), (0, 0), (0, fc - fx)))
        xlp = xl if fl == fc else jnp.pad(xl, ((0, 0), (0, 0), (0, fc - fl)))
        c = jnp.concatenate([xp, xlp], axis=1)
        out = D._acc_einsum(spec, t, c)  # (B, rows, K, fc)
        B, rows, K, _ = out.shape
        if fx == fl:
            return out.reshape(B, rows, K * fc)
        lead = out[:, :, : self.J + 2, :lead_width].reshape(B, rows, -1)
        tail = out[:, :, self.J + 2:, :tail_width].reshape(B, rows, -1)
        return jnp.concatenate([lead, tail], axis=-1)

    def node_input(self, x: jnp.ndarray, xl: jnp.ndarray) -> jnp.ndarray:
        """[graph_op(x) | Pm xl | Pd xl] as one einsum. The first J+2 row
        blocks act on x, the last two on xl."""
        return self._apply(self.t_node, "bknv,bvf->bnkf", x, xl,
                           x.shape[-1], xl.shape[-1])

    def edge_input(self, x: jnp.ndarray, xl: jnp.ndarray) -> jnp.ndarray:
        """[lg_graph_op(xl) | Pm^T x | Pd^T x] as one einsum. The first J+2
        row blocks act on xl, the last two on x."""
        return self._apply(self.t_edge, "bkmv,bvf->bmkf", x, xl,
                           xl.shape[-1], x.shape[-1])


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
