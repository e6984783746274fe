"""Covariant compositional networks (CCN-1D / CCN-2D), batched for TPU.

Re-designs reference models/compnets/model_ccn.py (CCN_1D:18, CCN_2D:68)
and the per-vertex Python machinery of functions/utils_ccn.py as one
degree-padded tensor program over every vertex of every graph in a batch:

  * per-vertex ragged states F_i of shape (d_i, ch) / (d_i, d_i, ch)
    become (V, K, ch) / (V, K, K, ch) with K = padded receptive-field size
    and a row mask;
  * the chi matrices for every (vertex, neighbor) pair are partial
    permutations (each row has at most one 1), so they are precomputed on
    the host as an INDEX table chi_idx (V, K, K) int32 — O(K^2) per vertex
    instead of the O(K^3) one-hot — and promotion is a fused gather
    (ops/contractions.promote_1d/promote_2d), which keeps memory and work
    polynomially smaller on high-degree graphs (K in the tens on the dense
    synthetic exp_ccn2_col.sh regime);
  * the 18 contractions are the fused closed forms of
    ops/contractions.contract_18 (chi_ii == identity).

The reference trains CCN per molecule (scripts/train_ccn.py:31, bs=1); here
thousands of vertices advance together per step.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from hgnn2_tpu.graphs import GraphRecord
from hgnn2_tpu.nn.layers import ref_init
from hgnn2_tpu.ops import contractions, sparse


# ---------------------------------------------------------------------------
# Batched CCN container + host-side builder.
# ---------------------------------------------------------------------------


@struct.dataclass
class CCNBatch:
    """All vertices of a batch of graphs, flattened and degree-padded.

    x:        (V, F) raw node features
    nbr:      (V, K) int32 global vertex index of each neighbor (self-loop
              included when add_self_loops; padding slots point at 0 but
              carry chi_idx = -1 so they contribute nothing)
    chi_idx:  (V, K, K) int32 — the index form of the chi matrices
              (reference _get_chi, utils_ccn.py:66-106): chi_idx[v,k,a] = b
              iff nbrs[v][a] == nbrs[nbr[v,k]][b], else -1. chi rows are
              partial permutations so this is lossless, and promotion
              becomes a gather instead of a one-hot matmul.
    rslot:    (V, K) int32 — slot of v in its k-th neighbor's own list
              (-1 at padding); lets the promotion VJP run as a gather
              instead of a scatter-add (ops/contractions.py).
    deg:      (V,) float32 true receptive-field size d_v
    row_mask: (V, K) 1.0 where slot < d_v
    vmask:    (V,) 1.0 for real vertices
    gid:      (V,) int32 graph id (padding rows -> n_graphs)
    y:        (B,) targets
    gmask:    (B,) 1.0 for real graphs (0 for batch-size padding)
    """

    x: jnp.ndarray
    nbr: jnp.ndarray
    chi_idx: jnp.ndarray
    rslot: jnp.ndarray
    deg: jnp.ndarray
    row_mask: jnp.ndarray
    vmask: jnp.ndarray
    gid: jnp.ndarray
    y: jnp.ndarray
    gmask: jnp.ndarray
    n_graphs: int = struct.field(pytree_node=False, default=0)


def make_ccn_batch(
    records: Sequence[GraphRecord],
    k_max: int | None = None,
    vertex_capacity: int | None = None,
    add_self_loops: bool = True,
    task: int | None = None,
    batch_size: int | None = None,
    feature_dim: int | None = None,
    y_dtype=None,
) -> CCNBatch:
    """Builds the batched chi/neighbor tables on the host (numpy).

    add_self_loops mirrors the reference train loop's A <- A + I
    (scripts/train_ccn.py:36) which guarantees chi_ii exists.
    batch_size pads the graph axis with empty graphs (gmask 0) so bucketed
    training reuses one compiled program.
    """
    bs = len(records)
    B = batch_size or bs
    nbr_lists: list[list[np.ndarray]] = []
    for r in records:
        A = np.asarray(r.adj)
        if add_self_loops:
            A = A + np.eye(A.shape[0], dtype=A.dtype)
        # neighbor lists in ascending index order (reference torch.nonzero)
        nbr_lists.append([np.nonzero(A[i] > 0)[0] for i in range(A.shape[0])])

    tot_v = sum(r.n_nodes for r in records)
    V = vertex_capacity or tot_v
    if tot_v > V:
        raise ValueError(f"vertex capacity too small: {tot_v} > {V}")
    max_deg = max((len(l) for ls in nbr_lists for l in ls), default=0)
    K = k_max or max_deg
    if not K:
        raise ValueError("k_max is required for an empty record list")
    if max_deg > K:
        raise ValueError(f"max receptive-field size {max_deg} exceeds k_max={K}")

    if records:
        F = records[0].x.shape[1]
    elif feature_dim is not None:
        F = feature_dim
    else:
        raise ValueError("feature_dim is required for an empty record list")
    x = np.zeros((V, F), dtype=np.float32)
    nbr = np.zeros((V, K), dtype=np.int32)
    chi_idx = np.full((V, K, K), -1, dtype=np.int32)
    rslot = np.full((V, K), -1, dtype=np.int32)
    deg = np.zeros((V,), dtype=np.float32)
    row_mask = np.zeros((V, K), dtype=np.float32)
    vmask = np.zeros((V,), dtype=np.float32)
    gid = np.full((V,), B, dtype=np.int32)

    try:
        from hgnn2_tpu import native

        use_native = native.available()
    except ImportError:
        use_native = False

    off = 0
    ys = []
    for g, (r, lists) in enumerate(zip(records, nbr_lists)):
        n = r.n_nodes
        x[off : off + n] = r.x
        gid[off : off + n] = g
        vmask[off : off + n] = 1.0
        degs = np.array([len(l) for l in lists], dtype=np.int32)
        if use_native:
            offsets = np.zeros(n + 1, np.int32)
            np.cumsum(degs, out=offsets[1:])
            flat = (
                np.concatenate(lists).astype(np.int32)
                if lists
                else np.zeros(0, np.int32)
            )
            native.build_chi_tables_native(
                offsets, flat, K, off, chi_idx, rslot, nbr, deg, row_mask
            )
        else:
            # vectorized chi_idx[v,k,a] = pos of lists[v][a] in
            # lists[lists[v][k]], else -1 (reference _get_chi semantics)
            L = np.full((n, K), -1, dtype=np.int64)
            for i, li in enumerate(lists):
                if len(li) > K:
                    raise ValueError(f"degree {len(li)} exceeds K={K}")
                L[i, : len(li)] = li
            pos = np.full((n, n), -1, dtype=np.int32)
            if degs.sum():
                u_idx = np.repeat(np.arange(n), degs)
                pos[u_idx, np.concatenate(lists)] = np.concatenate(
                    [np.arange(d) for d in degs]
                )
            safe = np.where(L >= 0, L, 0)
            ci = pos[safe[:, :, None], safe[:, None, :]]  # (n, K, K)
            invalid = (L[:, :, None] < 0) | (L[:, None, :] < 0)
            chi_idx[off : off + n] = np.where(invalid, -1, ci)
            # rslot[v, k] = slot of v in lists[L[v, k]]
            rs = pos[safe, np.arange(n)[:, None]]
            rslot[off : off + n] = np.where(L >= 0, rs, -1)
            deg[off : off + n] = degs
            row_mask[off : off + n] = (L >= 0).astype(np.float32)
            nbr[off : off + n] = np.where(L >= 0, L + off, 0).astype(np.int32)
        off += n
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
    return CCNBatch(
        x=jnp.asarray(x),
        nbr=jnp.asarray(nbr),
        chi_idx=jnp.asarray(chi_idx),
        rslot=jnp.asarray(rslot),
        deg=jnp.asarray(deg),
        row_mask=jnp.asarray(row_mask),
        vmask=jnp.asarray(vmask),
        gid=jnp.asarray(gid),
        y=jnp.asarray(y),
        gmask=jnp.asarray(gmask),
        n_graphs=B,
    )


# ---------------------------------------------------------------------------
# Models.
# ---------------------------------------------------------------------------


class CCN1D(nn.Module):
    """First-order CCN (reference CCN_1D, model_ccn.py:18-64).

    Per layer: promote neighbor states through chi, contract (row/col sums,
    2 contractions), shared Linear + ReLU. Readout concatenates per-layer
    summed states [input_feats + layers * hidden] -> Linear.
    """

    hidden: int = 2
    n_layers: int = 2
    dim_output: int = 1
    # fused promotion+contraction Pallas kernel per layer (the 1D sibling
    # of CCN2D's; ops/pallas/ccn_fused.py). TPU only; K <= 8.
    pallas_kernel: bool = False
    kernel_halo: int = 128
    interpret: bool = False

    @nn.compact
    def __call__(self, cb: CCNBatch, train: bool = True) -> jnp.ndarray:
        # F0: x broadcast over the receptive field (reference get_F0_1D:212-216)
        f = cb.x[:, None, :] * cb.row_mask[:, :, None]  # (V, K, F)
        layer_sums = [self._readout(f, cb)]
        for i in range(self.n_layers):
            if self.pallas_kernel:
                from hgnn2_tpu.ops.pallas import ccn_fused

                z = ccn_fused.promote_contract_1d_pallas(
                    cb.chi_idx, cb.nbr, f, rslot=cb.rslot,
                    halo=self.kernel_halo, interpret=self.interpret)
            else:
                t = contractions.promote_1d(cb.chi_idx, cb.nbr, f,
                                            rslot=cb.rslot)
                z = contractions.contract_1d(t)  # (V, K, 2C)
            z = nn.Dense(
                self.hidden, kernel_init=ref_init(), bias_init=ref_init(),
                name=f"w{i+1}",
            )(z)
            f = nn.relu(z) * cb.row_mask[:, :, None]
            layer_sums.append(self._readout(f, cb))
        feat = jnp.concatenate(layer_sums, axis=-1)
        return nn.Dense(
            self.dim_output, kernel_init=ref_init(), bias_init=ref_init(), name="fc"
        )(feat)

    def _readout(self, f: jnp.ndarray, cb: CCNBatch) -> jnp.ndarray:
        per_vertex = f.sum(axis=1) * cb.vmask[:, None]
        return sparse.graph_readout(per_vertex, cb.gid, cb.n_graphs)


class CCN2D(nn.Module):
    """Second-order CCN (reference CCN_2D, model_ccn.py:68-105).

    Per layer: 2D promotion chi F chi^T, the fused 18 contractions, shared
    Linear + ReLU. compat_contractions reproduces the reference's
    duplicated contraction channels (contraction.py:70-81).

    Four execution strategies for the promotion memory, identical by test:
      * pallas_kernel=True — ONE Pallas kernel per layer computes the
        promotion and all 18 contractions with the vertex batch packed
        onto lanes (ops/pallas/ccn_fused.py); T is never materialized and
        the kernel measures ~4.6x the XLA forward at the flagship shape
        (V~12k, K=5). TPU only (interpret=True for CPU tests); K <= 8;
        requires every graph <= kernel_halo + 1 vertices;
      * default — materialize the (V, K, K, K, C) promotion tensor; the
        gather-form custom VJP applies (fastest XLA path at small K);
      * scan_promotion=True — fuse promotion with the 18 contractions via
        a lax.scan over neighbor slots: no contraction needs the full 4-D
        T, so live memory is O(V K^2 C) and the rematerialized scan body
        keeps the backward at the same bound (the high-K regime of the
        reference's exp_ccn2_col.sh);
      * vertex_chunks > 1 — lax.map over vertex chunks (caps memory but
        repeats promotion work; superseded by scan_promotion for high K).
    """

    hidden: int = 2
    n_layers: int = 2
    dim_output: int = 1
    compat_contractions: bool = False
    vertex_chunks: int = 1
    scan_promotion: bool = False
    pallas_kernel: bool = False
    kernel_halo: int = 128  # max graph size the kernel window covers
    interpret: bool = False  # Pallas interpreter mode (CPU tests)

    @nn.compact
    def __call__(self, cb: CCNBatch, train: bool = True) -> jnp.ndarray:
        mask2 = cb.row_mask[:, :, None] * cb.row_mask[:, None, :]  # (V, K, K)
        f = cb.x[:, None, None, :] * mask2[..., None]  # (V, K, K, F)
        layer_sums = [self._readout(f, cb)]
        for i in range(self.n_layers):
            dense = nn.Dense(
                self.hidden, kernel_init=ref_init(), bias_init=ref_init(),
                name=f"w{i+1}",
            )
            if self.pallas_kernel:
                from hgnn2_tpu.ops.pallas import ccn_fused

                z = ccn_fused.promote_contract_18_pallas(
                    cb.chi_idx, cb.nbr, f, cb.deg, cb.row_mask,
                    rslot=cb.rslot, compat=self.compat_contractions,
                    halo=self.kernel_halo, interpret=self.interpret,
                )  # (V, K, K, 18C), one kernel, T never materialized
                f = nn.relu(dense(z)) * mask2[..., None]
            elif self.scan_promotion:
                z = contractions.promote_contract_18_fused(
                    cb.chi_idx, cb.nbr, f, cb.deg, cb.row_mask,
                    compat=self.compat_contractions,
                )  # (V, K, K, 18C), T never materialized
                f = nn.relu(dense(z)) * mask2[..., None]
            elif self.vertex_chunks <= 1:
                t = contractions.promote_2d(cb.chi_idx, cb.nbr, f,
                                            rslot=cb.rslot)
                z = contractions.contract_18(
                    t, cb.deg, cb.row_mask, compat=self.compat_contractions
                )  # (V, K, K, 18C)
                f = nn.relu(dense(z)) * mask2[..., None]
            else:
                f = self._chunked_layer(dense, cb, f, mask2)
            layer_sums.append(self._readout(f, cb))
        feat = jnp.concatenate(layer_sums, axis=-1)
        return nn.Dense(
            self.dim_output, kernel_init=ref_init(), bias_init=ref_init(), name="fc"
        )(feat)

    def _chunked_layer(self, dense, cb: CCNBatch, f, mask2):
        v = f.shape[0]
        n_chunks = self.vertex_chunks
        if v % n_chunks:
            raise ValueError(f"vertex count {v} not divisible by {n_chunks}")
        vc = v // n_chunks
        k = cb.chi_idx.shape[1]
        # create the params eagerly (outside lax.map) with standard names
        zeros = jnp.zeros((1, k, k, 18 * f.shape[-1]), f.dtype)
        dense(zeros)

        def body(chunk):
            chi_c, nbr_c, deg_c, rm_c, m2_c = chunk
            t = contractions.promote_2d(chi_c, nbr_c, f)
            z = contractions.contract_18(
                t, deg_c, rm_c, compat=self.compat_contractions
            )
            return nn.relu(dense(z)) * m2_c[..., None]

        chunks = (
            cb.chi_idx.reshape(n_chunks, vc, *cb.chi_idx.shape[1:]),
            cb.nbr.reshape(n_chunks, vc, -1),
            cb.deg.reshape(n_chunks, vc),
            cb.row_mask.reshape(n_chunks, vc, -1),
            mask2.reshape(n_chunks, vc, *mask2.shape[1:]),
        )
        out = jax.lax.map(body, chunks)
        return out.reshape(v, *out.shape[2:])

    def _readout(self, f: jnp.ndarray, cb: CCNBatch) -> jnp.ndarray:
        per_vertex = f.sum(axis=(1, 2)) * cb.vmask[:, None]
        return sparse.graph_readout(per_vertex, cb.gid, cb.n_graphs)
