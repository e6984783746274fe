"""CCN promotion and the 18 permutation-covariant tensor contractions.

Re-designs the reference CCN math engine (/root/reference/functions/
utils_ccn.py CompnetUtils:28 and functions/contraction.py collapse6to3:106)
as batched, degree-padded einsums over all vertices of all graphs at once.

Key algebraic fusion: the reference forms the 6-D tensor
H[q, k, a, b, y1, y2] = T[k, a, b, q] * chi_ii[y1, y2] and then applies 18
collapse patterns (contraction.py:44-103). But chi_ii — the chi matrix of a
vertex with itself — is ALWAYS the d x d identity (utils_ccn.py:66-82
compares a neighbor list with itself), so every one of the 18 contractions
reduces to an O(d^2) reduction of the promotion tensor T. We never build
the 6-D tensor; tests/test_ccn.py verifies each closed form against a
literal 6-D oracle and against the reference torch code.

Notation: per vertex v of padded degree slots K and true degree d = deg[v],
T[v, k, a, b, c] is the stacked promotion tensor (k = neighbor slot,
(a, b) = receptive-field indices, c = channel). With n = d and delta the
Kronecker delta on [0, d), the 18 channels (reference ordering, channel
blocks of size C each) are:

  group 111 (fix two, sum three — contraction.py:44):
    c1[k,a]   = n * sum_b T[k,a,b]
    c2[k,y]   = sum_{a,b} T[k,a,b]          (broadcast over y < d)
    c3[a,b]   = n * sum_k T[k,a,b]
    c4[a,y]   = sum_{k,b} T[k,a,b]          (broadcast)
    c5[y,y']  = delta * sum_{k,a,b} T
  group 12 (contract a diagonal pair, sum one — contraction.py:64):
    c6[k,a]   = sum_b T[k,a,b]
    c7[k,a]   = n * sum_b T[k,a,b]          (== c1: contracting (y1,y2)
                                             against delta gives n)
    c8[k,y]   = sum_a T[k,a,a]              (broadcast)
    c9[k,y]   = sum_b T[k,y,b]              (== c6 as a function)
    c10[a,b]  = sum_k T[k,a,b]
    c11[a,y]  = sum_k T[k,a,k]              (broadcast)
    c12[a,y]  = sum_b T[y,a,b]
    c13[a,y]  = sum_k T[k,a,y]              (== c10 as a function)
    c14[y,y'] = delta * sum_{k,b} T[k,k,b]
    c15[y,y'] = delta * sum_{k,a} T[k,a,a]
  group 3 (three-way diagonal — contraction.py:88):
    c16[k,y]  = T[k,y,y]
    c17[a,y]  = T[y,a,y]
    c18[y,y'] = delta * sum_x T[x,x,x]

Compat mode: the reference's _c6to2_12 uses the identity permutation for 9
of its 10 cases (contraction.py:70-81), which evaluates to c1; compat
reproduces that channel layout [c1..c5, c6, c1 x 9, c16..c18] exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def chi_onehot(chi_idx: jnp.ndarray) -> jnp.ndarray:
    """Expand the index-form chi (V, K, K) int32 into the dense one-hot
    (V, K, K, K) float32 chi[v,k,a,b] = 1 iff chi_idx[v,k,a] == b. Used by
    oracle tests and parity harnesses only — the compute path never
    materializes this O(K^3)-per-vertex tensor."""
    K = chi_idx.shape[-1]
    return (
        chi_idx[..., None] == jnp.arange(K, dtype=chi_idx.dtype)
    ).astype(jnp.float32)


def _promote_1d_gather(chi_idx, nbr, f):
    V, K, C = f.shape
    valid = chi_idx >= 0  # (V, K, K)
    ia = jnp.where(valid, chi_idx, 0)
    flat = nbr[:, :, None] * K + ia  # (V, K, K) row index into f2
    t = f.reshape(V * K, C)[flat]  # (V, K, K, C)
    return t * valid[..., None].astype(f.dtype)


def _promote_2d_gather(chi_idx, nbr, f):
    V, K = f.shape[0], f.shape[1]
    C = f.shape[-1]
    valid = chi_idx >= 0  # (V, K, K)
    ia = jnp.where(valid, chi_idx, 0)
    base = (nbr[:, :, None] * K + ia) * K  # (V, K, K) indexed [v, k, a]
    flat = base[:, :, :, None] + ia[:, :, None, :]  # (V, K, K, K) [v,k,a,b]
    t = f.reshape(V * K * K, C)[flat]  # (V, K, K, K, C)
    mask = (valid[:, :, :, None] & valid[:, :, None, :])
    return t * mask[..., None].astype(f.dtype)


# The promotion VJP is itself a gather — no scatter-add. chi matrices are
# symmetric across an edge (chi_{vj} = chi_{jv}^T: both match shared
# neighbors), so every (v, k, a, b) reading f[u, p, q] is enumerated from
# u's side as j = slot of v in u's list, p = chi_idx[u, j, a'], ...:
#
#   dL/df[u, p, q, c] = sum_j g[nbr[u,j], rslot[u,j],
#                              chi_idx[u,j,p], chi_idx[u,j,q], c]
#
# where rslot[u, j] is the slot of u in its j-th neighbor's list. XLA's
# default gather transpose is a scatter-add over the whole (V K^2, C)
# f-space (measured 3.3 s/step at V=2048, K=32 vs 0.9 s forward); this
# closed form makes backward the same cost as forward.


@jax.custom_vjp
def _promote_1d_cv(chi_idx, rslot, nbr, f):
    return _promote_1d_gather(chi_idx, nbr, f)


def _promote_1d_fwd(chi_idx, rslot, nbr, f):
    return _promote_1d_gather(chi_idx, nbr, f), (chi_idx, rslot, nbr)


def _promote_1d_bwd(res, g):
    chi_idx, rslot, nbr = res
    V, K = g.shape[0], g.shape[1]
    C = g.shape[-1]
    va = chi_idx >= 0  # (V, K, K) [u, j, p]
    vr = rslot >= 0  # (V, K) [u, j]
    sa = jnp.where(va, chi_idx, 0)
    sr = jnp.where(vr, rslot, 0)
    # g row [u,j,p] = g[nbr[u,j], rslot[u,j], chi_idx[u,j,p]]
    flat = (nbr * K + sr)[:, :, None] * K + sa  # (V, K, K)
    vals = g.reshape(V * K * K, C)[flat]  # (V, K, K, C)
    mask = vr[:, :, None] & va
    df = (vals * mask[..., None].astype(g.dtype)).sum(axis=1)  # (V, K, C)
    return (None, None, None, df)


_promote_1d_cv.defvjp(_promote_1d_fwd, _promote_1d_bwd)


@jax.custom_vjp
def _promote_2d_cv(chi_idx, rslot, nbr, f):
    return _promote_2d_gather(chi_idx, nbr, f)


def _promote_2d_fwd(chi_idx, rslot, nbr, f):
    return _promote_2d_gather(chi_idx, nbr, f), (chi_idx, rslot, nbr)


def _promote_2d_bwd(res, g):
    chi_idx, rslot, nbr = res
    V, K = g.shape[0], g.shape[1]
    C = g.shape[-1]
    va = chi_idx >= 0  # (V, K, K) [u, j, p]
    vr = rslot >= 0  # (V, K) [u, j]
    sa = jnp.where(va, chi_idx, 0)
    sr = jnp.where(vr, rslot, 0)
    # g row [u,j,p,q] = g[nbr[u,j], rslot[u,j], chi_idx[u,j,p], chi_idx[u,j,q]]
    rowp = ((nbr * K + sr)[:, :, None] * K + sa) * K  # (V, K, K) [u, j, p]
    flat = rowp[:, :, :, None] + sa[:, :, None, :]  # (V, K, K, K) [u,j,p,q]
    vals = g.reshape(V * K * K * K, C)[flat]  # (V, K, K, K, C)
    mask = vr[:, :, None, None] & va[:, :, :, None] & va[:, :, None, :]
    df = (vals * mask[..., None].astype(g.dtype)).sum(axis=1)  # (V, K, K, C)
    return (None, None, None, df)


_promote_2d_cv.defvjp(_promote_2d_fwd, _promote_2d_bwd)


def promote_1d(
    chi_idx: jnp.ndarray, nbr: jnp.ndarray, f: jnp.ndarray,
    rslot: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """1D promotion T[v,k,a] = F[nbr[v,k], chi_idx[v,k,a]] via one gather.

    chi is a partial permutation — for each (v, k, a) at most one b has
    chi[v,k,a,b] = 1 (neighbor lists are duplicate-free), so the reference's
    chi @ F matmul (utils_ccn.py:242) is a row gather: chi_idx (V, K, K)
    int32 holds that b, or -1 for "no shared neighbor" / padding.
    f: (V, K, C). Returns (V, K, K, C). O(V K^2 C) work and O(V K^2) index
    memory — vs O(V K^3 C) MACs + O(V K^3) memory for the one-hot einsum.
    Passing rslot (CCNBatch.rslot) enables the gather-form custom VJP.
    """
    if rslot is None:
        return _promote_1d_gather(chi_idx, nbr, f)
    return _promote_1d_cv(chi_idx, rslot, nbr, f)


def promote_2d(
    chi_idx: jnp.ndarray, nbr: jnp.ndarray, f: jnp.ndarray,
    rslot: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """2D promotion T[v,k,a,b] = F[nbr[v,k], chi_idx[v,k,a], chi_idx[v,k,b]]
    via one fused gather (the chi F chi^T conjugation of reference _promote,
    utils_ccn.py:225-239, with both one-hot matmuls turned into index
    lookups). f: (V, K, K, C). Returns (V, K, K, K, C) indexed
    [v, k, a, b, c]. O(V K^3 C) gather work — vs O(V K^4 C) MACs for the
    one-hot einsum pair — and no (V, K, K, K) chi tensor in memory.
    Passing rslot (CCNBatch.rslot) enables the gather-form custom VJP.
    """
    if rslot is None:
        return _promote_2d_gather(chi_idx, nbr, f)
    return _promote_2d_cv(chi_idx, rslot, nbr, f)


def promote_contract_18_fused(
    chi_idx: jnp.ndarray,
    nbr: jnp.ndarray,
    f: jnp.ndarray,
    deg: jnp.ndarray,
    row_mask: jnp.ndarray,
    compat: bool = False,
) -> jnp.ndarray:
    """Promotion + the 18 contractions WITHOUT materializing the promotion
    tensor: a lax.scan over neighbor slots k computes one (V, K, K, C)
    promoted slice per step and reduces it into the O(K^2)-per-vertex
    intermediates every contraction actually needs (none of the 18 requires
    the full (V, K, K, K, C) T — each is a sum/diagonal touching at most
    three of its axes). Live memory drops from O(V K^3 C) to O(V K^2 C):
    the regime where the reference's per-vertex python (and any
    materializing implementation) runs out of room (exp_ccn2_col.sh dense
    graphs, K in the tens). The scan body is rematerialized in the
    backward (jax.checkpoint) so autodiff keeps the same memory bound.

    Returns (V, K, K, 18C), identical to
    contract_18(promote_2d(...), ...) — equivalence is tested.
    """
    V, K = f.shape[0], f.shape[1]
    C = f.shape[-1]
    valid = chi_idx >= 0  # (V, K, K) [v, k, a]
    ia = jnp.where(valid, chi_idx, 0)
    fflat = f.reshape(V * K * K, C)

    @jax.checkpoint
    def body(carry, k):
        sk, sum_kkb, t_xxx, c11_val = carry
        nbr_k = jax.lax.dynamic_index_in_dim(nbr, k, axis=1, keepdims=False)
        ia_k = jax.lax.dynamic_index_in_dim(ia, k, axis=1, keepdims=False)
        va_k = jax.lax.dynamic_index_in_dim(valid, k, axis=1, keepdims=False)
        # t_k[v, a, b] = F[nbr_k[v], ia_k[v, a], ia_k[v, b]]
        base = (nbr_k[:, None] * K + ia_k) * K  # (V, K) [v, a]
        flat = base[:, :, None] + ia_k[:, None, :]  # (V, K, K) [v, a, b]
        t_k = fflat[flat]  # (V, K, K, C)
        m2 = (va_k[:, :, None] & va_k[:, None, :]).astype(f.dtype)
        t_k = t_k * m2[..., None]

        rb_k = t_k.sum(axis=2)  # (V, K, C): sum_b, indexed [a]
        diag_k = jnp.einsum("vaac->vac", t_k)  # (V, K, C): T[k,a,a]
        # T[k,a,k] (b = k), sum_b T[k,k,b] (a = k), T[k,k,k]
        col_k = jax.lax.dynamic_index_in_dim(t_k, k, axis=2, keepdims=False)
        row_k = jax.lax.dynamic_index_in_dim(rb_k, k, axis=1, keepdims=False)
        xxx_k = jax.lax.dynamic_index_in_dim(diag_k, k, axis=1, keepdims=False)
        carry = (sk + t_k, sum_kkb + row_k, t_xxx + xxx_k, c11_val + col_k)
        return carry, (rb_k, diag_k, col_k)

    zeros = (
        jnp.zeros((V, K, K, C), f.dtype),
        jnp.zeros((V, C), f.dtype),
        jnp.zeros((V, C), f.dtype),
        jnp.zeros((V, K, C), f.dtype),
    )
    (sk, sum_kkb, t_xxx, c11_val), (rb_s, diag_s, col_s) = jax.lax.scan(
        body, zeros, jnp.arange(K, dtype=jnp.int32)
    )
    rb = jnp.moveaxis(rb_s, 0, 1)  # (V, K, K, C) [v, k, a]
    diag_aa = jnp.moveaxis(diag_s, 0, 1)  # (V, K, K, C) [v, k, a] = T[k,a,a]
    t_kak = jnp.moveaxis(col_s, 0, 2)  # (V, K, K, C) [v, a, k] = T[k,a,k]

    n = deg.astype(f.dtype)[:, None, None, None]
    m = row_mask.astype(f.dtype)

    def bcast(val):
        return val[:, :, None, :] * m[:, None, :, None]

    eye = jnp.eye(K, dtype=f.dtype)[None, :, :, None]

    def diag_embed(val):
        return eye * val[:, None, None, :] * m[:, :, None, None]

    sab = rb.sum(axis=2)
    skb = rb.sum(axis=1)
    tot = sab.sum(axis=1)
    tr_ab = diag_aa.sum(axis=2)

    c1 = n * rb
    c2 = bcast(sab)
    c3 = n * sk
    c4 = bcast(skb)
    c5 = diag_embed(tot)
    c6 = rb
    c16 = diag_aa
    c17 = t_kak
    c18 = diag_embed(t_xxx)
    if compat:
        mid = [c6] + [c1] * 9
    else:
        mid = [
            c6, c1, bcast(tr_ab), c6, sk, bcast(c11_val),
            jnp.swapaxes(rb, 1, 2), sk, diag_embed(sum_kkb),
            diag_embed(tr_ab.sum(axis=1)),
        ]
    return jnp.concatenate([c1, c2, c3, c4, c5] + mid + [c16, c17, c18],
                           axis=-1)


def contract_18_transpose_parts(
    g: jnp.ndarray, deg: jnp.ndarray, row_mask: jnp.ndarray,
    compat: bool = False,
):
    """The adjoint of contract_18 decomposed into four per-vertex tensors
    (each (V, K, K, C)) such that

      gbar[v,k,a,b] = d_sk[v,a,b] + d_rb[v,k,a]
                      + delta_ab * d_diag[v,k,a] + delta_kb * d_kakT[v,k,a]

    This factorization is what the fused backward kernel windows and
    gathers per neighbor (ops/pallas/ccn_fused.py) — O(K^2 C) data per
    vertex instead of gbar's O(K^3 C)."""
    V, K = g.shape[0], g.shape[1]
    C = g.shape[-1] // 18
    gs = [g[..., i * C : (i + 1) * C] for i in range(18)]
    n = deg.astype(g.dtype)[:, None, None, None]
    m = row_mask.astype(g.dtype)

    def unbcast(gi):  # adjoint of bcast: (V, K, K, C)[i, y] -> (V, K, C)[i]
        return (gi * m[:, None, :, None]).sum(axis=2)

    def undiag(gi):  # adjoint of diag_embed -> (V, C)
        return jnp.einsum("vyyc->vc", gi * m[:, :, None, None])

    eye = jnp.eye(K, dtype=g.dtype)
    if compat:
        # mid channels were [c6] + [c1] * 9
        g_c1 = gs[0] + sum(gs[6:15])
        g_c6 = gs[5]
        g_c8 = g_c10 = g_c11 = g_c12 = g_c13 = g_c14 = g_c15 = None
    else:
        g_c1 = gs[0] + gs[6]  # c7 == c1
        g_c6 = gs[5] + gs[8]  # c9 == c6
        g_c8, g_c10, g_c11, g_c12 = gs[7], gs[9], gs[10], gs[11]
        g_c13, g_c14, g_c15 = gs[12], gs[13], gs[14]

    # rb[k,a] = sum_b T[k,a,b] receives: n*g_c1, g_c6, sum_y m g2[k,y],
    # (over a) sum_y m g4[a,y], and c12's swapped read g12[a,k]
    d_rb = n * g_c1 + g_c6 + unbcast(gs[1])[:, :, None, :]
    d_rb = d_rb + unbcast(gs[3])[:, None, :, :]  # skb -> [a] indexed ax 2
    if g_c12 is not None:
        d_rb = d_rb + jnp.swapaxes(g_c12, 1, 2)
    # diag_embed channels: c14's sum_kkb = sum_k rb[k,k] reaches only rb's
    # diagonal; c5's tot = sum_{k,a} rb[k,a] reaches every rb entry
    if g_c14 is not None:
        d_rb = d_rb + eye[None, :, :, None] * undiag(g_c14)[:, None, None, :]
    d_rb = d_rb + undiag(gs[4])[:, None, None, :]

    # sk[a,b] = sum_k T receives n*g3 (+ g10 + g13 non-compat)
    d_sk = n * gs[2]
    if g_c10 is not None:
        d_sk = d_sk + g_c10 + g_c13

    # diag_aa[k,a] = T[k,a,a] receives c16 (+ bcast'd c8, diag c15, c18)
    d_diag = gs[15]
    if g_c8 is not None:
        d_diag = d_diag + unbcast(g_c8)[:, :, None, :]
        d_diag = d_diag + undiag(g_c15)[:, None, None, :]
    d_diag = d_diag + (
        eye[None, :, :, None] * undiag(gs[17])[:, None, None, :]
    )  # t_xxx = sum_k diag_aa[k,k]

    # t_kak[a,k] = T[k,a,k] receives c17 (+ bcast'd c11 over [a])
    d_kak = gs[16]
    if g_c11 is not None:
        d_kak = d_kak + unbcast(g_c11)[:, :, None, :]

    return d_sk, d_rb, d_diag, jnp.swapaxes(d_kak, 1, 2)


def contract_18_transpose(
    g: jnp.ndarray, deg: jnp.ndarray, row_mask: jnp.ndarray,
    compat: bool = False,
) -> jnp.ndarray:
    """Adjoint of contract_18 as closed forms: g (V, K, K, 18C) ->
    gbar (V, K, K, K, C) with <contract_18(t), g> == <t, gbar> for all t.

    contract_18 is linear in t (deg/row_mask enter as constants), so its
    VJP is this fixed linear map; writing it explicitly keeps the fused
    kernel's backward at ONE pass over gbar instead of a jax.vjp replay of
    the forward. Verified against jax.vjp(contract_18) in tests.
    """
    K = g.shape[1]
    d_sk, d_rb, d_diag, d_kakT = contract_18_transpose_parts(
        g, deg, row_mask, compat=compat)
    eye = jnp.eye(K, dtype=g.dtype)
    gbar = d_sk[:, None, :, :, :] * jnp.ones((1, K, 1, 1, 1), g.dtype)
    gbar = gbar + d_rb[:, :, :, None, :]  # rb spreads over b
    ab_eye = eye[None, None, :, :, None]
    gbar = gbar + ab_eye * d_diag[:, :, :, None, :]  # onto b == a
    bk_eye = eye[:, None, :]  # [k, 1, b]
    gbar = gbar + bk_eye[None, :, :, :, None] * d_kakT[:, :, :, None, :]
    return gbar


def promote_1d_onehot(chi: jnp.ndarray, nbr: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """Reference-faithful one-hot 1D promotion (chi @ F as an einsum).

    chi: (V, K, K, K) with chi[v,k,a,b] = 1 iff nbrs[v][a] == nbrs[j][b]
    for j = nbr[v,k]; f: (V, K, C). Returns (V, K, K, C). Oracle for
    promote_1d; not used on the compute path.
    """
    fn = f[nbr]  # (V, K, K, C)
    return jnp.einsum("vkab,vkbc->vkac", chi, fn, preferred_element_type=jnp.float32)


def promote_2d_onehot(chi: jnp.ndarray, nbr: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """Reference-faithful one-hot 2D promotion chi @ F @ chi^T (einsums).

    f: (V, K, K, C). Returns (V, K, K, K, C) indexed [v, k, a, b, c].
    Matches reference _promote (utils_ccn.py:225-239). Oracle for
    promote_2d; not used on the compute path.
    """
    fn = f[nbr]  # (V, K, K, K, C)
    tmp = jnp.einsum("vkap,vkpqc->vkaqc", chi, fn, preferred_element_type=jnp.float32)
    return jnp.einsum("vkaqc,vkbq->vkabc", tmp, chi, preferred_element_type=jnp.float32)


def contract_1d(t: jnp.ndarray) -> jnp.ndarray:
    """CCN-1D collapse: concat(row-sum over k, sum over a) -> (V, K, 2C).

    Matches reference update_F_1D (utils_ccn.py:313-315): row_contract =
    T.sum(neighbors), col_contract = T.sum(rows); both are length-d vectors
    per vertex and are concatenated on the channel axis.
    """
    row = t.sum(axis=1)  # (V, K, C) indexed by a
    col = t.sum(axis=2)  # (V, K, C) indexed by k
    return jnp.concatenate([row, col], axis=-1)


def contract_18(
    t: jnp.ndarray, deg: jnp.ndarray, row_mask: jnp.ndarray, compat: bool = False
) -> jnp.ndarray:
    """The 18 contractions of T (x) chi_ii, fused. -> (V, K, K, 18C).

    t: (V, K, K, K, C) promotion tensor; deg: (V,) true degrees; row_mask:
    (V, K) 1.0 where slot < deg. compat reproduces the reference's
    duplicated-permutation channel layout (contraction.py:70-81).
    """
    V, K = t.shape[0], t.shape[1]
    n = deg.astype(t.dtype)[:, None, None, None]  # (V,1,1,1)
    m = row_mask.astype(t.dtype)  # (V, K)
    # broadcast helpers: out[v, i, y, c] = val[v, i, c] for y < d
    def bcast(val):  # (V, K, C) -> (V, K, K, C) over a new trailing axis y
        return val[:, :, None, :] * m[:, None, :, None]

    eye = jnp.eye(K, dtype=t.dtype)[None, :, :, None]  # (1, K, K, 1)

    def diag_embed(val):  # (V, C) -> (V, K, K, C) delta * val, masked
        return eye * val[:, None, None, :] * m[:, :, None, None]

    rb = t.sum(axis=3)  # (V, K, K, C): sum_b T[k,a,b]
    sk = t.sum(axis=1)  # (V, K, K, C): sum_k T[k,a,b] -> [a,b]
    sab = rb.sum(axis=2)  # (V, K, C): sum_{a,b} T[k,a,b] -> [k]
    skb = rb.sum(axis=1)  # (V, K, C): sum_{k,b} -> [a]
    tot = sab.sum(axis=1)  # (V, C)
    diag_aa = jnp.einsum("vkaac->vkac", t.reshape(V, K, K, K, -1))  # T[k,a,a]
    tr_ab = diag_aa.sum(axis=2)  # (V, K, C): sum_a T[k,a,a]
    diag_kb = jnp.einsum("vkkbc->vkbc", t.reshape(V, K, K, K, -1))  # T[k,k,b]
    sum_kkb = diag_kb.sum(axis=(1, 2))  # (V, C)
    t_kak = jnp.einsum("vkakc->vakc", t.reshape(V, K, K, K, -1))  # T[k,a,k]->[a,k]
    c11_val = t_kak.sum(axis=2)  # (V, K, C): sum_k T[k,a,k] -> [a]
    t_xxx = jnp.einsum("vxxxc->vxc", t.reshape(V, K, K, K, -1)).sum(axis=1)  # (V,C)

    c1 = n * rb
    c2 = bcast(sab)
    c3 = n * sk
    c4 = bcast(skb)
    c5 = diag_embed(tot)
    c6 = rb
    c16 = diag_aa  # [k, y] = T[k,y,y]
    c17 = t_kak  # [a, y] = T[y,a,y]
    c18 = diag_embed(t_xxx)

    if compat:
        mid = [c6] + [c1] * 9
    else:
        c7 = c1
        c8 = bcast(tr_ab)
        c9 = c6
        c10 = sk
        c11 = bcast(c11_val)
        c12 = jnp.swapaxes(rb, 1, 2)  # [a, y] = sum_b T[y,a,b]
        c13 = sk
        c14 = diag_embed(sum_kkb)
        c15 = diag_embed(tr_ab.sum(axis=1))
        mid = [c6, c7, c8, c9, c10, c11, c12, c13, c14, c15]

    chans = [c1, c2, c3, c4, c5] + mid + [c16, c17, c18]
    return jnp.concatenate(chans, axis=-1)
