"""Fused CCN-2D promotion + 18-contraction Pallas kernel.

The capability being replaced is the reference's per-vertex Python chain
chi F chi^T -> 6-D tensor product -> collapse6to3
(/root/reference/functions/utils_ccn.py:225-300, functions/contraction.py:
106) — already batched in ops/contractions.py as XLA gathers + closed-form
reductions. The committed round-4 trace (runs/profile_lggnn findings.json
ccn2d_step_profile) showed WHY that XLA path is slow at the flagship shape
(V~12k, K=5): ~15 separate contraction reductions each re-read the
[V,5,5,5] promotion tensor at ~3 GB/s (2.5% of HBM peak) because XLA lays
the tiny K axes on the minor (lane) dimension — 25/1024 useful elements
per (8,128) tile — and the promotion row-gather serializes at ~5 ns/row.

This kernel is the layout fix SURVEY §7 prescribes ("packing the
vertex-batch dimension onto lanes"): one pallas_call per layer processes
VB=128 vertices per grid step with the VERTEX axis on lanes, so every
vector op runs 128 vertices wide:

  * the neighbor row fetch F[nbr[v,k]] is a one-hot MXU matmul against a
    DMA'd window of f — graphs are contiguous in the vertex axis (the
    batch builder packs them), so all neighbors of a 128-vertex block
    live within a +-halo window; the row-serial hardware gather is
    replaced by (KKC, W) @ (W, 128) systolic matmuls;
  * the chi conjugation chi F chi^T becomes per-lane select-accumulates
    ((chi_idx == p) masks; chi rows are partial permutations), unrolled
    over the static K — invalid (-1) entries match no p and contribute
    exactly the zeros promote_2d's mask produces;
  * all 18 contraction channels accumulate from each T_k slice in VMEM
    as it is produced — the (V, K, K, K, C) tensor never exists, and the
    output (V, K, K, 18C) is written once.

The backward is XLA: contract_18_transpose (the explicit adjoint — one
pass building gbar) followed by the gather-form promotion transpose
(_promote_2d_bwd), both in ops/contractions.py. Equivalence with
contract_18(promote_2d(...)) fwd+bwd is tested in tests/test_ccn_fused.py
(interpret mode); adoption/measurements live in RESULTS.md.

The unrolled select-accumulate costs O(K^2) vector ops per (vertex-block,
k), so the kernel targets the small-K regime that motivated it (QM9 with
self-loops: K <= 6; supported K <= 8). High-K graphs (the synthetic
exp_ccn2_col.sh regime) stay on the scan-fused XLA path
(promote_contract_18_fused), whose memory bound is what matters there.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hgnn2_tpu.ops import contractions

MAX_K = 8


def _kernel(nbr_ref, chi_ref, mask_ref, deg_ref, f_any, out_ref, fw, sem,
            *, K: int, C: int, VB: int, halo: int, Vp: int, compat: bool):
    W = VB + 2 * halo
    i = pl.program_id(0)
    start = jnp.clip(i * VB - halo, 0, Vp - W)
    # i*VB - halo and both clip bounds are multiples of gcd(VB, halo)
    # (Vp and W are multiples of VB resp. VB+2*halo); Mosaic needs the
    # proof for the 128-lane-aligned window slice
    start = pl.multiple_of(start, math.gcd(VB, halo))
    cp = pltpu.make_async_copy(f_any.at[:, pl.ds(start, W)], fw, sem)
    cp.start()
    cp.wait()

    iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, VB), 0)
    f32 = jnp.float32
    kkc = K * K * C

    sk = jnp.zeros((K, K, C, VB), f32)
    rb_list, diag_list, colk_list = [], [], []
    for k in range(K):
        nbr_loc = nbr_ref[k, :] - start  # (VB,) int32
        oh = (iota_w == nbr_loc[None, :]).astype(f32)  # (W, VB)
        # HIGHEST: the one-hot operand is exact, so full-f32 passes make
        # the row selection bit-exact (default bf16 rounds f to ~1e-2)
        nk = jax.lax.dot_general(
            fw[:], oh, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST,
        )[:kkc].reshape(K, K, C, VB)  # [p,q,c,v] = f[nbr[v,k], p, q, c]

        sel = [
            [
                (chi_ref[k * K + a, :] == p).astype(f32)[None, None, :]
                for p in range(K)
            ]
            for a in range(K)
        ]  # sel[a][p]: (1, 1, VB)

        # U[a, q, c, v] = sum_p sel[a][p] * nk[p, q, c, v]
        u = jnp.stack([
            sum(sel[a][p] * nk[p] for p in range(K)) for a in range(K)
        ])  # (K[a], K[q], C, VB)
        # T_k[a, b, c, v] = sum_q sel[b][q] * U[a, q, c, v]
        tk = jnp.stack([
            sum(sel[b][q] * u[:, q] for q in range(K)) for b in range(K)
        ], axis=1)  # (K[a], K[b], C, VB)

        sk = sk + tk
        rb_list.append(tk.sum(axis=1))  # (K[a], C, VB): sum_b
        diag_list.append(jnp.stack([tk[a, a] for a in range(K)]))
        colk_list.append(tk[:, k])  # (K[a], C, VB): b == k

    rb = jnp.stack(rb_list)        # (K[k], K[a], C, VB)
    diag_aa = jnp.stack(diag_list)  # (K[k], K[a], C, VB): T[k,a,a]
    colk = jnp.stack(colk_list)     # (K[k], K[a], C, VB): T[k,a,k]

    m = mask_ref[:]               # (K, VB)
    n = deg_ref[0, :]             # (VB,)
    sab = rb.sum(axis=1)          # (K[k], C, VB)
    skb = rb.sum(axis=0)          # (K[a], C, VB)
    tot = sab.sum(axis=0)         # (C, VB)
    tr_ab = diag_aa.sum(axis=1)   # (K[k], C, VB)
    c11_val = colk.sum(axis=0)    # (K[a], C, VB)
    sum_kkb = sum(rb[k, k] for k in range(K))       # (C, VB)
    t_xxx = sum(diag_aa[k, k] for k in range(K))    # (C, VB)
    tr_sum = tr_ab.sum(axis=0)    # (C, VB)

    # Unrolled (K is tiny and static) constructions: Mosaic rejects
    # unit-dim reshapes that displace the tiled (sublane, lane) dims, so
    # every broadcast here is a plain 2-D (C, VB) * (1, VB) product.
    zero_cv = jnp.zeros((C, VB), f32)

    def bcast(val):  # (K, C, VB) -> (K, K, C, VB): out[i, y] = val[i]*m[y]
        return jnp.stack([
            jnp.stack([val[i_] * m[y_][None, :] for y_ in range(K)])
            for i_ in range(K)
        ])

    def diag_embed(val):  # (C, VB) -> (K, K, C, VB): delta_ab * val * m[a]
        return jnp.stack([
            jnp.stack([
                val * m[a_][None, :] if b_ == a_ else zero_cv
                for b_ in range(K)
            ])
            for a_ in range(K)
        ])

    nrow = n[None, :]  # (1, VB)

    def nmul(arr):  # (K, K, C, VB) * deg, per 2-D slab
        return jnp.stack([
            jnp.stack([arr[i_, j_] * nrow for j_ in range(K)])
            for i_ in range(K)
        ])

    c1 = nmul(rb)
    c6 = rb
    chans = [
        c1,
        bcast(sab),
        nmul(sk),
        bcast(skb),
        diag_embed(tot),
    ]
    if compat:
        chans += [c6] + [c1] * 9
    else:
        chans += [
            c6,
            c1,
            bcast(tr_ab),
            c6,
            sk,
            bcast(c11_val),
            rb.transpose(1, 0, 2, 3),
            sk,
            diag_embed(sum_kkb),
            diag_embed(tr_sum),
        ]
    chans += [
        diag_aa,
        colk.transpose(1, 0, 2, 3),
        diag_embed(t_xxx),
    ]
    kkc = K * K * C
    for idx, ch in enumerate(chans):
        out_ref[idx * kkc : (idx + 1) * kkc, :] = ch.reshape(kkc, VB)


def _kernel_1d(nbr_ref, chi_ref, f_any, out_ref, fw, sem,
               *, K: int, C: int, VB: int, halo: int, Vp: int):
    """CCN-1D: promotion T[v,k,a] = F[nbr[v,k], chi[v,k,a]] fused with
    contract_1d (row = sum_k T[.,a], col = sum_a T[k,.]) — the same
    windowed one-hot structure as the 2D kernel, one order smaller."""
    W = VB + 2 * halo
    i = pl.program_id(0)
    start = jnp.clip(i * VB - halo, 0, Vp - W)
    start = pl.multiple_of(start, math.gcd(VB, halo))
    cp = pltpu.make_async_copy(f_any.at[:, pl.ds(start, W)], fw, sem)
    cp.start()
    cp.wait()

    iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, VB), 0)
    f32 = jnp.float32
    kc = K * C

    row = jnp.zeros((K, C, VB), f32)   # [a]: sum_k T[k,a]
    cols = []                          # [k]: sum_a T[k,a]
    for k in range(K):
        nbr_loc = nbr_ref[k, :] - start
        oh = (iota_w == nbr_loc[None, :]).astype(f32)
        nk = jax.lax.dot_general(
            fw[:], oh, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST,
        )[:kc].reshape(K, C, VB)  # [p, c, v] = F[nbr[v,k], p, c]
        tk = jnp.stack([
            sum((chi_ref[k * K + a, :] == p).astype(f32)[None, :] * nk[p]
                for p in range(K))
            for a in range(K)
        ])  # (K[a], C, VB)
        row = row + tk
        cols.append(sum(tk[a] for a in range(K)))  # (C, VB)
    col = jnp.stack(cols)  # (K[k], C, VB)
    out_ref[0 * kc : 1 * kc, :] = row.reshape(kc, VB)
    out_ref[1 * kc : 2 * kc, :] = col.reshape(kc, VB)


def _bwd_kernel_1d(nbr_ref, chi_ref, rslot_ref, g_any, out_ref, gw, sem,
                   *, K: int, C: int, VB: int, halo: int, Vp: int):
    """df[u,p] = sum_j [chi[u,j,p] valid] (g_row[n_j][chi[u,j,p]]
    + g_col[n_j][rslot[u,j]]): the 1D promotion transpose is a gather
    (chi symmetry), fed by the contract_1d adjoint gbar[k,a] = g_row[a]
    + g_col[k] evaluated on the fly per neighbor."""
    W = VB + 2 * halo
    i = pl.program_id(0)
    start = jnp.clip(i * VB - halo, 0, Vp - W)
    start = pl.multiple_of(start, math.gcd(VB, halo))
    cp = pltpu.make_async_copy(g_any.at[:, pl.ds(start, W)], gw, sem)
    cp.start()
    cp.wait()

    iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, VB), 0)
    f32 = jnp.float32
    kc = K * C

    df = jnp.zeros((K, C, VB), f32)
    for j in range(K):
        nbr_loc = nbr_ref[j, :] - start
        oh = (iota_w == nbr_loc[None, :]).astype(f32)
        sel = jax.lax.dot_general(
            gw[:], oh, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (2*kc(+pad), VB)
        g_row = sel[0 * kc : 1 * kc].reshape(K, C, VB)  # [a, c, v]
        g_col = sel[1 * kc : 2 * kc].reshape(K, C, VB)  # [k, c, v]
        rj = rslot_ref[j, :]
        col_r = sum((rj == x).astype(f32)[None, :] * g_col[x]
                    for x in range(K))  # (C, VB)
        cj = [chi_ref[j * K + p, :] for p in range(K)]
        contrib = jnp.stack([
            sum((cj[p] == x).astype(f32)[None, :] * g_row[x]
                for x in range(K))
            + (cj[p] >= 0).astype(f32)[None, :] * col_r
            for p in range(K)
        ])  # (K[p], C, VB); chi==x selects gate g_row, the >=0 gate
        # covers the chi-independent g_col term
        df = df + contrib
    out_ref[:] = df.reshape(kc, VB)


def _bwd_kernel(nbr_ref, chi_ref, rslot_ref, d_any, out_ref, dw, sem,
                *, K: int, C: int, VB: int, halo: int, Vp: int):
    """df[u,p,q,c] = sum_j gbar[nbr[u,j], rslot[u,j], chi[u,j,p],
    chi[u,j,q], c] with gbar factored per neighbor n as

      gbar[n,k,a,b] = d_sk[n,a,b] + d_rb[n,k,a]
                      + delta_ab d_diag[n,k,a] + delta_kb d_kakT[n,k,a]

    (contract_18_transpose_parts) — so each neighbor contributes O(K^2 C)
    data fetched by the same windowed one-hot matmul as the forward, and
    the chi/rslot indexing is per-lane select-accumulate. The promotion
    transpose IS a gather (chi symmetry, ops/contractions.py:88), which is
    what makes this single-pass form possible."""
    W = VB + 2 * halo
    i = pl.program_id(0)
    start = jnp.clip(i * VB - halo, 0, Vp - W)
    start = pl.multiple_of(start, math.gcd(VB, halo))
    cp = pltpu.make_async_copy(d_any.at[:, pl.ds(start, W)], dw, sem)
    cp.start()
    cp.wait()

    iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, VB), 0)
    f32 = jnp.float32
    kkc = K * K * C

    df = jnp.zeros((K, K, C, VB), f32)
    for j in range(K):
        nbr_loc = nbr_ref[j, :] - start
        oh = (iota_w == nbr_loc[None, :]).astype(f32)
        sel = jax.lax.dot_general(
            dw[:], oh, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (4*kkc(+pad), VB): neighbor's four adjoint tensors, per lane
        dsk = sel[0 * kkc : 1 * kkc].reshape(K, K, C, VB)   # [a, b]
        drb = sel[1 * kkc : 2 * kkc].reshape(K, K, C, VB)   # [k, a]
        ddg = sel[2 * kkc : 3 * kkc].reshape(K, K, C, VB)   # [k, a]
        dkk = sel[3 * kkc : 4 * kkc].reshape(K, K, C, VB)   # [k, a]

        rj = rslot_ref[j, :]  # (VB,) int32, -1 at padding
        # (1, VB) masks right-align against both (K, C, VB) and (C, VB)
        vj = (rj >= 0).astype(f32)[None, :]
        rsel = [(rj == x).astype(f32)[None, :] for x in range(K)]
        cj = [chi_ref[j * K + p, :] for p in range(K)]  # (VB,) each
        asel = [
            [(cj[p] == x).astype(f32)[None, :] for x in range(K)]
            for p in range(K)
        ]

        # rslot-select k out of the three [k, a] tensors -> (K[a], C, VB)
        rb_r = sum(rsel[x] * drb[x] for x in range(K))
        diag_r = sum(rsel[x] * ddg[x] for x in range(K))
        kak_r = sum(rsel[x] * dkk[x] for x in range(K))

        # chi-select both sides of d_sk: t1[p, q] = dsk[chi_p, chi_q]
        e1 = jnp.stack([
            sum(asel[p][x] * dsk[x] for x in range(K)) for p in range(K)
        ])  # (K[p], K[b], C, VB)
        t1 = jnp.stack([
            sum(asel[q][y] * e1[:, y] for y in range(K)) for q in range(K)
        ], axis=1)  # (K[p], K[q], C, VB)

        t2 = [sum(asel[p][x] * rb_r[x] for x in range(K))
              for p in range(K)]  # per p: (C, VB)
        sdg = [sum(asel[p][x] * diag_r[x] for x in range(K))
               for p in range(K)]
        skk = [sum(asel[p][x] * kak_r[x] for x in range(K))
               for p in range(K)]
        eq_rq = [(cj[q] == rj).astype(f32)[None, :] for q in range(K)]
        # the d_rb term does not depend on q, so invalid q slots must be
        # gated explicitly (every other term is zeroed by its q-select)
        qv = [(cj[q] >= 0).astype(f32)[None, :] for q in range(K)]

        contrib = jnp.stack([
            jnp.stack([
                t1[p, q] + qv[q] * t2[p]
                + (cj[p] == cj[q]).astype(f32)[None, :] * sdg[p]
                + eq_rq[q] * skk[p]
                for q in range(K)
            ])
            for p in range(K)
        ])  # (K[p], K[q], C, VB)
        df = df + vj * contrib
    out_ref[:] = df.reshape(kkc, VB)


def _pad_lanes(x, vp, fill):
    v = x.shape[-1]
    if v == vp:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, vp - v)]
    return jnp.pad(x, pad, constant_values=fill)


@functools.partial(jax.jit, static_argnames=(
    "compat", "halo", "block_v", "interpret"))
def fused_contract_forward(
    chi_idx: jnp.ndarray,
    nbr: jnp.ndarray,
    f: jnp.ndarray,
    deg: jnp.ndarray,
    row_mask: jnp.ndarray,
    compat: bool = False,
    halo: int = 128,
    block_v: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """contract_18(promote_2d(chi_idx, nbr, f), deg, row_mask) in ONE
    pallas_call, vertex axis on lanes; T never materialized.

    halo: all neighbors of a vertex must lie within +-halo rows of it in
    the packed vertex axis — guaranteed when every graph has <= halo + 1
    vertices (make_ccn_batch packs graphs contiguously). f: (V, K, K, C)
    float32. Returns (V, K, K, 18C).
    """
    V, K = f.shape[0], f.shape[1]
    C = f.shape[-1]
    if K > MAX_K:
        raise ValueError(
            f"fused kernel unrolls over K={K} > {MAX_K}; use the scan path "
            "(CCN2D(scan_promotion=True)) for high-degree graphs")
    VB = block_v
    W = VB + 2 * halo
    vp = max(-(-V // VB) * VB, W)
    f32 = jnp.float32

    # Mosaic DMA slices must align to the (8, 128) tiling: pad the row dim
    # of fT to a multiple of 8 (the matmul output's extra rows are sliced
    # off in-kernel); halo/block_v must be multiples of 128 on hardware so
    # the lane-dim window start stays 128-aligned.
    kkc8 = -(-(K * K * C) // 8) * 8
    fT = f.astype(f32).reshape(V, K * K * C).T
    fT = jnp.pad(fT, ((0, kkc8 - K * K * C), (0, 0)))
    fT = _pad_lanes(fT, vp, 0.0)
    nbrT = _pad_lanes(nbr.astype(jnp.int32).T, vp, 0)
    chiT = _pad_lanes(
        chi_idx.astype(jnp.int32).reshape(V, K * K).T, vp, -1)
    maskT = _pad_lanes(row_mask.astype(f32).T, vp, 0.0)
    degT = _pad_lanes(deg.astype(f32)[None, :], vp, 0.0)

    kkc = K * K * C
    kernel = functools.partial(
        _kernel, K=K, C=C, VB=VB, halo=halo, Vp=vp, compat=compat)
    zt = pl.pallas_call(
        kernel,
        grid=(vp // VB,),
        in_specs=[
            pl.BlockSpec((K, VB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K * K, VB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, VB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, VB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((18 * kkc, VB), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((18 * kkc, vp), f32),
        scratch_shapes=[
            pltpu.VMEM((kkc8, W), f32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(nbrT, chiT, maskT, degT, fT)
    z = zt.reshape(18, K, K, C, vp).transpose(4, 1, 2, 0, 3)
    return z.reshape(vp, K, K, 18 * C)[:V].astype(f.dtype)


@functools.partial(jax.jit, static_argnames=(
    "compat", "halo", "block_v", "interpret"))
def fused_contract_backward(
    chi_idx: jnp.ndarray,
    rslot: jnp.ndarray,
    nbr: jnp.ndarray,
    g: jnp.ndarray,
    deg: jnp.ndarray,
    row_mask: jnp.ndarray,
    compat: bool = False,
    halo: int = 128,
    block_v: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """df for the fused op, one pallas_call: equals
    _promote_2d_bwd(contract_18_transpose(g)) without materializing the
    (V, K, K, K, C) gbar. The four O(K^2 C)-per-vertex adjoint tensors are
    precomputed in XLA (one elementwise pass over g); the kernel windows
    them per vertex block and applies the per-neighbor rslot/chi selects.
    g: (V, K, K, 18C). Returns (V, K, K, C)."""
    V, K = g.shape[0], g.shape[1]
    C = g.shape[-1] // 18
    VB = block_v
    W = VB + 2 * halo
    vp = max(-(-V // VB) * VB, W)
    f32 = jnp.float32
    kkc = K * K * C

    parts = contractions.contract_18_transpose_parts(
        g.astype(f32), deg, row_mask, compat=compat)
    d_all = jnp.concatenate(
        [p.reshape(V, kkc) for p in parts], axis=1)  # (V, 4*kkc)
    rows8 = -(-(4 * kkc) // 8) * 8
    dT = jnp.pad(d_all.T, ((0, rows8 - 4 * kkc), (0, 0)))
    dT = _pad_lanes(dT, vp, 0.0)
    nbrT = _pad_lanes(nbr.astype(jnp.int32).T, vp, 0)
    chiT = _pad_lanes(
        chi_idx.astype(jnp.int32).reshape(V, K * K).T, vp, -1)
    rslotT = _pad_lanes(rslot.astype(jnp.int32).T, vp, -1)

    kernel = functools.partial(
        _bwd_kernel, K=K, C=C, VB=VB, halo=halo, Vp=vp)
    dfT = pl.pallas_call(
        kernel,
        grid=(vp // VB,),
        in_specs=[
            pl.BlockSpec((K, VB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K * K, VB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, VB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((kkc, VB), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kkc, vp), f32),
        scratch_shapes=[
            pltpu.VMEM((rows8, W), f32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(nbrT, chiT, rslotT, dT)
    df = dfT.reshape(K, K, C, vp).transpose(3, 0, 1, 2)
    return df[:V].astype(g.dtype)


@functools.partial(jax.jit, static_argnames=("halo", "block_v", "interpret"))
def fused_contract_1d_forward(
    chi_idx: jnp.ndarray,
    nbr: jnp.ndarray,
    f: jnp.ndarray,
    halo: int = 128,
    block_v: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """contract_1d(promote_1d(chi_idx, nbr, f)) in one pallas_call.
    f: (V, K, C). Returns (V, K, 2C) (row sums then col sums on the
    channel axis, matching ops/contractions.contract_1d)."""
    V, K = f.shape[0], f.shape[1]
    C = f.shape[-1]
    if K > MAX_K:
        raise ValueError(
            f"fused 1D kernel unrolls over K={K} > {MAX_K}; use the XLA "
            "path for high-degree graphs")
    VB = block_v
    W = VB + 2 * halo
    vp = max(-(-V // VB) * VB, W)
    f32 = jnp.float32
    kc = K * C
    rows8 = -(-kc // 8) * 8

    fT = jnp.pad(f.astype(f32).reshape(V, kc).T, ((0, rows8 - kc), (0, 0)))
    fT = _pad_lanes(fT, vp, 0.0)
    nbrT = _pad_lanes(nbr.astype(jnp.int32).T, vp, 0)
    chiT = _pad_lanes(chi_idx.astype(jnp.int32).reshape(V, K * K).T, vp, -1)

    kernel = functools.partial(
        _kernel_1d, K=K, C=C, VB=VB, halo=halo, Vp=vp)
    zt = pl.pallas_call(
        kernel,
        grid=(vp // VB,),
        in_specs=[
            pl.BlockSpec((K, VB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K * K, VB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((2 * kc, VB), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2 * kc, vp), f32),
        scratch_shapes=[
            pltpu.VMEM((rows8, W), f32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(nbrT, chiT, fT)
    z = zt.reshape(2, K, C, vp).transpose(3, 1, 0, 2)
    return z.reshape(vp, K, 2 * C)[:V].astype(f.dtype)


@functools.partial(jax.jit, static_argnames=("halo", "block_v", "interpret"))
def fused_contract_1d_backward(
    chi_idx: jnp.ndarray,
    rslot: jnp.ndarray,
    nbr: jnp.ndarray,
    g: jnp.ndarray,
    halo: int = 128,
    block_v: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """df for the fused 1D op. g: (V, K, 2C). Returns (V, K, C)."""
    V, K = g.shape[0], g.shape[1]
    C = g.shape[-1] // 2
    VB = block_v
    W = VB + 2 * halo
    vp = max(-(-V // VB) * VB, W)
    f32 = jnp.float32
    kc = K * C
    rows8 = -(-(2 * kc) // 8) * 8

    # channel-split back to (g_row (V, K, C), g_col) and stack as rows
    gT = g.astype(f32).reshape(V, K, 2, C).transpose(2, 1, 3, 0)
    gT = gT.reshape(2 * kc, V)
    gT = _pad_lanes(jnp.pad(gT, ((0, rows8 - 2 * kc), (0, 0))), vp, 0.0)
    nbrT = _pad_lanes(nbr.astype(jnp.int32).T, vp, 0)
    chiT = _pad_lanes(chi_idx.astype(jnp.int32).reshape(V, K * K).T, vp, -1)
    rslotT = _pad_lanes(rslot.astype(jnp.int32).T, vp, -1)

    kernel = functools.partial(
        _bwd_kernel_1d, K=K, C=C, VB=VB, halo=halo, Vp=vp)
    dfT = pl.pallas_call(
        kernel,
        grid=(vp // VB,),
        in_specs=[
            pl.BlockSpec((K, VB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K * K, VB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, VB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((kc, VB), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kc, vp), f32),
        scratch_shapes=[
            pltpu.VMEM((rows8, W), f32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(nbrT, chiT, rslotT, gT)
    df = dfT.reshape(K, C, vp).transpose(2, 0, 1)
    return df[:V].astype(g.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _op1d(config, chi_idx, rslot, nbr, f):
    halo, block_v, interpret = config
    return fused_contract_1d_forward(
        chi_idx, nbr, f, halo=halo, block_v=block_v, interpret=interpret)


def _op1d_fwd(config, chi_idx, rslot, nbr, f):
    return _op1d(config, chi_idx, rslot, nbr, f), (chi_idx, rslot, nbr)


def _op1d_bwd(config, res, g):
    chi_idx, rslot, nbr = res
    halo, block_v, interpret = config
    df = fused_contract_1d_backward(
        chi_idx, rslot, nbr, g, halo=halo, block_v=block_v,
        interpret=interpret)
    return (None, None, None, df)


_op1d.defvjp(_op1d_fwd, _op1d_bwd)


def promote_contract_1d_pallas(
    chi_idx: jnp.ndarray,
    nbr: jnp.ndarray,
    f: jnp.ndarray,
    rslot: jnp.ndarray,
    halo: int = 128,
    block_v: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable fused CCN-1D promotion + contraction. Drop-in for
    contract_1d(promote_1d(chi_idx, nbr, f, rslot=rslot))."""
    return _op1d((halo, block_v, interpret), chi_idx, rslot, nbr, f)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _op(config, chi_idx, rslot, nbr, f, deg, row_mask):
    compat, halo, block_v, interpret = config
    return fused_contract_forward(
        chi_idx, nbr, f, deg, row_mask, compat=compat, halo=halo,
        block_v=block_v, interpret=interpret)


def _op_fwd(config, chi_idx, rslot, nbr, f, deg, row_mask):
    out = _op(config, chi_idx, rslot, nbr, f, deg, row_mask)
    return out, (chi_idx, rslot, nbr, deg, row_mask)


def _op_bwd(config, res, g):
    chi_idx, rslot, nbr, deg, row_mask = res
    compat, halo, block_v, interpret = config
    df = fused_contract_backward(
        chi_idx, rslot, nbr, g, deg, row_mask, compat=compat, halo=halo,
        block_v=block_v, interpret=interpret)
    return (None, None, None, df, None, None)


_op.defvjp(_op_fwd, _op_bwd)


def promote_contract_18_pallas(
    chi_idx: jnp.ndarray,
    nbr: jnp.ndarray,
    f: jnp.ndarray,
    deg: jnp.ndarray,
    row_mask: jnp.ndarray,
    rslot: jnp.ndarray,
    compat: bool = False,
    halo: int = 128,
    block_v: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable fused promotion + 18 contractions (Pallas forward,
    closed-form XLA backward). Drop-in for
    contract_18(promote_2d(chi_idx, nbr, f, rslot=rslot), deg, row_mask).
    """
    return _op((compat, halo, block_v, interpret),
               chi_idx, rslot, nbr, f, deg, row_mask)
