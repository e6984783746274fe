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
    compat = config[0]
    # adjoint of the 18 contractions (one pass, closed form) ...
    gbar = contractions.contract_18_transpose(g, deg, row_mask,
                                              compat=compat)
    # ... then the gather-form promotion transpose (same cost as a
    # promotion forward — ops/contractions.py:88)
    df = contractions._promote_2d_bwd((chi_idx, rslot, nbr), gbar)[3]
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
