"""Pallas TPU kernel: fused power-GNN layer block.

One kernel computes, per batch tile resident in VMEM,

    x1 = [mask*x | deg*x | A x | A^2 x | ... ]          (multi-operator apply)
    out = concat(maybe_relu(x1 @ W2 + b2), relu(x1 @ W1 + b1))

i.e. the whole pre-BatchNorm body of a reference layer_simple /
layer_with_lg node update (models/layers/layers_mnb.py:52-68) in a single
pass: the adjacency tile is read from HBM once per layer and every
intermediate ([x1], pre-activations) lives only in VMEM/registers —
XLA's unfused path writes the (B, N, (J+2)F) concat and both
pre-activations back to HBM.

Operator powers are computed in-kernel by repeated application (A^(2^j) x
via 2^j successive dots), so the (B, J, N, N) power stack is never
materialized.

The op carries a custom VJP whose backward is plain jnp, rematerializing
x1 (never stored) so XLA fuses the recompute into the backward matmuls.
Adjacency/degree/mask are data (zero cotangents).

A fully-Pallas backward kernel was built and measured twice and REMOVED:
the first version accumulated parameter gradients in revisited output
blocks (serializing the Mosaic grid); the tuned version wrote per-tile
augmented [W|b]-gradient partials reduced outside the kernel — and still
lost to this jnp backward at the showcase config (B=64 N=256 F=H=64 J=2:
XLA 1.00 ms, fused fwd + jnp bwd 1.03 ms, fused fwd + Pallas bwd 1.23 ms,
BENCH_DETAILS.json fused_power_layer_grad_step_ms). XLA's backward layout
is already good here; the kernel was maintenance surface, not capability
(git history: ops/pallas/power_layer.py before round 3 keeps the code).

Measured on a v5e chip: at the tiny QM9 shapes (N=32, F=1-8) XLA's
batched-einsum layout wins decisively — Mosaic serializes the small
per-graph matmuls — so this kernel is opt-in (GNNSimple(fused=True)), not
the default; its win is forward-path-only at large-graph tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _apply_adj(adj, v):
    """(TB, N, N) x (TB, N, F) -> (TB, N, F) batched dot."""
    return jax.lax.dot_general(
        adj, v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _kernel(adj_ref, deg_ref, x_ref, mask_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            out_ref, *, J: int, relu_second: bool):
    adj = adj_ref[:]
    x = x_ref[:]
    mask = mask_ref[:][..., None]
    deg = deg_ref[:][..., None]
    blocks = [x * mask, deg * x]
    cur = x
    applied = 0
    for j in range(J):
        target = 2**j
        while applied < target:
            cur = _apply_adj(adj, cur)
            applied += 1
        blocks.append(cur)
    x1 = jnp.concatenate(blocks, axis=-1)  # (TB, N, (J+2)F)
    a = jnp.maximum(
        jax.lax.dot_general(
            x1, w1_ref[:],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b1_ref[:],
        0.0,
    )
    b = (
        jax.lax.dot_general(
            x1, w2_ref[:],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b2_ref[:]
    )
    if relu_second:
        b = jnp.maximum(b, 0.0)
    out_ref[:] = jnp.concatenate([b, a], axis=-1)


def _fused_forward(adj, deg, x, mask, w1, b1, w2, b2, J, relu_second, tile_b,
                   interpret):
    B, N, F = x.shape
    H = w1.shape[1]
    tb = min(tile_b, B)
    while B % tb:
        tb -= 1
    grid = (B // tb,)
    kern = functools.partial(_kernel, J=J, relu_second=relu_second)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, N, N), lambda i: (i, 0, 0)),
            pl.BlockSpec((tb, N), lambda i: (i, 0)),
            pl.BlockSpec((tb, N, F), lambda i: (i, 0, 0)),
            pl.BlockSpec((tb, N), lambda i: (i, 0)),
            pl.BlockSpec(w1.shape, lambda i: (0, 0)),
            pl.BlockSpec(b1.shape, lambda i: (0,)),
            pl.BlockSpec(w2.shape, lambda i: (0, 0)),
            pl.BlockSpec(b2.shape, lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((tb, N, 2 * H), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, 2 * H), jnp.float32),
        interpret=interpret,
    )(adj, deg, x, mask, w1, b1, w2, b2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def fused_power_layer(adj, deg, x, mask, w1, b1, w2, b2,
                      J=1, relu_second=True, tile_b=8, interpret=False):
    """Fused layer body. adj: (B,N,N), deg/mask: (B,N), x: (B,N,F),
    w1/w2: ((J+2)F, H), b1/b2: (H,). Returns (B, N, 2H) = [cv2|cv1]."""
    return _fused_forward(adj, deg, x, mask, w1, b1, w2, b2, J, relu_second,
                          tile_b, interpret)


def _ref_blocks(adj, deg, x, mask, J):
    blocks = [x * mask[..., None], deg[..., None] * x]
    cur = x
    applied = 0
    for j in range(J):
        target = 2**j
        while applied < target:
            cur = jnp.einsum("bnm,bmf->bnf", adj, cur,
                             preferred_element_type=jnp.float32)
            applied += 1
        blocks.append(cur)
    return jnp.concatenate(blocks, axis=-1)


def _fwd(adj, deg, x, mask, w1, b1, w2, b2, J, relu_second, tile_b, interpret):
    out = _fused_forward(adj, deg, x, mask, w1, b1, w2, b2, J, relu_second,
                         tile_b, interpret)
    return out, (adj, deg, x, mask, w1, b1, w2, b2)


def _bwd(J, relu_second, tile_b, interpret, res, g):
    adj, deg, x, mask, w1, b1, w2, b2 = res
    H = w1.shape[1]
    x1 = _ref_blocks(adj, deg, x, mask, J)  # recompute (B, N, (J+2)F)
    pre_a = jnp.einsum("bnk,kh->bnh", x1, w1) + b1
    pre_b = jnp.einsum("bnk,kh->bnh", x1, w2) + b2
    gb, ga = g[..., :H], g[..., H:]
    ga = ga * (pre_a > 0)
    if relu_second:
        gb = gb * (pre_b > 0)
    gw1 = jnp.einsum("bnk,bnh->kh", x1, ga)
    gw2 = jnp.einsum("bnk,bnh->kh", x1, gb)
    gb1 = ga.sum(axis=(0, 1))
    gb2 = gb.sum(axis=(0, 1))
    gx1 = jnp.einsum("bnh,kh->bnk", ga, w1) + jnp.einsum("bnh,kh->bnk", gb, w2)
    # split gx1 back into operator blocks and push through each operator
    F = x.shape[-1]
    g0 = gx1[..., :F]
    g1 = gx1[..., F : 2 * F]
    gx = g0 * mask[..., None] + deg[..., None] * g1
    for j in range(J):
        target = 2**j
        gk = gx1[..., (j + 2) * F : (j + 3) * F]
        # accumulate (A^target)^T gk by repeated application of A^T
        cur = gk
        for _ in range(target):
            cur = jnp.einsum("bmn,bmf->bnf", adj, cur,
                             preferred_element_type=jnp.float32)
        gx = gx + cur
    zeros = lambda a: jnp.zeros_like(a)
    return (zeros(adj), zeros(deg), gx, zeros(mask), gw1, gb1, gw2, gb2)


fused_power_layer.defvjp(_fwd, _bwd)
