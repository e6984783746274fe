"""GNN layers: padding-aware batch norm, power layers, line-graph layers.

Re-designs the reference layer zoo (/root/reference/models/layers/
layers_mnb.py — layer_simple:25, layer_last:72, layer_with_lg_1/2/3:157/
228/293, layer_last_lg:361 and batch_normalization.py BN:23) as flax
modules over the operator-bundle interface (nn/bundles.py). All per-batch
Python loops are gone; every op is a batched einsum.

Compat notes (flags reproduce reference quirks for parity testing only):
  * scalar_affine: the reference BN constructs its affine weight/bias as
    0-d tensors (batch_normalization.py:26-27 — torch.tensor(n_features)
    makes a scalar), so gamma/beta are scalars, not per-feature. Default
    here: per-feature.
  * mask_output: the reference BN normalizes padded positions to
    (0 - mean)/std != 0 and the next layer's identity-operator slot leaks
    them into the readout (sb_normalization:76, layer_last:88-95). Default
    here: padded nodes are re-zeroed after BN and readout bias is masked.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

Init = Callable


def ref_init(scale: float = 0.1) -> Init:
    """N(0, 0.1) initializer used throughout the reference (_init_weights)."""
    return nn.initializers.normal(stddev=scale)


@dataclasses.dataclass(frozen=True)
class CompatConfig:
    """Flags reproducing reference quirks bit-for-bit (parity tests)."""

    scalar_affine_bn: bool = False  # reference BN 0-d gamma/beta
    mask_bn_output: bool = True  # False = reference (padded nodes leak)
    mask_readout_bias: bool = True  # False = reference (bias * Nmax in sum)
    bn_running_std_init_zero: bool = False  # reference inits running std to 0
    # (batch_normalization.py:31) — eval before any training divides by zero

    @classmethod
    def reference(cls) -> "CompatConfig":
        return cls(
            scalar_affine_bn=True,
            mask_bn_output=False,
            mask_readout_bias=False,
            bn_running_std_init_zero=True,
        )


class MaskedBatchNorm(nn.Module):
    """Padding-aware batch normalization over (B, N, F) node/edge features.

    Statistics are masked means over all valid positions of the whole batch
    (one mean/std per feature), matching reference sb_normalization
    (batch_normalization.py:65-93). Running stats use the reference's
    running <- (1 - momentum) * batch + momentum * running update with
    momentum = 0.1 (:37-38) and are used in eval mode.
    """

    momentum: float = 0.1
    eps: float = 1e-5
    compat: CompatConfig = CompatConfig()
    # mesh axis to reduce statistics over when the module runs inside a
    # shard_map (molecule-aligned sharding, parallel/spmd.py): two tiny
    # psums of (F,) stats replace any per-apply feature exchange, keeping
    # sharded training bit-compatible (up to fp reorder) with single-chip
    axis_name: str | tuple | None = None

    @nn.compact
    def __call__(self, h: jnp.ndarray, mask: jnp.ndarray, train: bool) -> jnp.ndarray:
        # statistics and the normalization itself always run in f32; only
        # the output returns to the caller's (possibly bf16) dtype
        in_dtype = h.dtype
        h = h.astype(jnp.float32)
        mask = mask.astype(jnp.float32)
        f = h.shape[-1]
        pshape = () if self.compat.scalar_affine_bn else (f,)
        gamma = self.param("scale", ref_init(), pshape)
        beta = self.param("bias", ref_init(), pshape)
        stat_shape = (f,)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(stat_shape, jnp.float32)
        )
        # running std starts at 1 by default (the reference's zeros make
        # eval-before-train divide by zero); compat restores the zeros
        std_init = (
            jnp.zeros if self.compat.bn_running_std_init_zero else jnp.ones
        )
        ra_std = self.variable(
            "batch_stats", "std", lambda: std_init(stat_shape, jnp.float32)
        )

        hm = h * mask[..., None]
        if train:
            count = mask.sum()
            total = hm.sum(axis=(0, 1))
            if self.axis_name is not None:
                count = jax.lax.psum(count, self.axis_name)
                total = jax.lax.psum(total, self.axis_name)
            count = jnp.maximum(count, 1.0)
            mean = total / count
            centered = (hm - mean) * mask[..., None]
            sq = (centered**2).sum(axis=(0, 1))
            if self.axis_name is not None:
                sq = jax.lax.psum(sq, self.axis_name)
            var = self.eps + sq / count
            std = jnp.sqrt(var)
            if not self.is_initializing():
                ra_mean.value = (1.0 - self.momentum) * mean + self.momentum * ra_mean.value
                ra_std.value = (1.0 - self.momentum) * std + self.momentum * ra_std.value
        else:
            mean, std = ra_mean.value, ra_std.value
        out = gamma * ((hm - mean) / std) + beta
        if self.compat.mask_bn_output:
            out = out * mask[..., None]
        return out.astype(in_dtype)


def spatial_normalization(h: jnp.ndarray, mask: jnp.ndarray, eps: float = 1e-5):
    """Per-sample, per-feature standardization over (valid) nodes.

    The legacy generation's alternative to batch norm (reference
    batching.py:189 spatial_normalization / :205 spatial_mean_with_padding,
    used by legacy layers_mnb.py:50): each graph's features are centered
    and scaled by its own node statistics. h: (B, N, F), mask: (B, N).
    """
    hm = h * mask[..., None]
    count = jnp.maximum(mask.sum(axis=1, keepdims=True), 1.0)[..., None]
    mean = hm.sum(axis=1, keepdims=True) / count
    centered = (hm - mean) * mask[..., None]
    var = eps + (centered**2).sum(axis=1, keepdims=True) / count
    return centered / jnp.sqrt(var)


class GRUUpdate(nn.Module):
    """Gated node-state update (reference models/layers/gru_update.py:17).

    Parameterization matches the reference exactly: ih = Linear(fmap_in,
    3*features) on the input, hh = Linear(features, 3*features) on the
    hidden state, chunked into (r, z, n) thirds (gru_update.py:24-33):
        r = sigmoid(r_i + r_h); z = sigmoid(z_i + z_h)
        n = tanh(n_i + r * n_h); o = (1 - z) * n + z * h
    Forward parity vs the torch module is tested
    (tests/test_gnn_parity.py::test_gru_update_forward_parity).

    Wiring: PowerLayer(gru=True) applies it as the intended-but-commented
    reference update zbu1 = update(x1, zb1) (layers_mnb.py:67), i.e. input
    = the operator-expanded features x1, hidden = the pre-BN two-conv
    concat. Deviation note: the reference constructs
    GRUUpdate(n_inputs, 2*n_outputs) (layers_mnb.py:38-41) whose ih could
    not even accept x1's J*n_inputs channels — here ih takes x1's real
    width, which is what makes the wiring runnable.
    """

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
        i3 = nn.Dense(3 * self.features, kernel_init=ref_init(),
                      bias_init=ref_init(), name="ih")(x)
        h3 = nn.Dense(3 * self.features, kernel_init=ref_init(),
                      bias_init=ref_init(), name="hh")(h)
        r_i, z_i, n_i = jnp.split(i3, 3, axis=-1)
        r_h, z_h, n_h = jnp.split(h3, 3, axis=-1)
        r = nn.sigmoid(r_i + r_h)
        z = nn.sigmoid(z_i + z_h)
        n = nn.tanh(n_i + r * n_h)
        return (1.0 - z) * n + z * h


def _pair_conv(x1, n_out, compat, mask, train, relu_second, name_prefix="",
               dtype=None, gru=False):
    """The reference's two-conv + concat + BN block.

    Returns BN(concat([cv2(x1) (relu iff relu_second), relu(cv1(x1))])) —
    concat order (cv2, cv1) matches layer_simple:60-65 / layer_with_lg_*.
    dtype: computation dtype (bf16 mixed precision); params stay f32.
    gru: apply GRUUpdate(x1, z) before BN — the reference's intended
    update step (layers_mnb.py:67, commented out there).
    """
    a = nn.Dense(n_out, kernel_init=ref_init(), bias_init=ref_init(),
                 dtype=dtype, name=f"{name_prefix}cv1")(x1)
    b = nn.Dense(n_out, kernel_init=ref_init(), bias_init=ref_init(),
                 dtype=dtype, name=f"{name_prefix}cv2")(x1)
    a = nn.relu(a)
    if relu_second:
        b = nn.relu(b)
    z = jnp.concatenate([b, a], axis=-1)
    if gru:
        z = GRUUpdate(2 * n_out, name=f"{name_prefix}gru")(x1, z)
    return MaskedBatchNorm(compat=compat, name=f"{name_prefix}bn")(z, mask, train)


class PowerLayer(nn.Module):
    """One simple-GNN iteration (reference layer_simple:25-69):
    z = BN(concat(relu(cv2(gop)), relu(cv1(gop)))), gop = [I|D|A|A^2..] X."""

    features_out: int
    compat: CompatConfig = CompatConfig()
    dtype: jnp.dtype | None = None
    gru: bool = False  # reference GNN_simple(gru=True), layers_mnb.py:38-41

    @nn.compact
    def __call__(self, bundle, x, mask, train: bool) -> jnp.ndarray:
        x1 = bundle.graph_op(x)
        return _pair_conv(x1, self.features_out, self.compat, mask, train,
                          relu_second=True, dtype=self.dtype, gru=self.gru)


class ReadoutLayer(nn.Module):
    """Final readout (reference layer_last:72-95): sum_n fc(gop(X))."""

    features_out: int
    compat: CompatConfig = CompatConfig()
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, bundle, x, mask, train: bool) -> jnp.ndarray:
        x1 = bundle.graph_op(x)
        y = nn.Dense(self.features_out, kernel_init=ref_init(), bias_init=ref_init(),
                     dtype=self.dtype, name="fc")(x1)
        if self.compat.mask_readout_bias:
            y = y * mask[..., None]
        # readout sums in f32: the per-graph sum is the accumulation that
        # bf16 would visibly degrade
        return y.astype(jnp.float32).sum(axis=1)


class LGLayer(nn.Module):
    """One line-graph GNN iteration; order selects the update schedule
    (reference layer_with_lg_1:157 / _2:228 / _3:293):
      order 1: node update first, edge update sees the new node state
      order 2: edge update first, node update sees the new edge state
      order 3: simultaneous (both read the previous states)
    Node input:  [gop(W) X | Pm XL | Pd XL]
    Edge input:  [gop(WL) XL | Pm^T ? | Pd^T ?]  (? = X or updated state)
    """

    features_out: int
    order: int = 1
    compat: CompatConfig = CompatConfig()
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, bundle, x, xl, mask, edge_mask, train: bool,
                 fused_bundle=None):
        fb = fused_bundle
        if fb is None:
            xa = bundle.graph_op(x)
            xda = bundle.lg_graph_op(xl)

        def node_update(edge_state):
            if fb is not None:
                x1 = fb.node_input(x, edge_state)
            else:
                x1 = jnp.concatenate(
                    [xa, bundle.pm(edge_state), bundle.pd(edge_state)],
                    axis=-1,
                )
            return _pair_conv(
                x1, self.features_out, self.compat, mask, train,
                relu_second=False, name_prefix="node_", dtype=self.dtype,
            )

        def edge_update(node_state):
            if fb is not None:
                xd1 = fb.edge_input(node_state, xl)
            else:
                xd1 = jnp.concatenate(
                    [xda, bundle.pm_t(node_state), bundle.pd_t(node_state)],
                    axis=-1,
                )
            return _pair_conv(
                xd1, self.features_out, self.compat, edge_mask, train,
                relu_second=False, name_prefix="edge_", dtype=self.dtype,
            )

        if self.order == 1:
            z = node_update(xl)
            zl = edge_update(z)
        elif self.order == 2:
            zl = edge_update(x)
            z = node_update(zl)
        else:
            z = node_update(xl)
            zl = edge_update(x)
        return z, zl


class LGReadoutLayer(nn.Module):
    """Line-graph readout (reference layer_last_lg:361-388):
    sum_n fc([gop(W) X | Pm XL | Pd XL])."""

    features_out: int
    compat: CompatConfig = CompatConfig()
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, bundle, x, xl, mask, train: bool,
                 fused_bundle=None) -> jnp.ndarray:
        if fused_bundle is not None:
            x1 = fused_bundle.node_input(x, xl)
        else:
            x1 = jnp.concatenate(
                [bundle.graph_op(x), bundle.pm(xl), bundle.pd(xl)], axis=-1)
        y = nn.Dense(self.features_out, kernel_init=ref_init(), bias_init=ref_init(),
                     dtype=self.dtype, name="fc")(x1)
        if self.compat.mask_readout_bias:
            y = y * mask[..., None]
        return y.astype(jnp.float32).sum(axis=1)
