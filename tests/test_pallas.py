"""Pallas fused power-layer kernel: forward/gradient parity with the XLA
path (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hgnn2_tpu import graphs
from hgnn2_tpu.data import qm9
from hgnn2_tpu.nn import models
from hgnn2_tpu.ops.pallas.power_layer import fused_power_layer, _ref_blocks
from tests.conftest import random_adjacency


def _inputs(rng, B=8, N=16, F=3, H=4, J=2):
    adj = np.stack([random_adjacency(rng, N, 0.4) for _ in range(B)])
    deg = adj.sum(-1)
    x = rng.standard_normal((B, N, F)).astype(np.float32)
    mask = np.ones((B, N), np.float32)
    mask[:, N - 3 :] = 0.0
    adj = adj * mask[:, :, None] * mask[:, None, :]
    deg = adj.sum(-1)
    x = x * mask[..., None]
    w1 = rng.standard_normal(((J + 2) * F, H)).astype(np.float32) * 0.1
    w2 = rng.standard_normal(((J + 2) * F, H)).astype(np.float32) * 0.1
    b1 = rng.standard_normal(H).astype(np.float32) * 0.1
    b2 = rng.standard_normal(H).astype(np.float32) * 0.1
    return tuple(map(jnp.asarray, (adj, deg, x, mask, w1, b1, w2, b2)))


def _xla_reference(adj, deg, x, mask, w1, b1, w2, b2, J, relu_second=True):
    x1 = _ref_blocks(adj, deg, x, mask, J)
    a = jax.nn.relu(jnp.einsum("bnk,kh->bnh", x1, w1) + b1)
    b = jnp.einsum("bnk,kh->bnh", x1, w2) + b2
    if relu_second:
        b = jax.nn.relu(b)
    return jnp.concatenate([b, a], axis=-1)


@pytest.mark.parametrize("J", [1, 2, 3])
def test_fused_forward_matches_xla(rng, J):
    args = _inputs(rng, J=J)
    out = fused_power_layer(*args, J, True, 8, True)  # interpret mode
    ref = _xla_reference(*args, J)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_gradients_match_xla(rng):
    J = 2
    adj, deg, x, mask, w1, b1, w2, b2 = _inputs(rng, J=J)

    def loss_fused(x, w1, b1, w2, b2):
        return (
            fused_power_layer(adj, deg, x, mask, w1, b1, w2, b2, J, True, 8, True)
            ** 2
        ).sum()

    def loss_ref(x, w1, b1, w2, b2):
        return (_xla_reference(adj, deg, x, mask, w1, b1, w2, b2, J) ** 2).sum()

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-5)


def test_fused_model_matches_unfused(rng):
    recs = qm9.synthetic_qm9_like(16, seed=0)
    batch = graphs.make_dense_batch(recs, n_max=32, batch_size=16, task=0)
    m_plain = models.GNNSimple(n_features=3, n_layers=3, J=2)
    m_fused = models.GNNSimple(n_features=3, n_layers=3, J=2, fused=True,
                               interpret=True)
    v_plain = m_plain.init(jax.random.key(0), batch, train=True)

    # map PowerLayer param names -> FusedPowerLayer param names
    v_fused = m_fused.init(jax.random.key(0), batch, train=True)
    pf = jax.tree_util.tree_map(np.asarray, v_fused["params"])
    pp = jax.tree_util.tree_map(np.asarray, v_plain["params"])
    for lname in ["layer0", "layer1"]:
        pf[lname]["cv1_kernel"] = pp[lname]["cv1"]["kernel"]
        pf[lname]["cv1_bias"] = pp[lname]["cv1"]["bias"]
        pf[lname]["cv2_kernel"] = pp[lname]["cv2"]["kernel"]
        pf[lname]["cv2_bias"] = pp[lname]["cv2"]["bias"]
        pf[lname]["bn"] = pp[lname]["bn"]
    pf["layerlast"] = pp["layerlast"]

    out_plain, _ = m_plain.apply(v_plain, batch, train=True, mutable=["batch_stats"])
    out_fused, _ = m_fused.apply(
        {"params": pf, "batch_stats": v_fused["batch_stats"]},
        batch, train=True, mutable=["batch_stats"],
    )
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_plain), atol=1e-4
    )


def test_fused_layer_custom_vjp_matches_autodiff_oracle(rng):
    """The custom (rematerializing) backward equals autodiff through the
    reference jnp forward. (A fully-Pallas backward kernel existed and was
    removed after losing to this path at every measured config — see the
    module docstring.)"""
    from hgnn2_tpu.ops.pallas.power_layer import _ref_blocks

    J = 2
    adj, deg, x, mask, w1, b1, w2, b2 = _inputs(rng, J=J)

    def loss_fused(x, w1, b1, w2, b2):
        return (
            fused_power_layer(adj, deg, x, mask, w1, b1, w2, b2, J, True, 8,
                              True) ** 2
        ).sum()

    def loss_ref(x, w1, b1, w2, b2):
        x1 = _ref_blocks(adj, deg, x, mask, J)
        a = jnp.maximum(jnp.einsum("bnk,kh->bnh", x1, w1) + b1, 0.0)
        b = jnp.maximum(jnp.einsum("bnk,kh->bnh", x1, w2) + b2, 0.0)
        return (jnp.concatenate([b, a], -1) ** 2).sum()

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-5)
