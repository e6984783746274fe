"""Fused CCN-2D promotion+18-contraction Pallas kernel: parity with the
XLA closed forms (contract_18(promote_2d(...))), forward and backward,
in interpreter mode on the CPU mesh. Device-speed measurements live in
bench_suite/RESULTS.md; TPU-lowering parity is re-checked there."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hgnn2_tpu.data import qm9
from hgnn2_tpu.nn import ccn as ccn_mod
from hgnn2_tpu.ops import contractions as C
from hgnn2_tpu.ops.pallas import ccn_fused


@pytest.fixture(scope="module")
def batch():
    # 40 molecules -> V=425 > 3 vertex blocks of 128, so several graphs
    # straddle block boundaries and exercise the halo window
    recs = qm9.synthetic_qm9_like(40, seed=0)
    return ccn_mod.make_ccn_batch(recs, task=0)


def _features(cb, C_=3, seed=1):
    rng = np.random.default_rng(seed)
    V, K = cb.chi_idx.shape[0], cb.chi_idx.shape[1]
    f = rng.standard_normal((V, K, K, C_)).astype(np.float32)
    mask2 = np.asarray(cb.row_mask)[:, :, None] * np.asarray(
        cb.row_mask)[:, None, :]
    return jnp.asarray(f * mask2[..., None])


@pytest.mark.parametrize("compat", [False, True])
def test_forward_matches_xla_closed_forms(batch, compat):
    cb = batch
    f = _features(cb)
    want = C.contract_18(C.promote_2d(cb.chi_idx, cb.nbr, f), cb.deg,
                         cb.row_mask, compat=compat)
    got = ccn_fused.fused_contract_forward(
        cb.chi_idx, cb.nbr, f, cb.deg, cb.row_mask, compat=compat,
        halo=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_contract_18_transpose_matches_vjp():
    """The explicit adjoint (the kernel's backward building block) equals
    jax.vjp through contract_18 for ragged degrees, both channel modes."""
    rng = np.random.default_rng(0)
    V, K, C_ = 9, 4, 3
    t = jnp.asarray(rng.standard_normal((V, K, K, K, C_)).astype(np.float32))
    deg = jnp.asarray(rng.integers(1, K + 1, V).astype(np.float32))
    m = jnp.asarray((np.arange(K)[None, :]
                     < np.asarray(deg)[:, None]).astype(np.float32))
    g = jnp.asarray(
        rng.standard_normal((V, K, K, 18 * C_)).astype(np.float32))
    for compat in (False, True):
        _, pull = jax.vjp(
            lambda tt: C.contract_18(tt, deg, m, compat=compat), t)
        want, = pull(g)
        got = C.contract_18_transpose(g, deg, m, compat=compat)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)


def test_gradient_matches_xla_path(batch):
    cb = batch
    f0 = _features(cb, C_=2)
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.standard_normal(
        (f0.shape[0], f0.shape[1], f0.shape[1], 36)).astype(np.float32))

    def loss_ref(f):
        z = C.contract_18(
            C.promote_2d(cb.chi_idx, cb.nbr, f, rslot=cb.rslot),
            cb.deg, cb.row_mask)
        return (z * w).sum()

    def loss_ker(f):
        z = ccn_fused.promote_contract_18_pallas(
            cb.chi_idx, cb.nbr, f, cb.deg, cb.row_mask, rslot=cb.rslot,
            halo=32, interpret=True)
        return (z * w).sum()

    g_ref = jax.grad(loss_ref)(f0)
    g_ker = jax.grad(loss_ker)(f0)
    scale = float(jnp.abs(g_ref).max())
    np.testing.assert_allclose(np.asarray(g_ker), np.asarray(g_ref),
                               atol=1e-4 * scale, rtol=1e-4)


@pytest.mark.parametrize("compat", [False, True])
def test_backward_kernel_matches_xla_closed_forms(batch, compat):
    """fused_contract_backward == gbar assembly + gather-form promotion
    transpose (the XLA closed forms), including padding slots."""
    cb = batch
    rng = np.random.default_rng(5)
    V, K = cb.chi_idx.shape[0], cb.chi_idx.shape[1]
    g = jnp.asarray(
        rng.standard_normal((V, K, K, 36)).astype(np.float32))
    gbar = C.contract_18_transpose(g, cb.deg, cb.row_mask, compat=compat)
    want = C._promote_2d_bwd((cb.chi_idx, cb.rslot, cb.nbr), gbar)[3]
    got = ccn_fused.fused_contract_backward(
        cb.chi_idx, cb.rslot, cb.nbr, g, cb.deg, cb.row_mask,
        compat=compat, halo=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_ccn2d_model_kernel_equals_default(batch):
    """CCN2D(pallas_kernel=True) == the default materialized path, full
    forward through both layers and the readout."""
    cb = batch
    base = ccn_mod.CCN2D(hidden=2, n_layers=2)
    fused = ccn_mod.CCN2D(hidden=2, n_layers=2, pallas_kernel=True,
                          kernel_halo=32, interpret=True)
    variables = base.init(jax.random.key(0), cb, train=True)
    out_base = base.apply(variables, cb, train=True)
    out_fused = fused.apply(variables, cb, train=True)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_base),
                               atol=1e-4, rtol=1e-4)


def test_1d_forward_matches_xla_closed_forms(batch):
    cb = batch
    rng = np.random.default_rng(7)
    V, K = cb.chi_idx.shape[0], cb.chi_idx.shape[1]
    f = jnp.asarray(rng.standard_normal((V, K, 3)).astype(np.float32)
                    * np.asarray(cb.row_mask)[:, :, None])
    want = C.contract_1d(C.promote_1d(cb.chi_idx, cb.nbr, f))
    got = ccn_fused.fused_contract_1d_forward(
        cb.chi_idx, cb.nbr, f, halo=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_1d_gradient_matches_xla_path(batch):
    cb = batch
    rng = np.random.default_rng(8)
    V, K = cb.chi_idx.shape[0], cb.chi_idx.shape[1]
    f0 = jnp.asarray(rng.standard_normal((V, K, 2)).astype(np.float32)
                     * np.asarray(cb.row_mask)[:, :, None])
    w = jnp.asarray(rng.standard_normal((V, K, 4)).astype(np.float32))

    def loss_ref(f):
        z = C.contract_1d(C.promote_1d(cb.chi_idx, cb.nbr, f,
                                       rslot=cb.rslot))
        return (z * w).sum()

    def loss_ker(f):
        z = ccn_fused.promote_contract_1d_pallas(
            cb.chi_idx, cb.nbr, f, rslot=cb.rslot, halo=32,
            interpret=True)
        return (z * w).sum()

    g_ref = jax.grad(loss_ref)(f0)
    g_ker = jax.grad(loss_ker)(f0)
    scale = float(jnp.abs(g_ref).max())
    np.testing.assert_allclose(np.asarray(g_ker), np.asarray(g_ref),
                               atol=1e-4 * scale, rtol=1e-4)


def test_ccn1d_model_kernel_equals_default(batch):
    cb = batch
    base = ccn_mod.CCN1D(hidden=3, n_layers=3)
    fused = ccn_mod.CCN1D(hidden=3, n_layers=3, pallas_kernel=True,
                          kernel_halo=32, interpret=True)
    variables = base.init(jax.random.key(0), cb, train=True)
    out_base = base.apply(variables, cb, train=True)
    out_fused = fused.apply(variables, cb, train=True)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_base),
                               atol=1e-4, rtol=1e-4)


def test_kernel_rejects_high_k():
    with pytest.raises(ValueError, match="scan path"):
        K = ccn_fused.MAX_K + 1
        ccn_fused.fused_contract_forward(
            jnp.zeros((4, K, K), jnp.int32), jnp.zeros((4, K), jnp.int32),
            jnp.zeros((4, K, K, 1), jnp.float32), jnp.zeros(4),
            jnp.zeros((4, K)), interpret=True)
