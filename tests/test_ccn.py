"""CCN tests: fused 18-contraction closed forms vs a literal 6-D oracle,
plus full-model forward parity against the reference torch CCN-1D/2D."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hgnn2_tpu import graphs
from hgnn2_tpu.nn import ccn
from hgnn2_tpu.ops import contractions
from tests.conftest import random_adjacency


# ---------------------------------------------------------------------------
# Literal 6-D oracle for the *intended* 18 contractions.
# Axes of H: (k, a, b, y1, y2, c); specs (keep pair, delta-pair or
# delta-triple) read off the reference's comments (contraction.py:51-99).
# ---------------------------------------------------------------------------

SPECS_111 = [(0, 1), (0, 3), (1, 2), (1, 3), (3, 4)]
SPECS_12 = [
    ((0, 1), (2, 3)),
    ((0, 1), (3, 4)),
    ((0, 3), (1, 2)),
    ((0, 3), (1, 4)),
    ((1, 2), (0, 3)),
    ((1, 3), (0, 2)),
    ((1, 3), (0, 4)),
    ((1, 3), (2, 4)),
    ((3, 4), (0, 1)),
    ((3, 4), (1, 2)),
]
SPECS_3 = [((0, 3), (1, 2, 4)), ((1, 3), (0, 2, 4)), ((3, 4), (0, 1, 2))]


def oracle_contract18(T, d):
    """T: (d, d, d, C) one vertex's promotion tensor. Literal 6-D build."""
    C = T.shape[-1]
    H = np.zeros((d, d, d, d, d, C), dtype=np.float64)
    eye = np.eye(d)
    H = T[:, :, :, None, None, :] * eye[None, None, None, :, :, None]

    def collapse(H6, keep, pair=None, triple=None):
        mask = np.ones((d, d, d, d, d), dtype=np.float64)
        if pair is not None:
            i, j = pair
            grid = np.indices((d, d, d, d, d))
            mask = (grid[i] == grid[j]).astype(np.float64)
        if triple is not None:
            i, j, k = triple
            grid = np.indices((d, d, d, d, d))
            mask = ((grid[i] == grid[j]) & (grid[j] == grid[k])).astype(np.float64)
        Hm = H6 * mask[..., None]
        sum_axes = tuple(ax for ax in range(5) if ax not in keep)
        out = Hm.sum(axis=sum_axes)
        if keep[0] > keep[1]:
            out = out.transpose(1, 0, 2)
        return out

    outs = [collapse(H, kp) for kp in SPECS_111]
    outs += [collapse(H, kp, pair=pr) for kp, pr in SPECS_12]
    outs += [collapse(H, kp, triple=tr) for kp, tr in SPECS_3]
    return np.concatenate(outs, axis=2)


@pytest.mark.parametrize("d,C", [(2, 1), (3, 2), (5, 2)])
def test_contract18_matches_6d_oracle(rng, d, C):
    T = rng.standard_normal((d, d, d, C)).astype(np.float32)
    oracle = oracle_contract18(T.astype(np.float64), d)

    t = jnp.asarray(T)[None]  # (1, d, d, d, C) == (V=1, K=d, ...)
    deg = jnp.asarray([float(d)])
    row_mask = jnp.ones((1, d))
    ours = np.asarray(contractions.contract_18(t, deg, row_mask, compat=False))[0]
    np.testing.assert_allclose(ours, oracle, atol=1e-4)


@pytest.mark.parametrize("d,C", [(3, 2), (4, 1)])
def test_contract18_compat_matches_reference(reference_path, rng, d, C):
    """Compat mode reproduces the reference collapse6to3 (with its
    duplicated permutations) channel-for-channel; chi_ii = identity."""
    import torch
    from functions.contraction import collapse6to3

    T = rng.standard_normal((d, d, d, C)).astype(np.float32)
    # reference python_contract: T.permute(3,0,1,2) (x) chi_ii -> collapse6to3
    Tt = torch.from_numpy(T).permute(3, 0, 1, 2)
    H = Tt
    for _ in range(2):
        H = torch.unsqueeze(H, -1)
    H = H * torch.eye(d)
    ref = collapse6to3(H).numpy()

    t = jnp.asarray(T)[None]
    ours = np.asarray(
        contractions.contract_18(
            t, jnp.asarray([float(d)]), jnp.ones((1, d)), compat=True
        )
    )[0]
    np.testing.assert_allclose(ours, ref, atol=1e-4)


# ---------------------------------------------------------------------------
# Batched promotion vs reference per-vertex promotion.
# ---------------------------------------------------------------------------


def _single_record(rng, n, F=3, p=0.6):
    A = random_adjacency(rng, n, p, weighted=False)
    x = rng.standard_normal((n, F)).astype(np.float32)
    return graphs.GraphRecord(x=x, adj=A, y=np.float32(0.5))


@pytest.mark.parametrize("n,p", [(6, 0.5), (10, 0.9), (14, 0.3)])
def test_index_promotion_matches_onehot(rng, n, p):
    """The gather-form promotion (chi_idx) equals the one-hot einsum form
    for both orders, including padding slots, on random graphs."""
    r = _single_record(rng, n, F=2, p=p)
    cb = ccn.make_ccn_batch([r], k_max=n + 2, vertex_capacity=n + 3)
    chi = contractions.chi_onehot(cb.chi_idx)

    f1 = jnp.asarray(
        rng.standard_normal((*cb.nbr.shape, 2)).astype(np.float32)
    ) * cb.row_mask[:, :, None]
    np.testing.assert_allclose(
        np.asarray(contractions.promote_1d(cb.chi_idx, cb.nbr, f1)),
        np.asarray(contractions.promote_1d_onehot(chi, cb.nbr, f1)),
        atol=1e-6,
    )

    K = cb.nbr.shape[1]
    mask2 = cb.row_mask[:, :, None] * cb.row_mask[:, None, :]
    f2 = jnp.asarray(
        rng.standard_normal((cb.x.shape[0], K, K, 2)).astype(np.float32)
    ) * mask2[..., None]
    np.testing.assert_allclose(
        np.asarray(contractions.promote_2d(cb.chi_idx, cb.nbr, f2)),
        np.asarray(contractions.promote_2d_onehot(chi, cb.nbr, f2)),
        atol=1e-6,
    )


@pytest.mark.parametrize("n,p", [(7, 0.6), (11, 0.9)])
def test_promotion_gather_vjp_matches_autodiff(rng, n, p):
    """The gather-form custom VJP (rslot path) equals the plain autodiff
    (scatter) backward of the promotion for both orders."""
    r = _single_record(rng, n, F=2, p=p)
    cb = ccn.make_ccn_batch([r], k_max=n + 2, vertex_capacity=n + 3)
    V, K = cb.x.shape[0], cb.nbr.shape[1]

    w1 = jnp.asarray(rng.standard_normal((V, K, K, 2)).astype(np.float32))
    f1 = jnp.asarray(rng.standard_normal((V, K, 2)).astype(np.float32))
    g_plain = jax.grad(
        lambda f: (contractions.promote_1d(cb.chi_idx, cb.nbr, f) * w1).sum()
    )(f1)
    g_cv = jax.grad(
        lambda f: (contractions.promote_1d(
            cb.chi_idx, cb.nbr, f, rslot=cb.rslot) * w1).sum()
    )(f1)
    np.testing.assert_allclose(np.asarray(g_cv), np.asarray(g_plain), atol=1e-5)

    w2 = jnp.asarray(rng.standard_normal((V, K, K, K, 2)).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal((V, K, K, 2)).astype(np.float32))
    g_plain = jax.grad(
        lambda f: (contractions.promote_2d(cb.chi_idx, cb.nbr, f) * w2).sum()
    )(f2)
    g_cv = jax.grad(
        lambda f: (contractions.promote_2d(
            cb.chi_idx, cb.nbr, f, rslot=cb.rslot) * w2).sum()
    )(f2)
    np.testing.assert_allclose(np.asarray(g_cv), np.asarray(g_plain), atol=1e-5)


def test_promotion_matches_reference(reference_ccn_utils, rng):
    import torch
    CompnetUtils = reference_ccn_utils

    r = _single_record(rng, 6)
    A = r.adj + np.eye(6, dtype=np.float32)
    util = CompnetUtils(False)
    F0 = util.get_F0(torch.from_numpy(r.x), torch.from_numpy(A))

    cb = ccn.make_ccn_batch([r], add_self_loops=True)
    f0 = np.asarray(
        cb.x[:, None, None, :]
        * (cb.row_mask[:, :, None] * cb.row_mask[:, None, :])[..., None]
    )
    for i in range(6):
        d = int(cb.deg[i])
        np.testing.assert_allclose(f0[i, :d, :d], F0[i].numpy(), atol=1e-6)

    t = np.asarray(contractions.promote_2d(cb.chi_idx, cb.nbr, jnp.asarray(f0)))
    for i in range(6):
        Ti = util.get_nbr_promotions(F0, i).detach().numpy()  # (d, d, d, C)
        d = Ti.shape[0]
        np.testing.assert_allclose(t[i, :d, :d, :d], Ti, atol=1e-5)


# ---------------------------------------------------------------------------
# Full-model forward parity.
# ---------------------------------------------------------------------------


def _copy_ccn_params(net_t, params, L):
    p = jax.tree_util.tree_map(np.asarray, params)
    for i in range(L):
        lin = net_t._modules[f"w{i+1}"]
        p[f"w{i+1}"]["kernel"] = lin.weight.detach().numpy().T.copy()
        p[f"w{i+1}"]["bias"] = lin.bias.detach().numpy().copy()
    p["fc"]["kernel"] = net_t.fc.weight.detach().numpy().T.copy()
    p["fc"]["bias"] = net_t.fc.bias.detach().numpy().copy()
    return jax.tree_util.tree_map(jnp.asarray, p)


@pytest.mark.parametrize("L", [1, 2])
def test_ccn1d_forward_parity(reference_ccn_utils, rng, L):
    import torch
    from models.compnets.model_ccn import CCN_1D

    r = _single_record(rng, 7)
    A = r.adj + np.eye(7, dtype=np.float32)
    torch.manual_seed(0)
    net_t = CCN_1D(input_feats=3, n_outputs=1, hidden_size=4, layers=L)
    with torch.no_grad():
        ref_out = net_t(torch.from_numpy(r.x), torch.from_numpy(A)).numpy()

    cb = ccn.make_ccn_batch([r], add_self_loops=True)
    model = ccn.CCN1D(hidden=4, n_layers=L, dim_output=1)
    variables = model.init(jax.random.key(0), cb, train=True)
    params = _copy_ccn_params(net_t, variables["params"], L)
    out = model.apply({"params": params}, cb, train=True)
    np.testing.assert_allclose(np.asarray(out)[0], ref_out, atol=2e-4)


@pytest.mark.parametrize("L", [1, 2])
def test_ccn2d_forward_parity(reference_ccn_utils, rng, L):
    import torch
    from models.compnets.model_ccn import CCN_2D

    r = _single_record(rng, 5)
    A = r.adj + np.eye(5, dtype=np.float32)
    torch.manual_seed(0)
    net_t = CCN_2D(input_feats=3, n_outputs=1, hidden_size=2, layers=L, cudaflag=False)
    with torch.no_grad():
        ref_out = net_t(torch.from_numpy(r.x), torch.from_numpy(A)).numpy()

    cb = ccn.make_ccn_batch([r], add_self_loops=True)
    model = ccn.CCN2D(hidden=2, n_layers=L, dim_output=1, compat_contractions=True)
    variables = model.init(jax.random.key(0), cb, train=True)
    params = _copy_ccn_params(net_t, variables["params"], L)
    out = model.apply({"params": params}, cb, train=True)
    np.testing.assert_allclose(np.asarray(out)[0], ref_out, atol=3e-4)


def test_ccn_batched_equals_per_graph(rng):
    """A batch of graphs gives the same outputs as one-at-a-time."""
    recs = [_single_record(rng, n) for n in [5, 7, 4]]
    cb_all = ccn.make_ccn_batch(recs, k_max=8, vertex_capacity=20)
    model = ccn.CCN2D(hidden=3, n_layers=2, dim_output=1)
    variables = model.init(jax.random.key(1), cb_all, train=True)
    out_all = np.asarray(model.apply(variables, cb_all, train=True))
    for i, r in enumerate(recs):
        cb1 = ccn.make_ccn_batch([r], k_max=8, vertex_capacity=10)
        out1 = np.asarray(model.apply(variables, cb1, train=True))
        np.testing.assert_allclose(out_all[i], out1[0], atol=1e-4)


def test_ccn_permutation_invariance(rng):
    r = _single_record(rng, 6)
    perm = rng.permutation(6)
    rp = graphs.GraphRecord(x=r.x[perm], adj=r.adj[perm][:, perm], y=r.y)
    model = ccn.CCN2D(hidden=2, n_layers=2, dim_output=1)
    cb1 = ccn.make_ccn_batch([r])
    cb2 = ccn.make_ccn_batch([rp], k_max=int(cb1.chi_idx.shape[1]))
    variables = model.init(jax.random.key(2), cb1, train=True)
    o1 = np.asarray(model.apply(variables, cb1, train=True))
    o2 = np.asarray(model.apply(variables, cb2, train=True))
    np.testing.assert_allclose(o1, o2, atol=1e-4)


def test_ccn2d_vertex_chunked_equivalence(rng):
    """vertex_chunks gives identical outputs/grads to the monolithic path
    and handles large receptive fields without the full promotion tensor."""
    import jax

    from hgnn2_tpu.data import qm9 as qm9_data

    recs = qm9_data.synthetic_qm9_like(8, seed=3)
    cb = ccn.make_ccn_batch(recs, k_max=6, vertex_capacity=128)
    m1 = ccn.CCN2D(hidden=3, n_layers=2)
    m2 = ccn.CCN2D(hidden=3, n_layers=2, vertex_chunks=4)
    variables = m1.init(jax.random.key(0), cb, train=True)
    o1 = np.asarray(m1.apply(variables, cb, train=True))
    o2 = np.asarray(m2.apply(variables, cb, train=True))
    np.testing.assert_allclose(o1, o2, atol=1e-5)

    def loss(p, model):
        out = model.apply({"params": p}, cb, train=True)
        return (out**2).mean()

    g1 = jax.grad(lambda p: loss(p, m1))(variables["params"])
    g2 = jax.grad(lambda p: loss(p, m2))(variables["params"])
    for a, b in zip(
        jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_promote_contract_fused_scan_matches_materialized(rng):
    """promote_contract_18_fused (scan over neighbor slots, no 4-D T)
    == contract_18(promote_2d(...)), values and gradients."""
    import jax

    from hgnn2_tpu.data import qm9 as qm9_mod
    from hgnn2_tpu.nn import ccn as ccn_mod
    from hgnn2_tpu.ops import contractions as ct

    recs = qm9_mod.synthetic_qm9_like(6, seed=9)
    cb = ccn_mod.make_ccn_batch(recs, task=0)
    V, K = cb.nbr.shape
    C = 3
    f = jnp.asarray(rng.standard_normal((V, K, K, C)).astype(np.float32))
    mask2 = (cb.row_mask[:, :, None] * cb.row_mask[:, None, :])[..., None]
    f = f * mask2

    for compat in (False, True):
        t = ct.promote_2d(cb.chi_idx, cb.nbr, f)
        ref = ct.contract_18(t, cb.deg, cb.row_mask, compat=compat)
        out = ct.promote_contract_18_fused(
            cb.chi_idx, cb.nbr, f, cb.deg, cb.row_mask, compat=compat)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, err_msg=f"compat={compat}")

    def loss_ref(f):
        t = ct.promote_2d(cb.chi_idx, cb.nbr, f)
        return (ct.contract_18(t, cb.deg, cb.row_mask) ** 2).sum()

    def loss_fused(f):
        return (ct.promote_contract_18_fused(
            cb.chi_idx, cb.nbr, f, cb.deg, cb.row_mask) ** 2).sum()

    g_ref = jax.grad(loss_ref)(f)
    g_fused = jax.grad(loss_fused)(f)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-5)


def test_ccn2d_scan_promotion_matches_default(rng):
    import jax

    from hgnn2_tpu.data import qm9 as qm9_mod
    from hgnn2_tpu.nn import ccn as ccn_mod

    recs = qm9_mod.synthetic_qm9_like(5, seed=10)
    cb = ccn_mod.make_ccn_batch(recs, task=0)
    m_a = ccn_mod.CCN2D(hidden=2, n_layers=2)
    m_b = ccn_mod.CCN2D(hidden=2, n_layers=2, scan_promotion=True)
    v = m_a.init(jax.random.key(0), cb, train=True)
    out_a = m_a.apply(v, cb, train=True)
    out_b = m_b.apply(v, cb, train=True)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_a),
                               atol=1e-4, rtol=1e-5)
