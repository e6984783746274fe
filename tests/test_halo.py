"""Halo-exchange edge partitioning: exact agreement with the full SpMM,
gradients, and halo-size accounting."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hgnn2_tpu.ops import sparse
from hgnn2_tpu.parallel import halo, spmd


@pytest.fixture(scope="module")
def mesh():
    return spmd.make_mesh(8, edge_axis=4)


def _graph(rng, V=64, E=512):
    src = rng.integers(0, V, E).astype(np.int32)
    dst = rng.integers(0, V, E).astype(np.int32)
    w = rng.random(E).astype(np.float32)
    return src, dst, w


def test_halo_spmm_matches_full(mesh, rng):
    V, F = 64, 5
    src, dst, w = _graph(rng, V=V)
    S = mesh.shape["edge"]
    part = halo.build_halo_partition(src, dst, w, V, S)
    x = rng.standard_normal((V, F)).astype(np.float32)
    x_stacked = jnp.asarray(x.reshape(S, V // S, F))

    with jax.sharding.set_mesh(mesh):
        f = halo.halo_partitioned_spmm(mesh, part)
        out = np.asarray(jax.jit(f)(x_stacked)).reshape(V, F)

    expect = np.asarray(
        sparse.spmm(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w),
                    jnp.asarray(x), V)
    )
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_halo_spmm_gradients(mesh, rng):
    V, F = 32, 3
    src, dst, w = _graph(rng, V=V, E=200)
    S = mesh.shape["edge"]
    part = halo.build_halo_partition(src, dst, w, V, S)
    x = rng.standard_normal((V, F)).astype(np.float32)
    x_stacked = jnp.asarray(x.reshape(S, V // S, F))

    with jax.sharding.set_mesh(mesh):
        f = halo.halo_partitioned_spmm(mesh, part)
        g_part = np.asarray(
            jax.grad(lambda xx: (f(xx) ** 2).sum())(x_stacked)
        ).reshape(V, F)

    def full_loss(xx):
        return (
            sparse.spmm(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w), xx, V)
            ** 2
        ).sum()

    g_full = np.asarray(jax.grad(full_loss)(jnp.asarray(x)))
    np.testing.assert_allclose(g_part, g_full, atol=1e-4)


def test_halo_volume_much_smaller_than_full_block(rng):
    """For a locality-friendly graph the halo is a small fraction of V."""
    V, S = 1024, 8
    # ring-of-cliques graph: mostly local edges + a few long-range ones
    src_l, dst_l = [], []
    for v in range(V):
        for _ in range(6):
            u = (v + int(rng.integers(-8, 9))) % V
            src_l.append(v)
            dst_l.append(u)
    for _ in range(40):  # long-range
        src_l.append(int(rng.integers(0, V)))
        dst_l.append(int(rng.integers(0, V)))
    src = np.array(src_l, np.int32)
    dst = np.array(dst_l, np.int32)
    w = np.ones(len(src), np.float32)
    part = halo.build_halo_partition(src, dst, w, V, S)
    halo_fraction = part.n_imports / (V // S)
    assert halo_fraction < 0.35, halo_fraction  # vs 8x for full replication
