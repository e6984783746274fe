"""Pallas ring all-reduce vs lax.psum on the virtual CPU mesh
(interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from hgnn2_tpu.ops.pallas.ring import ring_psum
from hgnn2_tpu.parallel import spmd


@pytest.fixture(scope="module")
def mesh():
    # ring RDMA with LOGICAL device ids requires a single-axis mesh
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()[:4]), ("edge",))


def test_ring_psum_matches_lax_psum(mesh, rng):
    x = rng.standard_normal((4, 16, 128)).astype(np.float32)
    n = mesh.shape["edge"]

    def f_ring(x):
        return ring_psum(x, "edge", n, interpret=True)

    def f_lax(x):
        return jax.lax.psum(x, "edge")

    specs = dict(mesh=mesh, in_specs=P("edge"), out_specs=P("edge"),
                 check_rep=False)
    got = shard_map(f_ring, **specs)(jnp.asarray(x))
    expect = shard_map(f_lax, **specs)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=1e-5)


def test_ring_psum_axis_size_one(mesh, rng):
    x = jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(ring_psum(x, "edge", 1)), np.asarray(x)
    )
