"""Pallas ring all-reduce over a mesh axis (explicit inter-chip RDMA).

The edge-partitioned aggregation in parallel/spmd.py assembles full node
blocks with lax.psum; this module provides the hand-scheduled equivalent —
a bidirectional-capable ring of pltpu.make_async_remote_copy hops — for
the cases where XLA's collective scheduling does not overlap communication
with the local segment-sum work. ring_psum(x, axis_name, axis_size) is a
drop-in psum replacement inside shard_map.

Each of the axis_size-1 steps forwards the block received on the previous
step (starting with the local block) to the right neighbor and adds the
incoming block into the accumulator; double-buffered slots + a neighbor
barrier keep hops race-free (pattern after the Pallas ring-collective
guide).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ring_kernel(local_ref, out_ref, comm_buf, send_sem, recv_sem,
                 *, axis_name: str, axis_size: int):
    me = jax.lax.axis_index(axis_name)
    right = jax.lax.rem(me + 1, axis_size)

    out_ref[:] = local_ref[:]
    comm_buf[0] = local_ref[:]

    # Schedule-synchronous double-buffered ring (the guide's ring-collective
    # pattern): every device runs the identical hop schedule; rdma.wait()
    # blocks on (a) my send completing — the send slot is reusable — and
    # (b) my recv semaphore — signaled by the left neighbor's copy into my
    # recv slot. Slot alternation means a slot is overwritten exactly two
    # hops after it was last read, which the per-hop waits order correctly.
    for step in range(axis_size - 1):
        send_slot = step % 2
        recv_slot = (step + 1) % 2
        rdma = pltpu.make_async_remote_copy(
            src_ref=comm_buf.at[send_slot],
            dst_ref=comm_buf.at[recv_slot],
            send_sem=send_sem.at[send_slot],
            recv_sem=recv_sem.at[recv_slot],
            device_id=right,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        rdma.start()
        rdma.wait()
        out_ref[:] += comm_buf[recv_slot]


def ring_psum(x: jnp.ndarray, axis_name: str, axis_size: int,
              interpret: bool = False, collective_id: int = 7) -> jnp.ndarray:
    """All-reduce sum of x over `axis_name` (call inside shard_map).

    Constraint: LOGICAL device ids address a single-axis mesh; call this
    under a shard_map whose mesh has only `axis_name` (slice a sub-mesh
    for multi-axis topologies).
    """
    if axis_size == 1:
        return x
    kern = functools.partial(
        _ring_kernel, axis_name=axis_name, axis_size=axis_size
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2,) + x.shape, x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=collective_id
        ),
        interpret=interpret,
    )(x)
