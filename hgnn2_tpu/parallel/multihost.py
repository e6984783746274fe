"""Multi-host (multi-process) execution over DCN.

The reference has no distribution story at all — its SLURM scripts request
``--nodes=2..8`` that the single Python process never uses
(/root/reference/scripts/test.sh, exp_lggnn_qm9.sh). This module is the
real thing: N processes (one per host, each owning its local devices) form
one global device mesh; data parallelism runs over the global 'data' axis
with per-process record shards, XLA inserting the cross-host collectives
(grad psum over DCN, edge-axis psums over ICI within a host).

Process topology is standard JAX: ``jax.distributed.initialize`` with a
coordinator address; every process traces the same program over the global
mesh and feeds its local shard via
``jax.make_array_from_process_local_data``.

Tested without real hosts by launching N local processes with virtual CPU
devices (tests/test_multihost.py, scripts/dryrun_multihost.py).
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def setup_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize the JAX distributed runtime for multi-process execution.

    Arguments default to the HGNN2_COORDINATOR / HGNN2_NUM_PROCESSES /
    HGNN2_PROCESS_ID environment variables; with none set and no cluster
    autodetection available this is a no-op (single process). On TPU pods
    with standard cluster env vars, plain ``jax.distributed.initialize()``
    autodetects everything.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "HGNN2_COORDINATOR")
    if num_processes is None and "HGNN2_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["HGNN2_NUM_PROCESSES"])
    if process_id is None and "HGNN2_PROCESS_ID" in os.environ:
        process_id = int(os.environ["HGNN2_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        try:  # TPU pod / cluster autodetection
            jax.distributed.initialize()
        except Exception:  # single process, nothing to set up
            return
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def shard_records(records, num_processes: int | None = None,
                  process_index: int | None = None):
    """Deterministic per-process subset of the dataset (strided so every
    process sees the same molecule-size distribution). Each process builds
    batches only from its own shard — the per-process data sharding that
    the loaders compose with."""
    if num_processes is None:
        num_processes = jax.process_count()
    if process_index is None:
        process_index = jax.process_index()
    return records[process_index::num_processes]


def global_mesh(axis_names=("data",), shape=None) -> Mesh:
    """Mesh over ALL global devices (across processes). Default: one
    'data' axis over everything; pass shape to factor axes, e.g.
    shape=(n_processes, local) for ('data', 'edge')."""
    devs = np.array(jax.devices())
    if shape is not None:
        devs = devs.reshape(shape)
    return Mesh(devs, axis_names)


def make_global_batch(mesh: Mesh, local_batch, axis: str = "data"):
    """Assemble each process's local batch pytree into one global jax.Array
    pytree sharded along `axis` (batch dimension 0). All processes must
    pass identically-shaped local batches (static bucket shapes guarantee
    this)."""
    sharding = NamedSharding(mesh, P(axis))

    def _to_global(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(_to_global, local_batch)


def replicate_to_mesh(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) over the whole mesh. Every
    process must hold identical values (same init seed)."""
    sharding = NamedSharding(mesh, P())

    def _rep(x):
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x))

    return jax.tree_util.tree_map(_rep, tree)
