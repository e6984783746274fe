"""Profiling and roofline accounting.

The reference's only instrumentation is wall-clock meters
(functions/utils.py:115-146). Here: a step timer with device
synchronization, edges/s + bytes/edge roofline accounting for aggregation
ops, and a jax.profiler trace context for deep dives.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Callable

import jax


@dataclasses.dataclass
class StepTiming:
    steps: int
    total_s: float

    @property
    def per_step_s(self) -> float:
        return self.total_s / max(self.steps, 1)

    def throughput(self, items_per_step: float) -> float:
        return items_per_step * self.steps / self.total_s


def force_sync(out) -> None:
    """Reliable device barrier: fetch ONE element of one output leaf.

    jax.block_until_ready can return BEFORE remote execution completes on
    tunneled PJRT backends (measured on the axon plugin: block returned in
    0.35 ms while the queued computation took seconds; a value fetch after
    the "block" waited the full time). Fetching a single element forces
    the producer chain to finish and costs one small transfer, so every
    timing in this module syncs this way. On local backends it is
    equivalent to block_until_ready plus a 4-byte copy.
    """
    leaves = [l for l in jax.tree_util.tree_leaves(out)
              if hasattr(l, "ravel") and getattr(l, "size", 0)]
    if not leaves:
        jax.block_until_ready(out)
        return
    # one element of EVERY leaf, fetched in one call — independent
    # dispatch chains (un-jitted compositions) all get awaited
    jax.device_get([l.ravel()[0] for l in leaves])


def time_steps(fn: Callable, *args, steps: int = 20, warmup: int = 2) -> StepTiming:
    """Times `steps` calls of fn(*args) with a RELIABLE device sync at the
    end (force_sync — see its docstring for why block_until_ready is not
    enough here).

    fn must be side-effect free w.r.t. args (same args each call).
    NOTE: identical-args repetition measures an upper bound on throughput
    (XLA may hoist batch-dependent work); chain dependent calls or thread
    state (time_scan_steps) when that matters.
    """
    out = None
    for _ in range(warmup):
        out = fn(*args)
    force_sync(out)
    t0 = time.time()
    for _ in range(steps):
        out = fn(*args)
    force_sync(out)
    return StepTiming(steps=steps, total_s=time.time() - t0)


def time_scan_steps(step_fn: Callable, state, batch, steps: int = 20, warmup: int = 2):
    """Times a (state, batch) -> (state, aux) step function, threading
    state; syncs via force_sync (see time_steps)."""
    for _ in range(warmup):
        state, aux = step_fn(state, batch)
    force_sync(aux)
    t0 = time.time()
    for _ in range(steps):
        state, aux = step_fn(state, batch)
    force_sync(aux)
    return state, StepTiming(steps=steps, total_s=time.time() - t0)


@dataclasses.dataclass
class AggregationRoofline:
    """Roofline model for one multi-operator aggregation pass."""

    n_edges: int  # real (unpadded) directed edges
    n_nodes: int
    feature_dim: int
    dense_block: tuple | None = None  # (B, N) when dense-block layout

    def flops(self, n_operators: int = 1) -> int:
        if self.dense_block:
            b, n = self.dense_block
            return 2 * b * n * n * self.feature_dim * n_operators
        return 2 * self.n_edges * self.feature_dim * n_operators

    def bytes_moved(self, dtype_bytes: int = 4) -> int:
        if self.dense_block:
            b, n = self.dense_block
            return dtype_bytes * (b * n * n + 2 * b * n * self.feature_dim)
        return dtype_bytes * (
            3 * self.n_edges + 2 * self.n_nodes * self.feature_dim
        )

    def edges_per_s(self, timing: StepTiming) -> float:
        return self.n_edges / timing.per_step_s

    def bytes_per_edge(self) -> float:
        return self.bytes_moved() / max(self.n_edges, 1)


# Peak dense matmul throughput per chip, FLOP/s. Sources: public TPU
# spec sheets (per chip, not per core); bf16 = MXU native, f32 = bf16x3
# passes (~1/3 of peak) except on generations with native f32 paths.
_CHIP_PEAK_FLOPS = {
    # kind-substring: {dtype: peak}
    "v5 lite": {"bfloat16": 197e12, "float32": 197e12 / 4},
    "v5litepod": {"bfloat16": 197e12, "float32": 197e12 / 4},
    "v5e": {"bfloat16": 197e12, "float32": 197e12 / 4},
    "v5p": {"bfloat16": 459e12, "float32": 459e12 / 4},
    "v4": {"bfloat16": 275e12, "float32": 275e12 / 4},
    "v6": {"bfloat16": 918e12, "float32": 918e12 / 4},
}


def chip_peak_flops(dtype: str = "bfloat16") -> float | None:
    """Peak matmul FLOP/s of the local chip for dtype ('bfloat16'/'float32'),
    or None when the device generation is unknown. MFU = achieved / this."""
    kind = jax.devices()[0].device_kind.lower()
    for key, peaks in _CHIP_PEAK_FLOPS.items():
        if key in kind:
            return peaks[dtype]
    return None


def mfu(flops_per_s: float, dtype: str = "bfloat16") -> float | None:
    """Model-FLOP utilization: achieved FLOP/s over the chip's peak."""
    peak = chip_peak_flops(dtype)
    return None if peak is None else flops_per_s / peak


# Peak HBM bandwidth per chip, bytes/s (public TPU spec sheets).
_CHIP_PEAK_HBM = {
    "v5 lite": 819e9,
    "v5litepod": 819e9,
    "v5e": 819e9,
    "v5p": 2765e9,
    "v4": 1228e9,
    "v6": 1640e9,
}


def chip_peak_hbm_bytes_per_s() -> float | None:
    """Peak HBM bandwidth of the local chip, or None if unknown."""
    kind = jax.devices()[0].device_kind.lower()
    for key, peak in _CHIP_PEAK_HBM.items():
        if key in kind:
            return peak
    return None


def hbm_utilization(bytes_per_s: float) -> float | None:
    """Achieved HBM traffic over the chip's peak bandwidth — the roofline
    metric for bandwidth-bound aggregation kernels (a value near 1.0 means
    a hand-written kernel cannot go meaningfully faster)."""
    peak = chip_peak_hbm_bytes_per_s()
    return None if peak is None else bytes_per_s / peak


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/hgnn2_trace"):
    """jax.profiler trace context; view with tensorboard or xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
