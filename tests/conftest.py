"""Test configuration: force an 8-device virtual CPU mesh before jax import.

Multi-chip sharding logic is exercised on fake CPU devices (no pod needed);
the real-TPU bench path is driven separately by bench.py.
"""

import os

# The container's sitecustomize imports jax and pins JAX_PLATFORMS=axon at
# interpreter start, so plain env vars are too late here — override through
# the config API before any backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import sys

import numpy as np
import pytest

REFERENCE_PATH = "/root/reference"


@pytest.fixture(scope="session")
def reference_path():
    """Puts the reference repo on sys.path so its torch modules can serve as
    numerical oracles (read-only; parity targets, never code source)."""
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    return REFERENCE_PATH


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def reference_ccn_utils(reference_path):
    """Reference CompnetUtils with a torch-version shim: its _get_chi
    detects 'no shared neighbor' via nonzero().shape == Size([0]), which on
    modern torch is Size([0, 1]) — same math, updated emptiness check
    (shared with the trajectory harness)."""
    from functions.utils_ccn import CompnetUtils

    from tests.trajectory_common import _patch_ccn_utils

    _patch_ccn_utils()
    return CompnetUtils


def random_adjacency(rng, n, p=0.5, weighted=True, ensure_connected_row=True):
    """Random symmetric weighted adjacency with empty diagonal."""
    a = (rng.random((n, n)) < p).astype(np.float32)
    if weighted:
        a *= rng.integers(1, 4, size=(n, n)).astype(np.float32)
    a = np.triu(a, k=1)
    if ensure_connected_row:
        a[0, 1] = max(a[0, 1], 1.0)
    return a + a.T
