"""Runtime setup: compilation cache, precision policy, device helpers.

The framework targets environments where XLA compilation may be remote and
slow; the persistent compilation cache makes every program compile once per
machine. Call setup() at process start (CLI drivers, bench, entry points do).
"""

from __future__ import annotations

import os

import jax

_DEFAULT_CACHE_DIR = os.environ.get(
    "HGNN2_COMPILATION_CACHE", os.path.expanduser("~/.cache/hgnn2_tpu_xla_cache")
)


def setup(
    compilation_cache_dir: str | None = _DEFAULT_CACHE_DIR,
    matmul_precision: str | None = None,
) -> None:
    """Configure JAX for the framework.

    matmul_precision: None keeps the backend default (bf16 inputs on the
    TPU MXU — fastest); "highest" forces f32 accumulation everywhere
    (parity/debug). Individual ops in this codebase always request
    float32 accumulation via preferred_element_type.
    """
    if compilation_cache_dir:
        os.makedirs(compilation_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", compilation_cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if matmul_precision:
        jax.config.update("jax_default_matmul_precision", matmul_precision)


def force_cpu(n_devices: int = 8) -> None:
    """Route this process to N virtual CPU devices (tests / dry runs).

    Must run before any backend is initialized. Works even when a
    sitecustomize pinned JAX_PLATFORMS at interpreter start.
    """
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n_devices)
