"""Pallas TPU kernels.

Living kernels:
  * ring.py — RDMA ring all-reduce (== psum, tested), the comm primitive
    for edge-partitioned aggregation when XLA's collective overlap is
    insufficient.
  * ccn_fused.py — fused promotion + 18-contraction CCN-2D layer.

Kernel graveyard (every kernel must beat XLA at a real config to stay):
  * fused power-layer BACKWARD (removed round 3): two designs measured,
    both lost to the rematerializing jnp backward at the showcase config
    (B=64 N=256 F=H=64 J=2: XLA 1.00 ms, fused fwd + jnp bwd 1.03 ms,
    fused fwd + Pallas bwd 1.23 ms).
  * fused power-layer FORWARD (removed round 5): the whole pre-BN layer
    body (multi-operator apply + both convs) in one kernel. At the tiny
    QM9 shapes (N=32, F=1-8) Mosaic serializes the small per-graph
    matmuls and XLA wins decisively; at the kernel's OWN best shape
    (B=64 N=256 F=H=64 J=2) the full grad step still measured XLA
    2.527 ms vs fused 2.807 ms (BENCH_r04 BENCH_DETAILS.json
    fused_power_layer_grad_step_ms). A kernel that loses at every
    measured config is maintenance surface, not capability — deleted;
    git history before round 5 keeps the code and its tests.
"""
