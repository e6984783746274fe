from hgnn2_tpu.data import batching, qm9, stats, synthetic  # noqa: F401
