from hgnn2_tpu.ops import dense, sparse  # noqa: F401
