from hgnn2_tpu.parallel import spmd  # noqa: F401
