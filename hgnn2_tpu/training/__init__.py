from hgnn2_tpu.training import checkpoint, config, metrics, optim, train  # noqa: F401
