from hgnn2_tpu.nn import layers, models, ccn  # noqa: F401
