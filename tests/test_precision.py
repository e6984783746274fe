"""bf16 mixed-precision policy: bf16 compute, f32 params / BN statistics /
readout accumulation. The reference is fp32-only torch; this is the
TPU-native dtype policy (MXU-native bf16 inputs, f32 accumulation via
preferred_element_type) with a parity tolerance against the fp32 path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hgnn2_tpu import graphs
from hgnn2_tpu.data import qm9
from hgnn2_tpu.nn import models


@pytest.fixture(scope="module")
def batch():
    recs = qm9.synthetic_qm9_like(16, seed=11)
    return graphs.make_dense_batch(recs, n_max=32, with_line_graph=True,
                                   batch_size=16, task=0)


@pytest.mark.parametrize("model_cls,kw", [
    (models.GNNSimple, {}),
    (models.GNNLineGraph, {"order": 2}),
])
def test_bf16_forward_close_to_fp32(batch, model_cls, kw):
    m32 = model_cls(n_features=3, n_layers=4, J=1, **kw)
    m16 = model_cls(n_features=3, n_layers=4, J=1, dtype=jnp.bfloat16, **kw)
    variables = m32.init(jax.random.key(0), batch, train=True)
    out32, _ = m32.apply(variables, batch, train=True, mutable=["batch_stats"])
    out16, upd = m16.apply(variables, batch, train=True, mutable=["batch_stats"])
    # params are shared (f32) between the two policies
    assert out16.dtype == jnp.float32  # readout accumulates in f32
    scale = float(jnp.abs(out32).mean()) + 1e-6
    rel = float(jnp.abs(out16 - out32).max()) / scale
    assert rel < 0.05, f"bf16 deviates {rel:.3f} from fp32"
    # BN running statistics stay f32 under the bf16 policy
    for leaf in jax.tree_util.tree_leaves(upd["batch_stats"]):
        assert leaf.dtype == jnp.float32


def test_bf16_training_step_learns(batch):
    import optax

    from hgnn2_tpu.training import train as train_lib

    model = models.GNNSimple(n_features=2, n_layers=3, J=1,
                             dtype=jnp.bfloat16)
    tx = optax.adamax(1e-2)
    state = train_lib.TrainState.create(model, batch, tx, jax.random.key(0))
    # params remain f32 (master weights) under the bf16 compute policy
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert leaf.dtype == jnp.float32
    step = train_lib.make_train_step("regression", 0.0, 1.0)
    losses = []
    for _ in range(30):
        state, mets = step(state, batch)
        losses.append(float(mets["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.7 * losses[0]
