"""hgnn2_tpu — a TPU-native hierarchical graph neural network framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
repo AmmieQi/HGNN-2 (see SURVEY.md): power-GNNs over graph operator stacks
{I, D, A, A^2, ...}, line-graph GNNs with non-backtracking edge-dual message
passing through signed incidence maps Pm/Pd, and covariant compositional
networks (CCN-1D / CCN-2D) with permutation-covariant tensor contractions —
trained on QM9 molecular property regression and synthetic graph
classification.

Design stance (TPU-first, not a port):
  * Molecules are tiny (N <= 29 on QM9) so the primary compute layout is
    dense-block batched einsum on the MXU over bucketed, padded batches —
    one XLA compilation per bucket shape, zero per-sample Python loops.
  * A packed-sparse (edge list + segment-sum) path covers large graphs and
    edge-partitioned multi-chip execution.
  * The CCN-2D "promote to 6-D then 18 contractions" pipeline of the
    reference (functions/contraction.py) is fused algebraically: chi_ii is
    always the identity, so all 18 contractions reduce to O(d^2) einsum
    reductions of the batched promotion tensor.
  * Distribution is jax.sharding meshes + shard_map collectives over ICI,
    not a translation of any host-side loop.
"""

__version__ = "0.1.0"

from hgnn2_tpu import graphs, operators  # noqa: F401
