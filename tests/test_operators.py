"""Operator-construction tests: golden values on hand graphs + parity with
the reference torch implementation (used as a read-only oracle)."""

import numpy as np
import pytest

from hgnn2_tpu import operators
from tests.conftest import random_adjacency

# 4-path graph: 0-1-2-3
PATH4 = np.array(
    [
        [0, 1, 0, 0],
        [1, 0, 1, 0],
        [0, 1, 0, 1],
        [0, 0, 1, 0],
    ],
    dtype=np.float32,
)

# triangle graph
TRI = np.array([[0, 1, 1], [1, 0, 1], [1, 1, 0]], dtype=np.float32)


def test_operator_stack_hand_values():
    W = operators.operator_stack_dense(PATH4, J=2)
    assert W.shape == (4, 4, 4)
    np.testing.assert_array_equal(W[:, :, 0], np.eye(4))
    np.testing.assert_array_equal(np.diag(W[:, :, 1]), [1, 2, 2, 1])
    np.testing.assert_array_equal(W[:, :, 2], PATH4)
    np.testing.assert_array_equal(W[:, :, 3], PATH4 @ PATH4)


def test_line_graph_structure_path4():
    lg = operators.build_line_graph(PATH4)
    # 3 undirected edges -> 6 directed, interleaved fwd/rev
    assert lg.num_edges == 6
    np.testing.assert_array_equal(lg.src, [0, 1, 1, 2, 2, 3])
    np.testing.assert_array_equal(lg.dst, [1, 0, 2, 1, 3, 2])
    np.testing.assert_array_equal(lg.rev, [1, 0, 3, 2, 5, 4])
    AL = operators.nb_adjacency_dense(lg)
    # non-backtracking: (0->1) continues only to (1->2)
    expected = np.zeros((6, 6))
    expected[0, 2] = 1  # 0->1 -> 1->2
    expected[2, 4] = 1  # 1->2 -> 2->3
    expected[5, 3] = 1  # 3->2 -> 2->1
    expected[3, 1] = 1  # 2->1 -> 1->0
    np.testing.assert_array_equal(AL, expected)


def test_incidence_signs():
    lg = operators.build_line_graph(PATH4)
    Pm, Pd = operators.incidence_dense(lg, 4)
    # edge 0 = (0->1): Pm has 1 at both endpoints, Pd +1 at src, -1 at dst
    np.testing.assert_array_equal(Pm[:, 0], [1, 1, 0, 0])
    np.testing.assert_array_equal(Pd[:, 0], [1, -1, 0, 0])
    np.testing.assert_array_equal(Pd[:, 1], [-1, 1, 0, 0])
    # each column of Pm sums to 2, of Pd sums to 0
    np.testing.assert_array_equal(Pm.sum(0), np.full(6, 2.0))
    np.testing.assert_array_equal(Pd.sum(0), np.zeros(6))


def test_nb_triangle_no_backtrack():
    lg = operators.build_line_graph(TRI)
    AL = operators.nb_adjacency_dense(lg)
    # every directed edge in a triangle has exactly one NB continuation
    np.testing.assert_array_equal(AL.sum(1), np.ones(6))
    # and it is never the reverse edge
    for m in range(6):
        assert AL[m, lg.rev[m]] == 0


@pytest.mark.parametrize("n,p", [(5, 0.6), (9, 0.4), (12, 0.7)])
def test_operator_stack_matches_reference(reference_path, rng, n, p):
    import torch
    from functions.operators import graph_operators

    A = random_adjacency(rng, n, p)
    ref = graph_operators([torch.from_numpy(A), torch.from_numpy(A)], J=3)
    ours = operators.operator_stack_dense(A, J=3)
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-6)


@pytest.mark.parametrize("n,p", [(5, 0.6), (8, 0.5)])
def test_compat_line_graph_matches_reference_bug(reference_path, rng, n, p):
    import torch
    from functions.operators import graph_operators

    A = random_adjacency(rng, n, p)
    _, WL_ref, Pm_ref, Pd_ref = graph_operators(
        [torch.from_numpy(A), torch.from_numpy(A)], J=2, dual=True
    )
    WL, Pm, Pd = operators.line_graph_dense_compat(A, J=2)
    np.testing.assert_allclose(Pm, Pm_ref.numpy(), rtol=1e-6)
    np.testing.assert_allclose(Pd, Pd_ref.numpy(), rtol=1e-6)
    np.testing.assert_allclose(WL, WL_ref.numpy(), rtol=1e-5)


def test_intended_line_graph_brute_force(rng):
    """AL[m1,m2] = w(m2) iff head(m1)=tail(m2), tail(m1)!=head(m2)."""
    A = random_adjacency(rng, 7, 0.5)
    lg = operators.build_line_graph(A)
    AL = operators.nb_adjacency_dense(lg)
    M = lg.num_edges
    assert M == 2 * (np.count_nonzero(A) // 2)
    for m1 in range(M):
        for m2 in range(M):
            expect = (
                lg.w[m2]
                if (lg.dst[m1] == lg.src[m2] and lg.src[m1] != lg.dst[m2])
                else 0.0
            )
            assert AL[m1, m2] == expect


def test_permutation_covariance_of_operators(rng):
    """Relabeling nodes conjugates W and permutes the line graph."""
    A = random_adjacency(rng, 6, 0.6)
    perm = rng.permutation(6)
    P = np.eye(6)[perm]
    A2 = P @ A @ P.T
    W1 = operators.operator_stack_dense(A, J=2)
    W2 = operators.operator_stack_dense(A2, J=2)
    for j in range(W1.shape[2]):
        np.testing.assert_allclose(W2[:, :, j], P @ W1[:, :, j] @ P.T, atol=1e-5)
