"""Synthetic graph-classification dataset: three collinear points.

Re-implements the reference generator (/root/reference/functions/
data_generator.py:45 ``three_collinear_points``): n random graphs; with
probability p the node features contain three collinear vectors (three
random scalings of one random direction), the classification target being
to detect them. Adjacency is Erdos-Renyi-like: edge with probability 1 - c,
edge (0, 1) forced, symmetrized. (README.md calls this dataset "Binary
Stochastic Block Model"; the generator that exists is this collinear-points
task — we keep its actual semantics.)

Deviation noted: the reference keeps the random diagonal of its adjacency
(possible self-loops). We zero the diagonal so the line-graph construction
stays a simple graph; degrees differ by at most the self-loop weight.
"""

from __future__ import annotations

import numpy as np

from hgnn2_tpu.graphs import GraphRecord


def three_collinear_points(
    n: int,
    n_max: int = 50,
    dim: int = 5,
    p: float = 0.5,
    c: float = 0.5,
    seed: int = 0,
) -> list[GraphRecord]:
    """n graphs with int label y in {0, 1}; positive graphs contain three
    collinear feature vectors at random positions."""
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        ni = int(rng.integers(0, n_max - 3)) + 3
        y = int(rng.random() < p)
        if y:
            base = rng.standard_normal((1, dim)).astype(np.float32)
            three = 10.0 * rng.standard_normal((3, 1)).astype(np.float32) * base
            x = np.concatenate(
                [rng.standard_normal((ni - 3, dim)).astype(np.float32), three], axis=0
            )
            x = x[rng.permutation(ni)]
        else:
            x = rng.standard_normal((ni, dim)).astype(np.float32)
        a = (rng.random((ni, ni)) > c).astype(np.float32)
        a = np.triu(a, k=1)
        a[0, 1] = 1.0
        a = a + a.T
        out.append(GraphRecord(x=x, adj=a, y=np.int32(y)))
    return out


def split_80_10_10(records: list, shuffle: bool = False, seed: int = 0):
    """The reference's 80/10/10 split (preprocessing/loading.py:19)."""
    records = list(records)
    if shuffle:
        np.random.default_rng(seed).shuffle(records)
    n = len(records)
    n_train = int(0.8 * n)
    n_valid = int(0.1 * n)
    return (
        records[:n_train],
        records[n_train : n_train + n_valid],
        records[n_train + n_valid :],
    )
