"""Target statistics: per-task mean/std + chemical accuracy.

Replaces reference preprocessing/target_stats.py (pickled [means, stds,
accuracies]) with an in-memory/npz TargetStats. "Error ratio" = MAE on
normalized targets / chemical accuracy, the reference's headline quality
metric (scripts/main_gnn_qm9.py:231-241).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np

from hgnn2_tpu.data.qm9 import CHEMICAL_ACCURACY
from hgnn2_tpu.graphs import GraphRecord


@dataclasses.dataclass
class TargetStats:
    mean: np.ndarray  # (13,)
    std: np.ndarray  # (13,)
    accuracy: np.ndarray  # (13,)

    def normalize(self, y: np.ndarray, task: int) -> np.ndarray:
        """(y - mean) / std for one task (reference utils.normalize_data)."""
        s = self.std[task]
        if s < 1e-5:
            return y - self.mean[task]
        return (y - self.mean[task]) / s

    def error_ratio(self, mae: float, task: int) -> float:
        return float(mae / self.accuracy[task])

    def save(self, path: str) -> None:
        np.savez(path, mean=self.mean, std=self.std, accuracy=self.accuracy)

    @classmethod
    def load(cls, path: str) -> "TargetStats":
        z = np.load(path)
        return cls(mean=z["mean"], std=z["std"], accuracy=z["accuracy"])


def compute_target_stats(records: Sequence[GraphRecord]) -> TargetStats:
    ys = np.stack([r.y for r in records], axis=0)
    return TargetStats(
        mean=ys.mean(axis=0).astype(np.float32),
        std=ys.std(axis=0, ddof=1).astype(np.float32),
        accuracy=CHEMICAL_ACCURACY.copy(),
    )
