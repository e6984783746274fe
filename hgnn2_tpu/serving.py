"""Model export and serving: frozen, cross-platform inference artifacts.

The reference has no serving story at all — its only model persistence is a
whole-module ``torch.save`` reloaded into the training driver
(/root/reference/functions/logs.py:99-123, scripts/main_gnn_qm9.py:149-161),
so serving a trained model requires the full training codebase, the exact
class definitions, and a matching torch version.

Here a trained model is exported through ``jax.export`` into a single
serialized StableHLO artifact with the parameters frozen in as constants:

  * self-contained — the serving process needs jax, not this framework's
    model classes or the training stack;
  * cross-platform — one artifact lowered for several platforms
    (``platforms=("tpu", "cpu")`` by default) runs on a TPU serving fleet
    and on a CPU dev box, byte-identical;
  * static-shape — the artifact bakes one (batch, nodes) serving bucket,
    which is exactly the TPU serving discipline (no dynamic shapes at
    runtime); ``ServingModel.predict`` chunks and pads arbitrary request
    sizes into that bucket;
  * denormalizing — target mean/std travel in the bundle, so the service
    returns physical units, not normalized regression space.

A bundle is a directory:
    model.jaxexport   serialized jax.export.Exported (params are constants)
    meta.json         batch kind, serving bucket shape, target stats
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Callable, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from hgnn2_tpu import graphs

DEFAULT_PLATFORMS = ("tpu", "cpu")
_ARTIFACT = "model.jaxexport"
_META = "meta.json"


def batch_to_arrays(batch: Any) -> dict[str, jnp.ndarray]:
    """Flatten any batch struct (DenseGraphBatch, CCNBatch) into a plain
    dict of arrays — the exported function's input signature. Plain dicts
    serialize through jax.export without custom pytree registration.
    Non-array fields (static ints like CCNBatch.n_graphs, which feed
    segment-count shapes) are excluded — make_forward bakes them in."""
    out = {}
    for f in dataclasses.fields(batch):
        v = getattr(batch, f.name)
        if v is not None and isinstance(v, (np.ndarray, jnp.ndarray)):
            out[f.name] = jnp.asarray(v)
    return out


def make_forward(
    model: Any, variables: Mapping[str, Any], example_batch: Any
) -> Callable[[dict[str, jnp.ndarray]], jnp.ndarray]:
    """Eval-mode forward over a dict-of-arrays batch, with the trained
    variables (params + BN running stats) closed over — they become
    constants of the exported program. Static (non-array) batch fields are
    baked in from the example batch: they define shapes (e.g. segment
    counts) and must stay concrete under tracing."""
    batch_cls = type(example_batch)
    static = {
        f.name: getattr(example_batch, f.name)
        for f in dataclasses.fields(example_batch)
        if getattr(example_batch, f.name) is not None
        and not isinstance(getattr(example_batch, f.name), (np.ndarray, jnp.ndarray))
    }

    def fwd(arrays: dict[str, jnp.ndarray]) -> jnp.ndarray:
        return model.apply(variables, batch_cls(**static, **arrays), train=False)

    return fwd


def export_model(
    model: Any,
    variables: Mapping[str, Any],
    batch: Any,
    platforms: Sequence[str] = DEFAULT_PLATFORMS,
) -> jax_export.Exported:
    """Trace + lower the frozen eval forward at ``batch``'s shapes for every
    platform in ``platforms``. The example batch fixes the serving bucket."""
    fwd = make_forward(model, variables, batch)
    return jax_export.export(jax.jit(fwd), platforms=tuple(platforms))(
        batch_to_arrays(batch)
    )


def save_bundle(
    path: str,
    exported: jax_export.Exported,
    *,
    kind: str,
    task: int | None = None,
    mean: float = 0.0,
    std: float = 1.0,
    extra: Mapping[str, Any] | None = None,
) -> None:
    """Write a serving bundle directory. kind: 'dense' | 'ccn'."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _ARTIFACT), "wb") as f:
        f.write(exported.serialize())
    spec_tree = jax.tree.unflatten(exported.in_tree, list(exported.in_avals))
    in_spec = {
        k: [list(v.shape), np.dtype(v.dtype).name]
        for k, v in spec_tree[0][0].items()
    }
    meta = {
        "kind": kind,
        "platforms": list(exported.platforms),
        "task": task,
        "mean": float(mean),
        "std": float(std),
        "input_spec": in_spec,
        **dict(extra or {}),
    }
    with open(os.path.join(path, _META), "w") as f:
        f.write(json.dumps(meta, indent=1) + "\n")


class ServingModel:
    """A loaded bundle: deserialized artifact + request batching.

    ``call(arrays)`` runs the frozen forward on one already-shaped batch.
    ``predict(records)`` (dense bundles) serves an arbitrary number of
    GraphRecords: chunks them into the exported bucket, pads the tail
    chunk, and returns denormalized per-graph predictions.
    """

    def __init__(self, path: str):
        with open(os.path.join(path, _ARTIFACT), "rb") as f:
            self.exported = jax_export.deserialize(bytearray(f.read()))
        with open(os.path.join(path, _META)) as f:
            self.meta = json.loads(f.read())
        self._jitted = jax.jit(self.exported.call)

    @property
    def kind(self) -> str:
        return self.meta["kind"]

    @property
    def input_spec(self) -> dict[str, Any]:
        return self.meta["input_spec"]

    def call(self, arrays: dict[str, jnp.ndarray]) -> jnp.ndarray:
        return self._jitted(arrays)

    # -- dense-bundle record serving ------------------------------------
    def _bucket(self) -> tuple[int, int]:
        b, n = self.input_spec["x"][0][:2]
        return int(b), int(n)

    def predict(self, records: Sequence[graphs.GraphRecord]) -> np.ndarray:
        if self.kind != "dense":
            raise ValueError(f"predict() serves dense bundles, not {self.kind!r}")
        bsz, n_max = self._bucket()
        with_lg = "lg_src" in self.input_spec
        mean, std = self.meta["mean"], self.meta["std"]
        task = self.meta.get("task")
        m_max = self.input_spec["lg_src"][0][1] if with_lg else None
        for i, r in enumerate(records):
            if r.n_nodes > n_max or (with_lg and r.n_dir_edges > m_max):
                raise ValueError(
                    f"record {i} ({r.n_nodes} nodes"
                    + (f", {r.n_dir_edges} directed edges" if with_lg else "")
                    + f") exceeds this bundle's serving bucket "
                    f"(n_max={n_max}" + (f", m_max={m_max}" if with_lg else "")
                    + ") — re-export with a larger example batch"
                )
        out = np.empty(len(records), np.float32)
        for lo in range(0, len(records), bsz):
            chunk = records[lo : lo + bsz]
            batch = graphs.make_dense_batch(
                chunk,
                n_max=n_max,
                m_max=m_max,
                batch_size=bsz,
                with_line_graph=with_lg,
                task=task,
            )
            pred = np.asarray(self.call(batch_to_arrays(batch)))[:, 0]
            out[lo : lo + len(chunk)] = pred[: len(chunk)] * std + mean
        return out


def load_bundle(path: str) -> ServingModel:
    return ServingModel(path)
