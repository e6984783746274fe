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


# Batch fields the eval forward never reads. Excluded from the exported
# input signature so a frozen artifact does not demand labels at inference
# time; make_forward bakes zero placeholders in for them.
EXPORT_EXCLUDE = ("y",)


def batch_to_arrays(batch: Any, exclude: Sequence[str] = ()) -> dict[str, jnp.ndarray]:
    """Flatten any batch struct (DenseGraphBatch, CCNBatch) into a plain
    dict of arrays — the exported function's input signature. Plain dicts
    serialize through jax.export without custom pytree registration.
    Non-array fields (static ints like CCNBatch.n_graphs, which feed
    segment-count shapes) are excluded — make_forward bakes them in."""
    out = {}
    for f in dataclasses.fields(batch):
        if f.name in exclude:
            continue
        v = getattr(batch, f.name)
        if v is not None and isinstance(v, (np.ndarray, jnp.ndarray)):
            out[f.name] = jnp.asarray(v)
    return out


def make_forward(
    model: Any,
    variables: Mapping[str, Any],
    example_batch: Any,
    exclude: Sequence[str] = EXPORT_EXCLUDE,
) -> Callable[[dict[str, jnp.ndarray]], jnp.ndarray]:
    """Eval-mode forward over a dict-of-arrays batch, with the trained
    variables (params + BN running stats) closed over — they become
    constants of the exported program. Static (non-array) batch fields are
    baked in from the example batch: they define shapes (e.g. segment
    counts) and must stay concrete under tracing. Array fields in
    ``exclude`` (labels) get zero placeholders baked in instead of becoming
    inputs — the eval forward never reads them."""
    batch_cls = type(example_batch)
    static = {}
    for f in dataclasses.fields(example_batch):
        v = getattr(example_batch, f.name)
        if v is None:
            continue
        if isinstance(v, (np.ndarray, jnp.ndarray)):
            if f.name in exclude:
                static[f.name] = jnp.zeros_like(v)
        else:
            static[f.name] = v

    def fwd(arrays: dict[str, jnp.ndarray]) -> jnp.ndarray:
        return model.apply(variables, batch_cls(**static, **arrays), train=False)

    return fwd


def export_model(
    model: Any,
    variables: Mapping[str, Any],
    batch: Any,
    platforms: Sequence[str] = DEFAULT_PLATFORMS,
    exclude: Sequence[str] = EXPORT_EXCLUDE,
) -> jax_export.Exported:
    """Trace + lower the frozen eval forward at ``batch``'s shapes for every
    platform in ``platforms``. The example batch fixes the serving bucket."""
    fwd = make_forward(model, variables, batch, exclude=exclude)
    return jax_export.export(jax.jit(fwd), platforms=tuple(platforms))(
        batch_to_arrays(batch, exclude=exclude)
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
    """Write a serving bundle directory. kind: 'dense' | 'packed' | 'ccn'.

    For CCN bundles whose example batch was built with
    add_self_loops=False, pass extra={"add_self_loops": False} so
    predict() rebuilds chi tables the same way (default True)."""
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
        # keep only the exported signature's inputs, so callers may pass a
        # full batch_to_arrays() dict (labels and all) to any bundle
        arrays = {k: v for k, v in arrays.items() if k in self.input_spec}
        return self._jitted(arrays)

    # -- record serving (all bundle kinds) ------------------------------
    def _bucket(self) -> tuple[int, int]:
        b, n = self.input_spec["x"][0][:2]
        return int(b), int(n)

    def predict(self, records: Sequence[graphs.GraphRecord]) -> np.ndarray:
        """Serve an arbitrary number of GraphRecords through the exported
        bucket: records are chunked/packed to the frozen shapes, the tail
        padded, predictions denormalized with the bundle's target stats."""
        if self.kind == "ccn":
            return self._predict_ccn(records)
        if self.kind == "packed":
            return self._predict_packed(records)
        if self.kind != "dense":
            raise ValueError(f"unknown bundle kind {self.kind!r}")
        return self._predict_dense(records)

    def _predict_dense(self, records: Sequence[graphs.GraphRecord]) -> np.ndarray:
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

    # -- ccn-bundle record serving --------------------------------------
    def _predict_ccn(self, records: Sequence[graphs.GraphRecord]) -> np.ndarray:
        """Pack records into the exported CCN bucket (vertex capacity V,
        receptive-field K, graph slots B) chunk by chunk."""
        from hgnn2_tpu.nn import ccn as ccn_mod

        v_cap = int(self.input_spec["x"][0][0])
        k_max = int(self.input_spec["nbr"][0][1])
        bsz = int(self.input_spec["gmask"][0][0])
        add_loops = bool(self.meta.get("add_self_loops", True))
        bump = 1 if add_loops else 0
        task = self.meta.get("task")
        mean, std = self.meta["mean"], self.meta["std"]

        def fits(chunk, r):
            if r.max_degree() + bump > k_max:
                raise ValueError(
                    f"record degree {r.max_degree()}+{bump} exceeds the "
                    f"bundle's K={k_max} — re-export with a larger k_max"
                )
            if r.n_nodes > v_cap:
                raise ValueError(
                    f"record with {r.n_nodes} vertices exceeds the bundle's "
                    f"vertex capacity {v_cap}"
                )
            nodes = sum(c.n_nodes for c in chunk) + r.n_nodes
            return len(chunk) < bsz and nodes <= v_cap

        out = np.empty(len(records), np.float32)
        done = 0
        for chunk in _greedy_chunks(records, fits):
            batch = ccn_mod.make_ccn_batch(
                chunk, k_max=k_max, vertex_capacity=v_cap,
                add_self_loops=add_loops, task=task, batch_size=bsz,
            )
            pred = np.asarray(self.call(batch_to_arrays(batch)))[:, 0]
            out[done : done + len(chunk)] = pred[: len(chunk)] * std + mean
            done += len(chunk)
        return out

    # -- packed-bundle record serving -----------------------------------
    def _predict_packed(self, records: Sequence[graphs.GraphRecord]) -> np.ndarray:
        """Pack records into the exported packed bucket (node capacity V,
        edge capacity C, graph slots B) chunk by chunk."""
        v_cap = int(self.input_spec["x"][0][0])
        e_cap = int(self.input_spec["src"][0][0])
        bsz = int(self.input_spec["gmask"][0][0])
        task = self.meta.get("task")
        mean, std = self.meta["mean"], self.meta["std"]

        def fits(chunk, r):
            if r.n_nodes > v_cap or r.n_dir_edges > e_cap:
                raise ValueError(
                    f"record ({r.n_nodes} nodes, {r.n_dir_edges} directed "
                    f"edges) exceeds the bundle's packed capacities "
                    f"(V={v_cap}, C={e_cap}) — re-export with larger ones"
                )
            nodes = sum(c.n_nodes for c in chunk) + r.n_nodes
            edges = sum(c.n_dir_edges for c in chunk) + r.n_dir_edges
            return len(chunk) < bsz and nodes <= v_cap and edges <= e_cap

        out = np.empty(len(records), np.float32)
        done = 0
        for chunk in _greedy_chunks(records, fits):
            batch = graphs.make_packed_batch(
                chunk, node_capacity=v_cap, edge_capacity=e_cap,
                task=task, batch_size=bsz,
            )
            pred = np.asarray(self.call(batch_to_arrays(batch)))[:, 0]
            out[done : done + len(chunk)] = pred[: len(chunk)] * std + mean
            done += len(chunk)
        return out


def _greedy_chunks(records: Sequence[graphs.GraphRecord], fits: Callable):
    """Sequential greedy packing preserving record order: start a new chunk
    whenever fits(chunk, record) says the next record won't fit. fits()
    raises for records that can never fit an empty chunk."""
    chunk: list = []
    for r in records:
        if chunk and not fits(chunk, r):
            yield chunk
            chunk = []
        if not chunk:
            fits(chunk, r)  # capacity validation for a fresh chunk
        chunk.append(r)
    if chunk:
        yield chunk


def load_bundle(path: str) -> ServingModel:
    return ServingModel(path)
