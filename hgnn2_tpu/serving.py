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


def _exported_input_spec(exported: jax_export.Exported) -> dict[str, Any]:
    spec_tree = jax.tree.unflatten(exported.in_tree, list(exported.in_avals))
    return {
        k: [list(v.shape), np.dtype(v.dtype).name]
        for k, v in spec_tree[0][0].items()
    }


def save_bundle(
    path: str,
    exported: jax_export.Exported | Sequence[jax_export.Exported],
    *,
    kind: str,
    task: int | None = None,
    mean: float = 0.0,
    std: float = 1.0,
    extra: Mapping[str, Any] | None = None,
) -> None:
    """Write a serving bundle directory. kind: 'dense' | 'packed' | 'ccn'.

    ``exported`` may be a sequence of Exported programs of the SAME model
    at different serving buckets (batch sizes / capacities). predict()
    then routes each chunk to the largest bucket the remaining request
    fills — on remote-attached chips every dispatch+fetch costs a full
    round trip (~25 ms here), so serving a 2048-record request through
    one 2048-slot program instead of eight 256-slot programs removes
    7 RTTs. Single-Exported bundles are unchanged on disk.

    For CCN bundles whose example batch was built with
    add_self_loops=False, pass extra={"add_self_loops": False} so
    predict() rebuilds chi tables the same way (default True)."""
    exps = (list(exported) if isinstance(exported, (list, tuple))
            else [exported])
    specs = [_exported_input_spec(e) for e in exps]
    base = specs[0]
    for s in specs[1:]:
        if set(s) != set(base):
            raise ValueError(
                "multi-bucket export: all programs must share one input "
                f"signature; got {sorted(base)} vs {sorted(s)}")
        # only the leading (batch/capacity) dim may differ between
        # buckets: feature widths, n_max, K must agree so the routing
        # below never has to re-validate records per bucket
        for k in base:
            if s[k][0][1:] != base[k][0][1:] or s[k][1] != base[k][1]:
                raise ValueError(
                    f"multi-bucket export: input {k!r} differs beyond its "
                    f"leading capacity dim: {base[k]} vs {s[k]}")
    os.makedirs(path, exist_ok=True)
    artifacts = []
    for i, e in enumerate(exps):
        fname = _ARTIFACT if i == 0 else f"model_{i}.jaxexport"
        with open(os.path.join(path, fname), "wb") as f:
            f.write(e.serialize())
        artifacts.append({"file": fname, "input_spec": specs[i]})
    meta = {
        "kind": kind,
        "platforms": list(exps[0].platforms),
        "task": task,
        "mean": float(mean),
        "std": float(std),
        "input_spec": base,
        **dict(extra or {}),
    }
    if len(artifacts) > 1:
        meta["extra_artifacts"] = artifacts[1:]
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
        # every bucket program, largest slot count first (multi-bucket
        # bundles; single-artifact bundles get the one entry)
        self._programs = [(self.meta["input_spec"], self._jitted)]
        for art in self.meta.get("extra_artifacts", ()):
            with open(os.path.join(path, art["file"]), "rb") as f:
                exp = jax_export.deserialize(bytearray(f.read()))
            self._programs.append((art["input_spec"], jax.jit(exp.call)))
        self._programs.sort(key=lambda p: -self._slots(p[0]))

    @staticmethod
    def _slots(spec: Mapping[str, Any]) -> int:
        """Graph slots of a bucket: the batch dim (gmask for packed/ccn
        layouts, x's leading dim for dense)."""
        if "gmask" in spec:
            return int(spec["gmask"][0][0])
        return int(spec["x"][0][0])

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
        # multi-bucket bundles: route to the program whose bucket the
        # arrays are shaped for (fall back to the primary program)
        if len(self._programs) > 1 and "x" in arrays:
            xs = list(np.shape(arrays["x"]))
            for spec, jitted in self._programs:
                if spec["x"][0] == xs:
                    return jitted(arrays)
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
        lo = 0
        while lo < len(records):
            # ONE padded call of the smallest bucket that holds the
            # remaining request beats several smaller calls — on remote-
            # attached chips each call costs a full dispatch+fetch round
            # trip, which dwarfs the padding compute. Only when the
            # request overflows every bucket does the largest one fill
            # and loop. (n_max/m_max are save-time-identical across
            # buckets, so records validate once above.)
            remaining = len(records) - lo
            covering = [p for p in self._programs
                        if self._slots(p[0]) >= remaining]
            spec, jitted = covering[-1] if covering else self._programs[0]
            b = self._slots(spec)
            chunk = records[lo : lo + b]
            batch = graphs.make_dense_batch(
                chunk,
                n_max=n_max,
                m_max=m_max,
                batch_size=b,
                with_line_graph=with_lg,
                task=task,
            )
            arrays = {k: v for k, v in batch_to_arrays(batch).items()
                      if k in spec}
            pred = np.asarray(jitted(arrays))[:, 0]
            out[lo : lo + len(chunk)] = pred[: len(chunk)] * std + mean
            lo += len(chunk)
        return out

    # -- ccn-bundle record serving --------------------------------------
    def _predict_ccn(self, records: Sequence[graphs.GraphRecord]) -> np.ndarray:
        """Pack records into the exported CCN bucket (vertex capacity V,
        receptive-field K, graph slots B) chunk by chunk."""
        from hgnn2_tpu.nn import ccn as ccn_mod

        big = self._programs[0][0]
        v_cap = int(big["x"][0][0])
        k_max = int(big["nbr"][0][1])
        bsz = int(big["gmask"][0][0])
        add_loops = bool(self.meta.get("add_self_loops", True))
        bump = 1 if add_loops else 0
        task = self.meta.get("task")
        mean, std = self.meta["mean"], self.meta["std"]

        for i, r in enumerate(records):
            if r.max_degree() + bump > k_max:
                raise ValueError(
                    f"record {i} degree {r.max_degree()}+{bump} exceeds "
                    f"the bundle's K={k_max} — re-export with a larger "
                    "k_max"
                )
            if r.n_nodes > v_cap:
                raise ValueError(
                    f"record {i} with {r.n_nodes} vertices exceeds the "
                    f"bundle's vertex capacity {v_cap}"
                )
        if not len(records):
            return np.empty(0, np.float32)
        sizes = np.array([[r.n_nodes] for r in records])
        out = np.empty(len(records), np.float32)
        for lo, hi in _greedy_spans(sizes, (v_cap,), bsz):
            chunk = records[lo:hi]
            nodes = int(sizes[lo:hi].sum())
            spec, jitted = min(
                (p for p in self._programs
                 if int(p[0]["gmask"][0][0]) >= hi - lo
                 and int(p[0]["x"][0][0]) >= nodes),
                key=lambda p: self._slots(p[0]))
            batch = ccn_mod.make_ccn_batch(
                chunk, k_max=k_max,
                vertex_capacity=int(spec["x"][0][0]),
                add_self_loops=add_loops, task=task,
                batch_size=int(spec["gmask"][0][0]),
            )
            arrays = {k: v for k, v in batch_to_arrays(batch).items()
                      if k in spec}
            pred = np.asarray(jitted(arrays))[:, 0]
            out[lo:hi] = pred[: hi - lo] * std + mean
        return out

    # -- packed-bundle record serving -----------------------------------
    def _predict_packed(self, records: Sequence[graphs.GraphRecord]) -> np.ndarray:
        """Pack records into the exported packed bucket (node capacity V,
        edge capacity C, graph slots B) chunk by chunk."""
        # pack against the LARGEST bucket; each finished chunk is then
        # routed to the smallest bucket that holds it (the tail of a big
        # request runs the small program, not the padded big one)
        big = self._programs[0][0]
        v_cap = int(big["x"][0][0])
        e_cap = int(big["src"][0][0])
        bsz = int(big["gmask"][0][0])
        task = self.meta.get("task")
        mean, std = self.meta["mean"], self.meta["std"]

        if not len(records):
            return np.empty(0, np.float32)
        sizes = np.array([[r.n_nodes, r.n_dir_edges] for r in records])
        too_big = (sizes[:, 0] > v_cap) | (sizes[:, 1] > e_cap)
        if too_big.any():
            i = int(np.argmax(too_big))
            raise ValueError(
                f"record {i} ({sizes[i, 0]} nodes, {sizes[i, 1]} directed "
                f"edges) exceeds the bundle's packed capacities "
                f"(V={v_cap}, C={e_cap}) — re-export with larger ones"
            )
        out = np.empty(len(records), np.float32)
        for lo, hi in _greedy_spans(sizes, (v_cap, e_cap), bsz):
            chunk = records[lo:hi]
            nodes, edges = sizes[lo:hi].sum(axis=0)
            spec, jitted = min(
                (p for p in self._programs
                 if int(p[0]["gmask"][0][0]) >= hi - lo
                 and int(p[0]["x"][0][0]) >= nodes
                 and int(p[0]["src"][0][0]) >= edges),
                key=lambda p: self._slots(p[0]))
            batch = graphs.make_packed_batch(
                chunk, node_capacity=int(spec["x"][0][0]),
                edge_capacity=int(spec["src"][0][0]),
                task=task, batch_size=int(spec["gmask"][0][0]),
            )
            arrays = {k: v for k, v in batch_to_arrays(batch).items()
                      if k in spec}
            pred = np.asarray(jitted(arrays))[:, 0]
            out[lo:hi] = pred[: hi - lo] * std + mean
        return out


def _greedy_spans(sizes: np.ndarray, caps: Sequence[int], bsz: int):
    """Sequential greedy packing preserving record order, O(n) via running
    totals (the round-4 chunk-resumming version was O(n^2) in chunk
    length — ~1 s of host time packing a 2048-record request). sizes:
    (n, k) per-record resource vectors; caps: (k,) capacities; bsz: max
    records per chunk. Yields (lo, hi) spans. Callers validate that every
    single record fits an empty chunk beforehand."""
    caps = np.asarray(caps)
    lo = 0
    run = np.zeros_like(caps)
    for i in range(len(sizes)):
        if i > lo and (i - lo >= bsz or ((run + sizes[i]) > caps).any()):
            yield lo, i
            lo = i
            run = np.zeros_like(caps)
        run = run + sizes[i]
    if len(sizes) > lo:
        yield lo, len(sizes)


def load_bundle(path: str) -> ServingModel:
    return ServingModel(path)
