"""Shared experiment runner behind the CLI drivers.

The reference spreads ~2,100 LoC over eight main_*.py drivers
(scripts/main_gnn_qm9.py:88, main_ccn_qm9.py:79, main_generate.py:80, ...);
here one runner consumes a TrainConfig and the drivers are thin flag
parsers. Dataset resolution order for QM9: explicit npz cache ->
.xyz directory -> synthetic QM9-shaped fallback (no dataset shipped).
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import os
import time

import numpy as np

from hgnn2_tpu import runtime
from hgnn2_tpu.data import batching, qm9, stats, synthetic
from hgnn2_tpu.nn import ccn as ccn_mod
from hgnn2_tpu.nn import models
from hgnn2_tpu.nn.layers import CompatConfig
from hgnn2_tpu.training import checkpoint as ckpt_lib
from hgnn2_tpu.training import metrics as metrics_lib
from hgnn2_tpu.training import train as train_lib
from hgnn2_tpu.training.config import TrainConfig

log = logging.getLogger("hgnn2_tpu")


def load_records(cfg: TrainConfig):
    """Returns (records, kind, target_stats, source). source is the data
    path, or "synthetic" / "synthetic_qm9_like" for generated fallbacks —
    callers that freeze target stats into artifacts (cli/export.py) must
    refuse the QM9-shaped fallback's stats."""
    d = cfg.data
    if d.dataset == "synthetic":
        recs = synthetic.three_collinear_points(
            d.n_synthetic, d.n_max, d.dim, d.p, d.c, seed=cfg.seed
        )
        return recs, "classification", None, "synthetic"
    if d.dataset == "qm9_synthetic":
        # explicit request for the QM9-shaped generator (benchmarking /
        # smoke runs) — same records as the qm9 fallback, minus the warning
        recs = qm9.synthetic_qm9_like(d.n_synthetic, seed=cfg.seed)
        if d.oracle_features:
            # control experiment: per-node features whose node sums are
            # exactly the generator's target mix inputs (scripts/
            # regression_floor.py structural_features) — the pipeline
            # should train to the least-squares floor on these
            from hgnn2_tpu.graphs import GraphRecord

            recs = [
                GraphRecord(
                    x=np.concatenate([
                        r.x,
                        np.ones((r.n_nodes, 1), np.float32),
                        (r.adj.sum(1, keepdims=True) / 2.0).astype(
                            np.float32),
                        ((r.adj == 2.0).sum(1, keepdims=True) / 2.0
                         ).astype(np.float32),
                    ], axis=1),
                    adj=r.adj, y=r.y,
                )
                for r in recs
            ]
            log.info("oracle features appended (control run)")
        log.info("generated %d synthetic QM9-shaped molecules", len(recs))
        return recs, "regression", stats.compute_target_stats(recs), "synthetic_qm9_like"
    if d.data_path and os.path.isfile(d.data_path):
        recs = qm9.load_cache(d.data_path)
        src = d.data_path
    elif d.data_path and os.path.isdir(d.data_path):
        recs = qm9.load_qm9_dir(d.data_path, d.spatial, d.charge)
        src = d.data_path
    else:
        log.warning(
            "no QM9 data path given/found — using %d synthetic QM9-shaped molecules",
            d.n_synthetic,
        )
        recs = qm9.synthetic_qm9_like(d.n_synthetic, seed=cfg.seed)
        src = "synthetic_qm9_like"
    log.info("loaded %d molecules from %s", len(recs), src)
    return recs, "regression", stats.compute_target_stats(recs), src


TARGET_STATS_FILE = "target_stats.npz"


def saved_target_stats(ckpt_path: str | None):
    """Target stats persisted next to a checkpoint at train time, if any.
    Inference/export drivers prefer these over recomputing from whatever
    dataset happens to be loadable at export time."""
    if not ckpt_path:
        return None
    path = os.path.join(ckpt_path, TARGET_STATS_FILE)
    if os.path.exists(path):
        return stats.TargetStats.load(path)
    return None


def build_packed_model(cfg: TrainConfig, kind: str, bn_axis: str | None = None):
    """Packed twin of build_model for gnn/lggnn (the --edge_shards trainer
    and packed export/predict paths). bn_axis='edge' inside a shard_map;
    None for single-device inference over the same parameters."""
    from hgnn2_tpu.nn import packed as packed_mod

    m = cfg.model
    dim_output = 2 if kind == "classification" else m.dim_output
    compat = CompatConfig.reference() if m.compat_reference else CompatConfig()
    if m.arch == "lggnn":
        return packed_mod.PackedLGGNN(
            n_features=m.n_features, n_layers=m.n_layers,
            dim_output=dim_output, J=m.J, order=m.order, compat=compat,
            bn_axis=bn_axis)
    if m.arch == "gnn":
        return packed_mod.PackedGNN(
            n_features=m.n_features, n_layers=m.n_layers,
            dim_output=dim_output, J=m.J, compat=compat, bn_axis=bn_axis)
    raise ValueError(f"no packed variant for arch {m.arch!r}")


def restore_packed_checkpoint(ckpt_path: str, model, sample, optim_cfg):
    """Restore a packed-model training checkpoint for inference/export.

    Accepts BOTH packed checkpoint layouts: the edge-sharded trainer's
    params/batch_stats/opt_state payload (training/sharded.py) and the
    single-device --packed trainer's TrainState payload (training/train.py
    fit + Checkpointer.save, which adds step/epoch). Returns
    (variables, epoch)."""
    import jax
    import jax.numpy as jnp

    from hgnn2_tpu.training import checkpoint as ckpt_lib
    from hgnn2_tpu.training.optim import build_optimizer

    variables = model.init(jax.random.key(0), sample, train=True)
    params = variables["params"]
    template = {
        "params": params,
        "batch_stats": variables.get("batch_stats", {}),
        "opt_state": build_optimizer(optim_cfg, 1).init(params),
    }
    ckpt = ckpt_lib.Checkpointer(ckpt_path)
    try:
        restored = ckpt.restore_tree(template)
    except Exception as sharded_err:
        # fit-based --packed checkpoint: TrainState payload shape. If this
        # ALSO fails, surface the original error (a genuinely corrupt
        # checkpoint should not be reported as a layout mismatch).
        template_fit = dict(template)
        template_fit["step"] = jnp.zeros((), jnp.int32)
        template_fit["epoch"] = 0
        try:
            restored = ckpt.restore_tree(template_fit)
        except Exception:
            raise sharded_err
    if restored is None:
        return None
    payload, epoch = restored
    out = {"params": payload["params"]}
    if payload["batch_stats"]:
        out["batch_stats"] = payload["batch_stats"]
    return out, epoch


def build_model(cfg: TrainConfig, kind: str):
    m = cfg.model
    dim_output = 2 if kind == "classification" else m.dim_output
    compat = CompatConfig.reference() if m.compat_reference else CompatConfig()
    if m.arch == "gnn":
        return models.GNNSimple(
            n_features=m.n_features, n_layers=m.n_layers, dim_output=dim_output,
            J=m.J, compat=compat, gru=m.gru,
        )
    if m.arch == "lggnn":
        return models.GNNLineGraph(
            n_features=m.n_features, n_layers=m.n_layers, dim_output=dim_output,
            J=m.J, order=m.order, compat=compat,
        )
    if m.arch == "ccn1d":
        return ccn_mod.CCN1D(
            hidden=m.n_features, n_layers=m.n_layers, dim_output=dim_output,
            pallas_kernel=bool(m.ccn_kernel),
        )
    if m.arch == "ccn2d":
        return ccn_mod.CCN2D(
            hidden=m.n_features, n_layers=m.n_layers, dim_output=dim_output,
            compat_contractions=m.compat_contractions,
            vertex_chunks=m.vertex_chunks,
            pallas_kernel=bool(m.ccn_kernel),
        )
    raise ValueError(f"unknown arch {m.arch!r}")


def run_experiment(cfg: TrainConfig):
    runtime.setup()
    logging.basicConfig(level=logging.INFO, force=True)
    logging.getLogger("hgnn2_tpu").setLevel(logging.INFO)
    records, kind, tstats, _source = load_records(cfg)
    train_recs, valid_recs, test_recs = synthetic.split_80_10_10(
        records, shuffle=cfg.data.shuffle_split, seed=cfg.seed
    )
    log.info(
        "train/valid/test sizes: %d/%d/%d", len(train_recs), len(valid_recs), len(test_recs)
    )
    is_ccn = cfg.model.arch.startswith("ccn")
    task = cfg.data.task if kind == "regression" else None

    mean = std = 0.0
    accuracy = None
    if kind == "regression":
        mean = float(tstats.mean[cfg.data.task])
        std = float(tstats.std[cfg.data.task])
        accuracy = float(tstats.accuracy[cfg.data.task])

    log_path = cfg.log_path or os.path.join(
        "runs",
        f"{cfg.model.arch}_{cfg.data.dataset}_L{cfg.model.n_layers}"
        f"_h{cfg.model.n_features}_bs{cfg.batch_size}_{int(time.time())}",
    )
    logger = metrics_lib.ExperimentLogger(log_path)
    logger.write_settings(cfg)
    if tstats is not None:
        # persist the training-time normalization so export/predict never
        # have to recompute (possibly wrong) stats from a different dataset
        tstats.save(os.path.join(logger.log_dir, TARGET_STATS_FILE))
        if cfg.checkpoint_path:
            os.makedirs(cfg.checkpoint_path, exist_ok=True)
            tstats.save(os.path.join(cfg.checkpoint_path, TARGET_STATS_FILE))

    # --- molecule-aligned edge-sharded path (packed models), optionally
    # composed with batch-level data parallelism on one (data, edge) mesh
    n_es = cfg.edge_shards
    if n_es == 0:
        import jax

        n_es = len(jax.devices())
    if n_es > 1:
        from hgnn2_tpu.training import sharded as sharded_lib

        n_dp = cfg.dp
        if n_dp == 0:  # --dp 0 = fill the remaining devices
            import jax

            n_dp = max(len(jax.devices()) // n_es, 1)
        n_dp = max(n_dp, 1)
        bn_axes = ("data", "edge") if n_dp > 1 else "edge"
        if is_ccn:
            # CCN's parallel axis is the flattened vertex set: molecules
            # packed whole per shard, no per-layer collective
            pmodel = build_model(cfg, kind)
            family = "ccn"
        else:
            pmodel = build_packed_model(cfg, kind, bn_axis=bn_axes)
            family = "packed"
        cfg2 = dataclasses.replace(cfg, edge_shards=n_es, dp=n_dp)
        variables, history = sharded_lib.fit_sharded(
            pmodel, cfg2,
            {"train": train_recs, "valid": valid_recs, "test": test_recs},
            kind=kind, mean=mean, std=std, accuracy=accuracy, logger=logger,
            family=family,
        )
        if history:
            logger.log_final(**history[-1])
            log.info("final: %s",
                     {k: round(v, 4) for k, v in history[-1].items()})
        return variables, history

    use_packed = cfg.model.packed and cfg.model.arch in ("gnn", "lggnn")
    if cfg.model.arch in ("ccn1d", "ccn2d") and cfg.model.ccn_kernel is None:
        # auto: the fused Pallas kernels (15.4x the XLA CCN-2D step at
        # the flagship QM9 shape) unroll over K (<= 8) and need every
        # graph inside their +-128-row halo window
        import jax

        k_max = max((r.max_degree() + 1 for r in train_recs), default=99)
        n_max = max((r.n_nodes for r in train_recs), default=0)
        on_tpu = jax.default_backend() not in ("cpu",)
        cfg.model.ccn_kernel = bool(on_tpu and k_max <= 8 and n_max <= 129)
        if cfg.model.ccn_kernel:
            log.info("%s: fused Pallas kernel enabled (K=%d, max "
                     "graph %d nodes); --no_ccn_kernel for the XLA path",
                     cfg.model.arch, k_max, n_max)
    model = (build_packed_model(cfg, kind, bn_axis=None) if use_packed
             else build_model(cfg, kind))

    mesh = None
    n_dp = cfg.dp
    if n_dp == 0:
        import jax

        n_dp = len(jax.devices())
    if n_dp > 1:
        if is_ccn:
            raise ValueError(
                "--dp shards dense gnn/lggnn batches; scale CCN with "
                "--edge_shards (vertex sharding, parallel/ccn_parallel.py)"
            )
        if use_packed:
            raise ValueError(
                "--packed batches have flat node/edge leading axes that "
                "--dp cannot shard batch-wise; scale packed models with "
                "--edge_shards (molecule-aligned sharding)"
            )
        if cfg.batch_size % n_dp:
            raise ValueError(
                f"batch size {cfg.batch_size} not divisible by dp={n_dp}"
            )
        from hgnn2_tpu.parallel import spmd

        mesh = spmd.make_mesh(n_dp, edge_axis=1)
        log.info("data parallelism over %d devices", n_dp)

    splits = {"train": train_recs, "valid": valid_recs, "test": test_recs}

    def make_loader(split):
        recs = splits[split]
        if not recs:
            return None
        shuffle = split == "train"
        # cached batches keep fixed composition (SGD stochasticity from
        # order-level shuffling) unless redeal_every asks for periodic
        # re-deals — then the inner loader shuffles so each rebuild deals
        # molecules into fresh batches
        redeal = cfg.data.redeal_every if split == "train" else 0
        inner_shuffle = shuffle and (not cfg.data.cache_batches or redeal > 0)
        if is_ccn:
            loader = batching.CCNLoader(
                recs, cfg.batch_size, task=task, shuffle=inner_shuffle,
            )
        elif use_packed:
            loader = batching.PackedLoader(
                recs, cfg.batch_size, task=task, shuffle=inner_shuffle,
            )
        else:
            loader = batching.DenseLoader(
                recs,
                cfg.batch_size,
                task=task,
                with_line_graph=cfg.model.arch == "lggnn",
                shuffle=inner_shuffle,
            )
        if mesh is not None:
            from hgnn2_tpu.parallel import spmd

            loader = spmd.ShardedLoader(loader, mesh)
        if cfg.data.cache_batches:
            loader = batching.CachedLoader(
                loader, shuffle=shuffle and cfg.data.shuffle_batches,
                seed=cfg.seed, redeal_every=redeal,
            )
        return loader

    checkpointer = (
        ckpt_lib.Checkpointer(cfg.checkpoint_path) if cfg.checkpoint_path else None
    )
    state, history = train_lib.fit(
        model,
        make_loader,
        cfg,
        kind=kind,
        mean=mean,
        std=std,
        accuracy=accuracy,
        logger=logger,
        checkpointer=checkpointer,
        mesh=mesh,
    )
    if history:
        final = history[-1]
        logger.log_final(**final)
        log.info("final: %s", {k: round(v, 4) for k, v in final.items()})
    return state, history


def base_parser(description: str) -> argparse.ArgumentParser:
    """Flags mirroring the reference drivers (scripts/main_gnn_qm9.py:36-83)."""
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--data_path", default=None)
    p.add_argument("--log_path", default=None)
    p.add_argument("--ckpt", dest="checkpoint_path", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--bs", dest="batch_size", type=int, default=30)
    p.add_argument("--epochs", dest="max_epoch", type=int, default=40)
    p.add_argument("--step", dest="epoch_step", type=int, default=5)
    p.add_argument("--optim", default="adamax")
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--lrdamping", type=float, default=0.9)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--L", dest="layers", type=int, default=15)
    p.add_argument("--h", dest="nfeatures", type=int, default=1)
    p.add_argument("--J", type=int, default=1)
    p.add_argument("--task", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--shuffle", action="store_true")
    p.add_argument("--compat_reference", action="store_true")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel devices (0 = all local devices). "
                        "Composes with --edge_shards into one "
                        "(data, edge) mesh: --dp M --edge_shards N uses "
                        "M*N devices")
    p.add_argument("--edge_shards", type=int, default=1,
                   help="molecule-aligned edge sharding over N devices "
                        "(0 = all; packed models, zero comm per apply)")
    p.add_argument("--no_cache", action="store_true",
                   help="disable device-resident batch caching (re-pad "
                        "every epoch like the reference). Cached batches "
                        "keep fixed COMPOSITION (order-only shuffle) — "
                        "see --redeal_every for reference SGD semantics")
    p.add_argument("--redeal_every", type=int, default=0,
                   help="with caching: re-deal molecules into fresh "
                        "batches every K epochs (0 = never); restores the "
                        "reference's per-epoch batch recomposition at the "
                        "cost of a host rebuild per re-deal")
    p.add_argument("--no_scan", action="store_true",
                   help="dispatch each optimizer step separately instead "
                        "of scanning whole epochs in one program")
    p.add_argument("--ccn_kernel", action="store_true", default=None,
                   dest="ccn_kernel",
                   help="ccn2d: force the fused promotion+18-contraction "
                        "Pallas kernel (default: auto on TPU when K<=8 "
                        "and graphs <=129 nodes)")
    p.add_argument("--no_ccn_kernel", action="store_false",
                   dest="ccn_kernel", help="ccn2d: force the XLA path")
    p.add_argument("--bn_recalib", action="store_true",
                   help="after training, re-estimate BN running stats as "
                        "the average over all train batches (the "
                        "reference EMA weights the last batch 90%%) and "
                        "re-run the final eval; makes eval independent "
                        "of last-batch order")
    p.add_argument("--gru", action="store_true",
                   help="gnn: gated node-state update in every layer "
                        "(reference --gru, models/layers/layers_mnb.py:38)")
    p.add_argument("--packed", action="store_true",
                   help="gnn/lggnn: train the packed segment-sum model "
                        "(flat node/edge arrays; the bandwidth-right "
                        "layout at small h). Single mesh only — use "
                        "--edge_shards to scale packed models out")
    return p


def config_from_args(args, arch: str, dataset: str) -> TrainConfig:
    cfg = TrainConfig()
    cfg.batch_size = args.batch_size
    cfg.epochs = args.max_epoch
    cfg.seed = args.seed
    cfg.log_path = args.log_path
    cfg.checkpoint_path = args.checkpoint_path
    cfg.resume = args.resume
    cfg.optim.optim = args.optim
    cfg.optim.lr = args.lr
    cfg.optim.lr_damping = args.lrdamping
    cfg.optim.epoch_step = args.epoch_step
    cfg.optim.momentum = args.momentum
    cfg.model.arch = arch
    cfg.model.n_features = args.nfeatures
    cfg.model.n_layers = args.layers
    cfg.model.J = args.J
    cfg.model.compat_reference = args.compat_reference
    cfg.model.gru = getattr(args, "gru", False)
    cfg.model.ccn_kernel = getattr(args, "ccn_kernel", None)
    cfg.model.packed = getattr(args, "packed", False)
    cfg.data.dataset = dataset
    cfg.data.data_path = args.data_path
    cfg.data.task = args.task
    cfg.data.shuffle_split = args.shuffle
    cfg.dp = getattr(args, "dp", 1)
    cfg.edge_shards = getattr(args, "edge_shards", 1)
    cfg.data.cache_batches = not getattr(args, "no_cache", False)
    cfg.data.redeal_every = getattr(args, "redeal_every", 0)
    cfg.scan_epochs = not getattr(args, "no_scan", False)
    cfg.bn_recalibrate = getattr(args, "bn_recalib", False)
    return cfg
