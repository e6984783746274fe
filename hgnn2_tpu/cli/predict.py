"""Inference driver: restore a checkpoint and predict on a dataset.

  python -m hgnn2_tpu.cli.predict --ckpt runs/ck --arch gnn --L 5 --h 8 \
      --data_path cache.npz --out predictions.npz

Covers the reference's model-reload path (torch.load at
scripts/main_gnn_qm9.py:149-161 / Logger.load_model) plus batch
prediction, which the reference lacks entirely.
"""

import argparse
import json
import logging

import numpy as np

from hgnn2_tpu import runtime
from hgnn2_tpu.cli import common
from hgnn2_tpu.data import batching, stats
from hgnn2_tpu.training import checkpoint as ckpt_lib
from hgnn2_tpu.training import train as train_lib
from hgnn2_tpu.training.config import TrainConfig
from hgnn2_tpu.training.optim import build_optimizer


def main(argv=None):
    p = argparse.ArgumentParser(description="batch prediction from a checkpoint")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--arch", default="gnn", choices=["gnn", "lggnn", "ccn1d", "ccn2d"])
    p.add_argument("--L", dest="layers", type=int, default=15)
    p.add_argument("--h", dest="nfeatures", type=int, default=1)
    p.add_argument("--J", type=int, default=1)
    p.add_argument("--update", type=int, default=1)
    p.add_argument("--task", type=int, default=0)
    p.add_argument("--bs", type=int, default=256)
    p.add_argument("--optim", default="adamax",
                   help="optimizer the checkpoint was trained with (its "
                        "opt_state structure must match for restore)")
    p.add_argument("--packed", action="store_true",
                   help="checkpoint came from the edge-sharded trainer "
                        "(--edge_shards): restore the packed gnn/lggnn model")
    p.add_argument("--data_path", default=None)
    p.add_argument("--n_synthetic", type=int, default=256)
    p.add_argument("--out", default="predictions.npz")
    args = p.parse_args(argv)
    runtime.setup()
    logging.basicConfig(level=logging.INFO, force=True)
    log = logging.getLogger("hgnn2_tpu")

    import jax

    cfg = TrainConfig(batch_size=args.bs)
    cfg.model.arch = args.arch
    cfg.model.n_layers = args.layers
    cfg.model.n_features = args.nfeatures
    cfg.model.J = args.J
    cfg.model.order = args.update
    cfg.data.data_path = args.data_path
    cfg.data.n_synthetic = args.n_synthetic
    cfg.optim.optim = args.optim
    cfg.data.task = args.task
    records, kind, tstats, _source = common.load_records(cfg)
    saved = common.saved_target_stats(args.ckpt)
    if saved is not None:
        tstats = saved
        log.info("target stats from %s/%s", args.ckpt, common.TARGET_STATS_FILE)
    is_ccn = args.arch.startswith("ccn")
    task = args.task if kind == "regression" else None
    if args.packed:
        # checkpoint from the edge-sharded trainer: packed-model params
        from hgnn2_tpu import graphs

        model = common.build_packed_model(cfg, kind)
        chunks = [records[s : s + args.bs]
                  for s in range(0, len(records), args.bs)]
        ncap = max(sum(r.n_nodes for r in c) for c in chunks) + 8
        ecap = max(sum(r.n_dir_edges for r in c) for c in chunks) + 8
        loader = [graphs.make_packed_batch(
            c, node_capacity=ncap, edge_capacity=ecap,
            batch_size=args.bs, task=task) for c in chunks]
        restored = common.restore_packed_checkpoint(
            args.ckpt, model, loader[0], cfg.optim)
        if restored is None:
            raise SystemExit(f"no checkpoint found under {args.ckpt}")
        variables, epoch = restored

        @jax.jit
        def forward(batch):
            return model.apply(variables, batch, train=False)
    else:
        model = common.build_model(cfg, kind)
        if is_ccn:
            loader = batching.CCNLoader(records, args.bs, task=task)
        else:
            loader = batching.DenseLoader(
                records, args.bs, task=task,
                with_line_graph=args.arch == "lggnn",
            )

        tx = build_optimizer(cfg.optim, steps_per_epoch=1)
        sample = next(iter(loader))
        state = train_lib.TrainState.create(model, sample, tx,
                                            jax.random.key(0))
        restored = ckpt_lib.Checkpointer(args.ckpt).restore(state)
        if restored is None:
            raise SystemExit(f"no checkpoint found under {args.ckpt}")
        state, epoch = restored

        @jax.jit
        def forward(batch):
            out, _ = train_lib._forward(state, state.params, batch,
                                        train=False)
            return out

    log.info("restored checkpoint at epoch %d", epoch)

    mean = float(tstats.mean[args.task]) if tstats is not None else 0.0
    std = float(tstats.std[args.task]) if tstats is not None else 1.0

    preds, targets = [], []
    for batch in loader:
        out = np.asarray(forward(batch))
        gmask = np.asarray(train_lib._graph_mask(batch)) > 0
        if kind == "regression":
            preds.append(out[gmask, 0] * std + mean)
        else:
            preds.append(out[gmask].argmax(-1))
        targets.append(np.asarray(batch.y)[gmask])
    preds = np.concatenate(preds)
    targets = np.concatenate(targets)
    np.savez(args.out, predictions=preds, targets=targets)
    if kind == "regression":
        mae = float(np.abs(preds - targets).mean())
        log.info("MAE (raw units): %.6f over %d molecules -> %s",
                 mae, len(preds), args.out)
        print(json.dumps({"mae": mae, "n": len(preds)}))
    else:
        acc = float((preds == targets).mean())
        log.info("accuracy: %.4f over %d graphs -> %s", acc, len(preds), args.out)
        print(json.dumps({"accuracy": acc, "n": len(preds)}))


if __name__ == "__main__":
    main()
