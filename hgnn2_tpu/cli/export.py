"""Export driver: checkpoint -> frozen cross-platform serving bundle.

  python -m hgnn2_tpu.cli.export --ckpt runs/ck --arch lggnn --L 5 --h 8 \
      --n_max 32 --bs 256 --out bundle/

The bundle (hgnn2_tpu/serving.py) is a self-contained StableHLO artifact:
parameters frozen in as constants, lowered for every requested platform,
target mean/std embedded for denormalized predictions. The reference's only
deployment path is reloading a whole torch module into the training code
(/root/reference/functions/logs.py:117-123); this replaces it with an
artifact a serving process can run without the framework installed.
"""

import argparse
import logging

import numpy as np

from hgnn2_tpu import graphs, runtime, serving
from hgnn2_tpu.cli import common
from hgnn2_tpu.data import batching
from hgnn2_tpu.training import checkpoint as ckpt_lib
from hgnn2_tpu.training import train as train_lib
from hgnn2_tpu.training.config import TrainConfig
from hgnn2_tpu.training.optim import build_optimizer


def main(argv=None):
    p = argparse.ArgumentParser(description="export a checkpoint for serving")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--arch", default="gnn", choices=["gnn", "lggnn", "ccn1d", "ccn2d"])
    p.add_argument("--L", dest="layers", type=int, default=15)
    p.add_argument("--h", dest="nfeatures", type=int, default=1)
    p.add_argument("--J", type=int, default=1)
    p.add_argument("--update", type=int, default=1)
    p.add_argument("--task", type=int, default=0)
    p.add_argument("--bs", type=int, default=256, help="serving bucket: batch")
    p.add_argument("--buckets", default=None,
                   help="comma list of EXTRA batch-slot counts to export "
                        "alongside --bs (e.g. 16,2048). predict() routes "
                        "each chunk to the largest bucket the remaining "
                        "request fills — one dispatch round trip instead "
                        "of many for large requests (packed/ccn "
                        "capacities scale proportionally)")
    p.add_argument("--n_max", type=int, default=32, help="serving bucket: nodes")
    p.add_argument("--m_max", type=int, default=None,
                   help="serving bucket: directed edges (lggnn)")
    p.add_argument("--packed", action="store_true",
                   help="checkpoint came from the edge-sharded trainer "
                        "(--edge_shards): restore the packed gnn/lggnn "
                        "model and export a 'packed' bundle")
    p.add_argument("--node_cap", type=int, default=None,
                   help="packed serving bucket: node capacity")
    p.add_argument("--edge_cap", type=int, default=None,
                   help="packed serving bucket: directed-edge capacity")
    p.add_argument("--platforms", default="tpu,cpu")
    p.add_argument("--data_path", default=None)
    p.add_argument("--n_synthetic", type=int, default=64)
    p.add_argument("--optim", default="adamax",
                   help="optimizer the checkpoint was trained with (its "
                        "opt_state structure must match for restore)")
    p.add_argument("--stats", default=None,
                   help="target_stats.npz to bake into the bundle "
                        "(default: <ckpt>/target_stats.npz)")
    p.add_argument("--out", required=True)
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
    cfg.optim.optim = args.optim
    cfg.data.data_path = args.data_path
    cfg.data.n_synthetic = args.n_synthetic
    cfg.data.task = args.task
    records, kind, tstats, source = common.load_records(cfg)
    # the mean/std frozen into the bundle denormalize every served
    # prediction forever — prefer the stats persisted at train time, and
    # refuse to freeze stats recomputed from the synthetic fallback
    if kind == "regression":
        if args.stats:
            from hgnn2_tpu.data import stats as stats_lib

            tstats = stats_lib.TargetStats.load(args.stats)
            log.info("target stats from --stats %s", args.stats)
        else:
            saved = common.saved_target_stats(args.ckpt)
            if saved is not None:
                tstats = saved
                log.info("target stats from %s/%s", args.ckpt,
                         common.TARGET_STATS_FILE)
            elif source == "synthetic_qm9_like":
                raise SystemExit(
                    "refusing to export: no persisted target stats under "
                    f"{args.ckpt} and no --data_path — baking stats computed "
                    "from the synthetic fallback would denormalize every "
                    "served prediction incorrectly. Pass --stats or "
                    "--data_path."
                )
    is_ccn = args.arch.startswith("ccn")
    task = args.task if kind == "regression" else None
    extra_bs = ([int(s) for s in args.buckets.split(",") if s.strip()]
                if args.buckets else [])
    if args.packed:
        # edge-sharded training checkpoints hold packed-model params
        model = common.build_packed_model(cfg, kind)

        def packed_sample(b):
            # explicit caps scale proportionally with the bucket
            nc = (max(8, args.node_cap * b // args.bs) if args.node_cap
                  else sum(r.n_nodes for r in records[:b]) + 8)
            ec = (max(8, args.edge_cap * b // args.bs) if args.edge_cap
                  else sum(r.n_dir_edges for r in records[:b]) + 8)
            return graphs.make_packed_batch(
                records[:b], node_capacity=nc, edge_capacity=ec,
                batch_size=b, task=task,
            )

        samples = [packed_sample(b) for b in [args.bs] + extra_bs]
        sample = samples[0]
        restored = common.restore_packed_checkpoint(
            args.ckpt, model, sample, cfg.optim)
        if restored is None:
            raise SystemExit(f"no checkpoint found under {args.ckpt}")
        variables, epoch = restored
    else:
        model = common.build_model(cfg, kind)
        if is_ccn:
            if extra_bs:
                # multi-bucket export: all buckets must share K, so build
                # every sample at the dataset-wide receptive field
                from hgnn2_tpu.nn import ccn as ccn_mod

                k_all = max(r.max_degree() for r in records) + 1
                samples = [
                    ccn_mod.make_ccn_batch(
                        records[:b], k_max=k_all,
                        vertex_capacity=sum(
                            r.n_nodes for r in records[:b]) + 8,
                        task=task, batch_size=b)
                    for b in [args.bs] + extra_bs
                ]
            else:
                samples = [next(iter(
                    batching.CCNLoader(records, args.bs, task=task)))]
        else:
            with_lg = args.arch == "lggnn"
            m_max = args.m_max
            if with_lg and m_max is None:
                m_max = max(r.n_dir_edges for r in records)
            samples = [
                graphs.make_dense_batch(
                    records[:b], n_max=args.n_max, m_max=m_max,
                    batch_size=b, with_line_graph=with_lg, task=task)
                for b in [args.bs] + extra_bs
            ]
        sample = samples[0]

        tx = build_optimizer(cfg.optim, steps_per_epoch=1)
        state = train_lib.TrainState.create(model, sample, tx,
                                            jax.random.key(0))
        restored = ckpt_lib.Checkpointer(args.ckpt).restore(state)
        if restored is None:
            raise SystemExit(f"no checkpoint found under {args.ckpt}")
        state, epoch = restored
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
    log.info("restored checkpoint at epoch %d", epoch)
    platforms = tuple(s.strip() for s in args.platforms.split(",") if s.strip())
    exported = [serving.export_model(model, variables, s,
                                     platforms=platforms) for s in samples]
    if len(exported) == 1:
        exported = exported[0]

    mean = float(tstats.mean[args.task]) if tstats is not None else 0.0
    std = float(tstats.std[args.task]) if tstats is not None else 1.0
    extra = {"arch": args.arch, "epoch": int(epoch)}
    if is_ccn:
        # predict() must rebuild chi tables exactly as the exported
        # program's batches were built (CCNLoader default: A + I)
        extra["add_self_loops"] = True
    kind_out = "ccn" if is_ccn else ("packed" if args.packed else "dense")
    serving.save_bundle(
        args.out, exported, kind=kind_out,
        task=task, mean=mean, std=std, extra=extra,
    )
    spec = serving.load_bundle(args.out).input_spec
    log.info("exported %s -> %s (platforms %s, bucket %s)",
             args.arch, args.out, ",".join(platforms),
             {k: v[0] for k, v in spec.items() if k in ("x", "lg_src")})
    # smoke: the saved artifact must load and run on this host's platform
    check = serving.load_bundle(args.out).call(serving.batch_to_arrays(sample))
    assert np.isfinite(np.asarray(check)).all()
    print(args.out)


if __name__ == "__main__":
    main()
