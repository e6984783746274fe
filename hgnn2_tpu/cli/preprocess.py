"""Dataset preprocessing driver (reference preprocessing/loading.py
load_qm9:72 + split_data:40 + target_stats.py, run via scripts/debug.py).

  python -m hgnn2_tpu.cli.preprocess --xyz_dir /path/dsgdb9nsd --out qm9.npz
  python -m hgnn2_tpu.cli.preprocess --xyz_dir ... --out qm9.npz --shards 10
"""

import argparse
import logging

from hgnn2_tpu.data import qm9, stats


def main(argv=None):
    p = argparse.ArgumentParser(description="QM9 preprocessing")
    p.add_argument("--xyz_dir", required=True)
    p.add_argument("--out", required=True, help="output npz cache path")
    p.add_argument("--sp", dest="spatial", action="store_true")
    p.add_argument("--pc", dest="charge", action="store_true")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--shards", type=int, default=0)
    p.add_argument("--shard_dir", default=None)
    p.add_argument("--stats_out", default=None)
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO, force=True)
    log = logging.getLogger("hgnn2_tpu")

    records = qm9.load_qm9_dir(args.xyz_dir, args.spatial, args.charge, args.limit)
    log.info("parsed %d molecules", len(records))
    qm9.save_cache(records, args.out)
    log.info("wrote %s", args.out)
    if args.shards:
        paths = qm9.save_shards(records, args.shard_dir or ".", args.shards)
        log.info("wrote %d shards", len(paths))
    if args.stats_out:
        stats.compute_target_stats(records).save(args.stats_out)
        log.info("wrote stats %s", args.stats_out)


if __name__ == "__main__":
    main()
