"""CCN-1D / CCN-2D on QM9 (reference scripts/main_ccn_qm9.py:79).

  python -m hgnn2_tpu.cli.main_ccn_qm9 --k 2 --L 2 --h 2 --bs 64
"""

from hgnn2_tpu.cli import common


def main(argv=None):
    p = common.base_parser("CCN on QM9")
    p.add_argument("--k", type=int, default=1, help="CCN order (1 or 2)")
    p.add_argument("--compat_contractions", action="store_true")
    p.add_argument("--chunks", type=int, default=1, help="ccn2d vertex chunks")
    p.add_argument("--n_synthetic", type=int, default=1000)
    args = p.parse_args(argv)
    cfg = common.config_from_args(args, f"ccn{args.k}d", "qm9")
    cfg.model.compat_contractions = args.compat_contractions
    cfg.model.vertex_chunks = args.chunks
    cfg.data.n_synthetic = args.n_synthetic
    return common.run_experiment(cfg)


if __name__ == "__main__":
    main()
