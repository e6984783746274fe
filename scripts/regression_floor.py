#!/usr/bin/env python
"""Quality floor for the synthetic QM9-shaped regression benchmark.

The synthetic targets are a fixed linear mix of five exact structural
features plus N(0, 0.01) noise (data/qm9.py synthetic_qm9_like:
y = mix @ [n_atoms, n_bonds, n_double_bonds, count(x[:,1]), count(x[:,0])]
+ 0.01 eps). A least-squares fit on those exact features therefore
recovers the mix up to the noise, giving the ACHIEVABLE error-ratio floor
for any model: errors below it would require predicting the noise.

Writes runs/validation_reg_floor/floor.json with, per split, the oracle's
raw MAE, normalized MAE, and error ratio (MAE/std/chemical-accuracy — the
same metric the validation runs report). RESULTS.md's quality table cites
this artifact as the "floor" column.

  python scripts/regression_floor.py [--n 2000] [--task 0]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hgnn2_tpu.data import qm9, stats, synthetic  # noqa: E402


def structural_features(r):
    """The EXACT generator features (data/qm9.py synthetic_qm9_like)."""
    adj, x = r.adj, r.x
    return [
        x.shape[0],                 # n_atoms
        adj.sum() / 2.0,            # total bond order
        (adj == 2.0).sum() / 2.0,   # double bonds
        x[:, 1].sum(),              # atom-type count (one-hot col 1)
        x[:, 0].sum(),              # atom-type count (one-hot col 0)
    ]


def order_blind_features(r):
    """Best features derivable WITHOUT bond orders — the visibility class
    of the CCN models, whose chi tables use the unweighted adjacency
    (reference semantics: neighborhoods from A, utils_ccn.py:158-164).
    Two of the five generator features (total bond order, double-bond
    count) are invisible here, so this oracle is the CCN floor."""
    adj, x = r.adj, r.x
    return [x.shape[0], (adj > 0).sum() / 2.0] + [
        x[:, c].sum() for c in range(x.shape[1])
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--task", type=int, default=0)
    ap.add_argument("--out", default="runs/validation_reg_floor")
    args = ap.parse_args()

    recs = qm9.synthetic_qm9_like(args.n, seed=args.seed)
    ts = stats.compute_target_stats(recs)
    tr, va, te = synthetic.split_80_10_10(recs)
    std = float(ts.std[args.task])
    acc = float(ts.accuracy[args.task])

    def fit_eval(featfn):
        def design(split):
            F = np.array([featfn(r) for r in split])
            return np.concatenate([F, np.ones((len(F), 1))], axis=1)

        y_tr = np.array([r.y[args.task] for r in tr])
        coef, *_ = np.linalg.lstsq(design(tr), y_tr, rcond=None)
        res = {}
        for name, split in (("train", tr), ("valid", va), ("test", te)):
            y = np.array([r.y[args.task] for r in split])
            raw = float(np.abs(design(split) @ coef - y).mean())
            res[name] = {
                "raw_mae": raw,
                "normalized_mae": raw / std,
                "error_ratio": raw / std / acc,
            }
        return res

    out = {
        "n_molecules": args.n,
        "seed": args.seed,
        "task": args.task,
        "target_std": std,
        "chemical_accuracy": acc,
        "noise_sigma": 0.01,
        "noise_only_expected_raw_mae": 0.01 * float(np.sqrt(2.0 / np.pi)),
        "oracle": "least squares on the exact generator features "
                  "[n_atoms, total_bond_order, n_double_bonds, "
                  "type_count_1, type_count_0] + bias",
        "splits": fit_eval(structural_features),
        # the CCN visibility class: no bond orders (chi from unweighted A)
        "order_blind_oracle_splits": fit_eval(order_blind_features),
    }
    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "floor.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out["splits"]))
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
