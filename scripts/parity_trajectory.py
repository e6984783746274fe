#!/usr/bin/env python
"""Training-trajectory parity artifact: 20 epochs, reference torch vs this
framework, identical committed fixture set / initial weights / schedule.

Writes runs/parity_trajectory/trajectory.json with both per-epoch curves
and their deltas, and rewrites the trajectory section of PARITY.md.

Run (CPU on both sides for determinism):  python scripts/parity_trajectory.py
"""

import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests import trajectory_common as tc  # noqa: E402

EPOCHS = 20
OUT_DIR = "runs/parity_trajectory"
MARK_BEGIN = "<!-- trajectory:begin -->"
MARK_END = "<!-- trajectory:end -->"


def run_arch(arch):
    ref, ours = tc.run_both(h=2, L=3, J=1, bs=16, lr=1e-3, epochs=EPOCHS,
                            arch=arch, order=2)
    return _delta_rows(arch, ref, ours)


CCN_CFG = {"h": 4, "L": 2, "lr": 1e-3, "epochs": 10, "n_mol": 96}


def _delta_rows(tag, ref, ours):
    rows = []
    for e, (a, b) in enumerate(zip(ref["history"], ours["history"])):
        rel = {k: abs(b[k] - a[k]) / max(abs(a[k]), 1e-8) for k in a}
        rows.append({"epoch": e + 1, "reference": a, "ours": b,
                     "rel_delta": rel})
        print(f"{tag} epoch {e+1:2d}: ref loss {a['train_loss_ema']:.5f} "
              f"ours {b['train_loss_ema']:.5f} "
              f"(rel {rel['train_loss_ema']:.2e}); "
              f"val mae ref {a['val_mae']:.5f} ours {b['val_mae']:.5f} "
              f"(rel {rel['val_mae']:.2e})", flush=True)
    worst = max(max(r["rel_delta"].values()) for r in rows)
    return rows, worst


def run_ccn():
    ref, ours = tc.run_both_ccn(**CCN_CFG)
    return _delta_rows("ccn", ref, ours)


def main():
    rows, worst = run_arch("gnn")
    lg_rows, lg_worst = run_arch("lggnn")
    ccn_rows, ccn_worst = run_ccn()

    os.makedirs(OUT_DIR, exist_ok=True)
    with open(os.path.join(OUT_DIR, "trajectory.json"), "w") as f:
        json.dump({
            "config": {"h": 2, "L": 3, "J": 1, "bs": 16, "lr": 1e-3,
                       "epochs": EPOCHS, "fixture": "tests/fixtures/"
                       "parity_molecules.npz", "n_train": 160, "n_val": 32,
                       "optimizer": "adamax re-created each epoch, lr*0.9 "
                       "every 5 epochs (reference main_gnn_qm9 schedule)",
                       "lggnn": "order 2, reference operator tensors via "
                       "MaterializedBundle (bug-compatible)"},
            "worst_rel_delta": worst,
            "lggnn_worst_rel_delta": lg_worst,
            "ccn_worst_rel_delta": ccn_worst,
            "ccn_config": {**CCN_CFG, "loop": "per-molecule bs=1, the "
                           "reference's own train_ccn/test_ccn"},
            "epochs": rows,
            "lggnn_epochs": lg_rows,
            "ccn_epochs": ccn_rows,
        }, f, indent=2)
        f.write("\n")
    print(f"GNN worst relative delta over {EPOCHS} epochs x 4 metrics: "
          f"{worst:.3e}; LGGNN: {lg_worst:.3e}; CCN-1D: {ccn_worst:.3e}")

    section = "\n".join([
        MARK_BEGIN,
        "## Training-trajectory parity (20 epochs head-to-head)",
        "",
        "`scripts/parity_trajectory.py` trains the reference torch "
        "`GNN_simple` (via its own `train_with_mnb`/`test_with_mnb` loops "
        "and its per-epoch optimizer-re-creation + lr-damping schedule, "
        "`scripts/main_gnn_qm9.py:185,204-205`) and this framework's "
        "`GNNSimple` (compat mode) from identical initial weights on the "
        "committed fixture `tests/fixtures/parity_molecules.npz` "
        "(160 train / 32 val molecules, identical batch composition and "
        "per-batch Nmax padding). Per-epoch curves: "
        "`runs/parity_trajectory/trajectory.json`.",
        "",
        f"Worst relative delta across 20 epochs x 4 metrics "
        f"(train loss/MAE EMA, val loss/MAE): **{worst:.2e}** for the "
        f"power GNN; **{lg_worst:.2e}** for the line-graph GNN (order 2, "
        f"run over the reference's own operator tensors, edge-indexing "
        f"bug included); **{ccn_worst:.2e}** for CCN-1D over 10 epochs of "
        f"the reference's own per-molecule train_ccn/test_ccn loops "
        f"(Adamax re-created per epoch, bs=1 steps in identical order).",
        "",
        "| epoch | ref train loss | ours | ref val MAE | ours |",
        "|---|---|---|---|---|",
    ] + [
        f"| {r['epoch']} | {r['reference']['train_loss_ema']:.5f} | "
        f"{r['ours']['train_loss_ema']:.5f} | "
        f"{r['reference']['val_mae']:.5f} | {r['ours']['val_mae']:.5f} |"
        for r in rows[::4] + [rows[-1]]
    ] + [
        "",
        "`tests/test_trajectory_parity.py` re-runs a short head-to-head and "
        "fails on divergence (rel tolerance 2e-3).",
        MARK_END,
    ])

    with open("PARITY.md") as f:
        text = f.read()
    if MARK_BEGIN in text:
        pre = text.split(MARK_BEGIN)[0]
        post = text.split(MARK_END)[1]
        text = pre + section + post
    else:
        text = text.rstrip() + "\n\n" + section + "\n"
    with open("PARITY.md", "w") as f:
        f.write(text)
    print("updated PARITY.md")


if __name__ == "__main__":
    main()
