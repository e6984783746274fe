#!/bin/bash
# Reference recipe scripts/exp_lggnn_qm9.sh: line-graph GNN, L=5, h=1,
# update order 2.
set -e
cd "$(dirname "$0")/.."
python -m hgnn2_tpu.cli.main_gnn_qm9 --lg --update 2 \
  --L 5 --h 1 --J 1 --bs ${BS:-512} --epochs ${EPOCHS:-20} \
  --optim adamax --lr 3e-4 --lrdamping 0.9 --step 5 --task ${TASK:-0} "$@"
