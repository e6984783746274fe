#!/bin/bash
# Reference recipe scripts/exp_gnn_qm9.sh: GNN_simple on QM9, L=15, h=1,
# bs=30 (we default to a TPU-sized batch), 20 epochs, adamax lr 3e-4.
set -e
cd "$(dirname "$0")/.."
python -m hgnn2_tpu.cli.main_gnn_qm9 \
  --L 15 --h 1 --J 1 --bs ${BS:-1024} --epochs ${EPOCHS:-20} \
  --optim adamax --lr 3e-4 --lrdamping 0.9 --step 5 --task ${TASK:-0} "$@"
