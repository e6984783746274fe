#!/bin/bash
# Reference recipe scripts/exp_gnn_col.sh: GNN on collinear-points data.
set -e
cd "$(dirname "$0")/.."
python -m hgnn2_tpu.cli.main_generate \
  --n ${N:-1000} --Nmax 50 --L 4 --h 4 --bs ${BS:-64} --epochs ${EPOCHS:-20} \
  --optim adamax --lr 3e-3 "$@"
