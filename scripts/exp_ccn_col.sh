#!/bin/bash
# Reference recipe scripts/exp_ccn_col.sh: CCN on collinear-points data.
set -e
cd "$(dirname "$0")/.."
python -m hgnn2_tpu.cli.main_generate_ccn \
  --k ${K:-1} --n ${N:-1000} --Nmax 20 --L 2 --h 12 --bs ${BS:-64} \
  --epochs ${EPOCHS:-20} --optim adamax --lr 1e-2 "$@"
