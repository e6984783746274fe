#!/bin/bash
# Reference recipe scripts/exp_ccn1_qm9.sh: CCN-1D, L=20, h=2.
set -e
cd "$(dirname "$0")/.."
python -m hgnn2_tpu.cli.main_ccn_qm9 --k 1 \
  --L 20 --h 2 --bs ${BS:-256} --epochs ${EPOCHS:-20} \
  --optim adamax --lr 1e-3 --task ${TASK:-0} "$@"
