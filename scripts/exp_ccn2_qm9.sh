#!/bin/bash
# Reference recipe scripts/exp_ccn2_qm9.sh: CCN-2D, L=2, h=2 (the
# reference ran bs=1 at ~4.3 molecules/s; we batch all vertices).
set -e
cd "$(dirname "$0")/.."
python -m hgnn2_tpu.cli.main_ccn_qm9 --k 2 \
  --L 2 --h 2 --bs ${BS:-256} --epochs ${EPOCHS:-20} \
  --optim adamax --lr 1e-3 --task ${TASK:-0} "$@"
