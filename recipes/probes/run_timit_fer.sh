#!/bin/bash
# TIMIT monophone frame-error-rate fast probe
# (ASR/run_TIMIT_fast.py:69-75: context +-1, 24 epochs, batch 128,
# SGD lr 1.2e-3 halved on plateau, MLP 1024), the pretraining-time
# monitor fired by template_scripts/run_timit_aux.sh.
# Lists are `relpath alifile` pairs (monophone targets per utterance).
set -e
FE_CKPT=$1; DATA_ROOT=$2; OUT=$3
FE_CFG=${FE_CFG:-cfg/frontend/PASE+.cfg}
LISTS=${LISTS:-$DATA_ROOT/lists}
mkdir -p "$OUT"
python run_probe.py frames \
    --fe_cfg "$FE_CFG" --fe_ckpt "$FE_CKPT" \
    --train_list "$LISTS/tr_ali.lst" --test_list "$LISTS/te_ali.lst" \
    --data_root "$DATA_ROOT" --num_classes 48 \
    --left 1 --right 1 --hidden 1024 \
    --epochs 24 --lr 0.0012 \
    --out "$OUT/timit_fer.json"
