#!/bin/bash
# miniCHiME5 frame-error-rate fast probe (ASR/run_minichime5_fast.py:
# the TIMIT-fast pattern on CHiME5 far-field data — same context,
# MLP, and lr-halving recipe, different alignments/corpus).
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
    --out "$OUT/chime5_fer.json"
