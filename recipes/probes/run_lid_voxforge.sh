#!/bin/bash
# MiniVoxForge language-ID fast probe — same recipe as speaker-ID with
# an utt2lang map (spk_id/run_minivox_fast.py:13-15).
set -e
FE_CKPT=$1; DATA_ROOT=$2; OUT=$3
FE_CFG=${FE_CFG:-cfg/frontend/PASE+.cfg}
LISTS=${LISTS:-$DATA_ROOT/lists}
mkdir -p "$OUT"
python run_probe.py utt \
    --fe_cfg "$FE_CFG" --fe_ckpt "$FE_CKPT" \
    --train_list "$LISTS/tr.lst" --test_list "$LISTS/te.lst" \
    --data_root "$DATA_ROOT" --mode avg_concat \
    --hidden 256 --epochs 24 --lr 0.001 --batch_size 128 \
    --out "$OUT/lid_voxforge.json"
