#!/bin/bash
# MiniVoxCeleb speaker-ID fast probe (spk_id/run_minivox_fast.py:74-90:
# MLP 256xH, SGD lr 1e-3 halved on plateau, 24 epochs, batch 128,
# frame + sentence error on avg_concat PASE features).
# Lists come from `data_prep.py probe-lists` (see README.md here).
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
    --out "$OUT/spkid_minivox.json"
