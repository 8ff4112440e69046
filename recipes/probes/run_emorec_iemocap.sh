#!/bin/bash
# IEMOCAP 4-class emotion fast probe (emorec/run_IEMOCAP_fast.py:68-84:
# MLP 256x4, lr 1e-4 with 0.8 halving, 15 epochs, batch 128), driven
# during pretraining by template_scripts/run_iemocap_aux.sh.
# Build lists with: data_prep.py probe-lists --class_from dirname
#   --holdout session5 (leave-session-out, ang/hap/neu/sad dirs).
set -e
FE_CKPT=$1; DATA_ROOT=$2; OUT=$3
FE_CFG=${FE_CFG:-cfg/frontend/PASE+.cfg}
LISTS=${LISTS:-$DATA_ROOT/lists}
mkdir -p "$OUT"
python run_probe.py utt \
    --fe_cfg "$FE_CFG" --fe_ckpt "$FE_CKPT" \
    --train_list "$LISTS/tr.lst" --test_list "$LISTS/te.lst" \
    --data_root "$DATA_ROOT" --mode avg_concat \
    --hidden 256 --epochs 15 --lr 0.0001 --batch_size 128 \
    --out "$OUT/emorec_iemocap.json"
# kfold LinearClassifier suite over the same labeled list
# (spk_id/nnet.py:24-603 pattern):
python run_probe.py kfold \
    --fe_cfg "$FE_CFG" --fe_ckpt "$FE_CKPT" \
    --train_list "$LISTS/tr.lst" --data_root "$DATA_ROOT" \
    --folds 10 --epochs 15 --lr 0.0001 --batch_size 128 \
    --out "$OUT/emorec_iemocap_kfold.json"
