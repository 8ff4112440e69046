#!/bin/bash
# TIMIT full ASR with Kaldi decoding -> PER
# (ASR/run_TIMIT_full_decoding.py:42-567): context +-8 windowed frames,
# 5x1024 MLP per cfg/probes/MLP_PASE.cfg, posteriors minus log-priors
# to ark, decode_dnn.sh orchestration per cfg/probes/decoder.cfg
# (skipped gracefully when Kaldi is absent; the ark + cfg.ini remain).
set -e
FE_CKPT=$1; DATA_ROOT=$2; OUT=$3
FE_CFG=${FE_CFG:-cfg/frontend/PASE+.cfg}
LISTS=${LISTS:-$DATA_ROOT/lists}
mkdir -p "$OUT"
python run_probe.py timit-full \
    --fe_cfg "$FE_CFG" --fe_ckpt "$FE_CKPT" \
    --train_list "$LISTS/tr_ali.lst" --test_list "$LISTS/te_ali.lst" \
    --data_root "$DATA_ROOT" \
    --mlp_cfg cfg/probes/MLP_PASE.cfg --dec_cfg cfg/probes/decoder.cfg \
    --out_folder "$OUT" --out "$OUT/timit_full.json"
