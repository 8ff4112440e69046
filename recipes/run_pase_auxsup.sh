#!/bin/bash
# PASE+ pretraining with the AuxiliarSuperviser firing downstream probes
# after every epoch (reference template_scripts/run_pase_train_50h_auxsup.sh
# + pase/utils.py:164-185). sup_cmd.txt lines may use $model $cfg
# $iteration $save_path placeholders, e.g.:
#   bash recipes/probes/run_timit_fer.sh $model $TIMIT_ROOT $save_path/timit-aux_$iteration
#   bash recipes/probes/run_emorec_iemocap.sh $model $IEMOCAP_ROOT $save_path/iemocap-aux_$iteration
python train.py \
  --data_root "${DATA_ROOT:-data/LibriSpeech_50h/all}" \
  --data_cfg "${DATA_CFG:-data/librispeech_data_50h.cfg}" \
  --net_cfg cfg/workers/workers+.cfg \
  --fe_cfg cfg/frontend/PASE+.cfg \
  --dtrans_cfg cfg/distortions/pase+.cfg \
  --stats "${STATS:-data/librispeech_50h_stats.pkl}" \
  --batch_size 16 --chunk_size 32000 --epoch 400 \
  --fe_lr 0.001 --min_lr 0.0005 --lr_mode poly --random_scale True \
  --sup_exec "${SUP_CMD:-recipes/sup_cmd.txt}" --sup_freq 1 \
  --compute_dtype bfloat16 --fast_loader \
  --save_path "${SAVE_PATH:-ckpt_pase_auxsup}" "$@"
