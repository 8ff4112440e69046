#!/bin/bash
# PASE+ with zero-speech injection: near-silent synthetic samples at
# p=0.1 teach the encoder a silence manifold (reference
# template_scripts/run_pase_train_50h_QRNN_addrev_zerospeech.sh,
# pase/utils.py:208-210 zerospeech).
python train.py \
  --data_root "${DATA_ROOT:-data/LibriSpeech_50h/all}" \
  --data_cfg "${DATA_CFG:-data/librispeech_data_50h.cfg}" \
  --net_cfg cfg/workers/workers+.cfg \
  --fe_cfg cfg/frontend/PASE+.cfg \
  --dtrans_cfg cfg/distortions/pase+.cfg \
  --stats "${STATS:-data/librispeech_50h_stats.pkl}" \
  --batch_size 32 --chunk_size 32000 --epoch 50 --seed 100 \
  --fe_lr 0.0005 --min_lr 0.0005 --lr_mode poly --random_scale True \
  --zero_speech_p 0.1 \
  --compute_dtype bfloat16 --fast_loader \
  --save_path "${SAVE_PATH:-ckpt_pase_zerospeech}" "$@"
