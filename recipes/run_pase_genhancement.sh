#!/bin/bash
# Guided-enhancement PASE: noisy tree feeds the encoder, parallel clean
# tree supplies the denoising targets (reference template_scripts/
# run_train_pase_genhancement_QRNN.sh + GenhancementDataset,
# pase/dataset.py GenhancementDataset).
python train.py \
  --data_root "${DATA_ROOT:-data/GEnhancement/LibriSpeech_noisy}" \
  --clean_root "${CLEAN_ROOT:-data/GEnhancement/LibriSpeech_clean}" \
  --dataset GenhancementDataset \
  --data_cfg "${DATA_CFG:-data/librispeech_contaminated.cfg}" \
  --net_cfg cfg/workers/workers+.cfg \
  --fe_cfg cfg/frontend/PASE+.cfg \
  --stats "${STATS:-data/librispeech_50h_stats.pkl}" \
  --batch_size 32 --chunk_size 16000 --epoch 200 --seed 91 \
  --fe_lr 0.0005 --min_lr 0.0005 --lr_mode poly --log_freq 50 \
  --compute_dtype bfloat16 \
  --save_path "${SAVE_PATH:-ckpt_pase_genhancement}" "$@"
