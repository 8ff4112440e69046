#!/bin/bash
# pase_attention variant: per-worker channel-attention blocks with
# running-average distributions (reference pase.py:17-130,
# train.py:312-321/432-434 --att_cfg).
python train.py \
  --data_root "${DATA_ROOT:-data/LibriSpeech_50h/all}" \
  --data_cfg "${DATA_CFG:-data/librispeech_data_50h.cfg}" \
  --net_cfg cfg/workers/workers+.cfg \
  --fe_cfg cfg/frontend/PASE+.cfg \
  --att_cfg cfg/attention.cfg \
  --dtrans_cfg cfg/distortions/pase+.cfg \
  --stats "${STATS:-data/librispeech_50h_stats.pkl}" \
  --batch_size 16 --chunk_size 32000 --epoch 400 \
  --fe_lr 0.001 --min_lr 0.0005 --lr_mode poly --random_scale True \
  --compute_dtype bfloat16 --fast_loader \
  --save_path "${SAVE_PATH:-ckpt_pase_attention}" "$@"
