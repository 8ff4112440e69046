#!/bin/bash
# PASE v0.1 pretraining recipe (reference README.md:109-113 semantics:
# batch 32, 150 epochs, lr 5e-4, chunk 16000)
python train.py \
  --data_root "${DATA_ROOT:-data/LibriSpeech/wav_sel}" \
  --data_cfg "${DATA_CFG:-data/librispeech_data.cfg}" \
  --net_cfg cfg/workers/workers.cfg \
  --fe_cfg cfg/frontend/PASE.cfg \
  --stats "${STATS:-data/librispeech_stats.pkl}" \
  --batch_size 32 --chunk_size 16000 --epoch 150 \
  --fe_lr 0.0005 --min_lr 0.0005 --lr_mode step \
  --save_path "${SAVE_PATH:-ckpt_pase}" "$@"
