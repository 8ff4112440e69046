#!/bin/bash
# PASE+ pretraining recipe (reference README.md:121-131 semantics:
# batch 16, 400 epochs, fe_lr 1e-3 / min_lr 5e-4, chunk 32000, poly LR,
# on-the-fly distortions). bf16 compute + native loader on by default.
python train.py \
  --data_root "${DATA_ROOT:-data/LibriSpeech_50h/wav_sel}" \
  --data_cfg "${DATA_CFG:-data/librispeech_data_50h.cfg}" \
  --net_cfg cfg/workers/workers+.cfg \
  --fe_cfg cfg/frontend/PASE+.cfg \
  --dtrans_cfg cfg/distortions/pase+.cfg \
  --stats "${STATS:-data/librispeech_50h_stats.pkl}" \
  --batch_size 16 --chunk_size 32000 --epoch 400 \
  --fe_lr 0.001 --min_lr 0.0005 --lr_mode poly --random_scale True \
  --compute_dtype bfloat16 --fast_loader \
  --save_path "${SAVE_PATH:-ckpt_pase_plus}" "$@"
