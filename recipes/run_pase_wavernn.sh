#!/bin/bash
# PASE+ pretraining with the WaveRNN vocoder worker added to the bank
# (reference minions.py:58-362; its pase.py:336 wiring is broken
# upstream — here type=wavernn trains like any worker). The
# autoregressive teacher-forced GRUs make this the most expensive
# worker; budget ~2-3x the plain PASE+ step time.
python train.py \
  --data_root "${DATA_ROOT:-data/LibriSpeech_50h/wav_sel}" \
  --data_cfg "${DATA_CFG:-data/librispeech_data_50h.cfg}" \
  --net_cfg cfg/workers/workers+wavernn.cfg \
  --fe_cfg cfg/frontend/PASE+.cfg \
  --dtrans_cfg cfg/distortions/pase+.cfg \
  --stats "${STATS:-data/librispeech_50h_stats.pkl}" \
  --batch_size 16 --chunk_size 32000 --epoch 400 \
  --fe_lr 0.001 --min_lr 0.0005 --lr_mode poly --random_scale True \
  --compute_dtype bfloat16 --fast_loader \
  --save_path "${SAVE_PATH:-ckpt_pase_wavernn}" "$@"
