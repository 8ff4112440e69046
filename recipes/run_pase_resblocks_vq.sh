#!/bin/bash
# Residual-trunk PASE+ with a VQ-8192 codebook (reference
# template_scripts/run_pase_resblocks_len32000_VQ8192_train.sh: batch 32,
# 50 epochs, fe/min lr 5e-4, step LR decay 30, chunk 32000). The VQ
# commitment loss joins the objective and perplexity is logged.
python train.py \
  --data_root "${DATA_ROOT:-data/LibriSpeech_50h/all}" \
  --data_cfg "${DATA_CFG:-data/librispeech_data_50h.cfg}" \
  --net_cfg cfg/workers/workers+.cfg \
  --fe_cfg cfg/frontend/PASE+_resblocks_VQ8192.cfg \
  --stats "${STATS:-data/librispeech_50h_stats.pkl}" \
  --batch_size 32 --chunk_size 32000 --epoch 50 \
  --fe_lr 0.0005 --min_lr 0.0005 --lr_mode step --lrdec_step 30 \
  --compute_dtype bfloat16 --fast_loader \
  --save_path "${SAVE_PATH:-ckpt_pase_resblocks_vq8192}" "$@"
