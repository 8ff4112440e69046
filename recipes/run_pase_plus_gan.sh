#!/bin/bash
# PASE+ with adversarial waveform worker (the alldistortions_GAN recipe,
# template_scripts/run_pase_train_50h_alldistortions_GAN.sh semantics)
exec recipes/run_pase_plus_train.sh \
  --gan_cfg '{"worker": "cchunk", "loss": "LSGAN", "lr": 0.0004, "weight": 1.0}' "$@"
