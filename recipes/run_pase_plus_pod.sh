#!/bin/bash
# PASE+ pretraining at POD scale: the whole corpus lives in HBM,
# sharded over the mesh's data axis (--shard_device_corpus), so the
# steady-state feed performs ZERO host->device transfers and corpus
# capacity scales linearly with chips (~37 h/chip; 8 x v5e = ~300 h).
#
# Single host, all local chips (data parallel + HBM-sharded corpus):
#   DATA_ROOT=... DATA_CFG=... bash recipes/run_pase_plus_pod.sh
#
# Multi-host (DCN): run once per host with the SAME corpus visible on
# every host (each process decodes only the shards its chips own):
#   COORD=host0:8476 NPROC=4 PID=<0..3> bash recipes/run_pase_plus_pod.sh
#
# Tensor parallelism composes: add --n_model 2 to split the wide
# params column-parallel over a ('data','model') mesh.
set -e
EXTRA=()
if [ -n "$COORD" ]; then
  EXTRA+=(--coordinator_address "$COORD"
          --num_processes "${NPROC:?set NPROC}"
          --process_id "${PID:?set PID}")
fi
python train.py \
  --data_root "${DATA_ROOT:-data/LibriSpeech_50h/wav_sel}" \
  --data_cfg "${DATA_CFG:-data/librispeech_data_50h.cfg}" \
  --net_cfg cfg/workers/workers+.cfg \
  --fe_cfg cfg/frontend/PASE+.cfg \
  --dtrans_cfg cfg/distortions/pase+.cfg \
  --stats "${STATS:-data/librispeech_50h_stats.pkl}" \
  --device_corpus --shard_device_corpus \
  --batch_size "${BATCH:-64}" --chunk_size 32000 --epoch 400 \
  --fe_lr 0.001 --min_lr 0.0005 --lr_mode poly --random_scale True \
  --compute_dtype bfloat16 \
  --save_path "${SAVE_PATH:-ckpt_pase_plus_pod}" \
  "${EXTRA[@]}" "$@"
