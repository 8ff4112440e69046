#!/bin/bash
# Joint LibriSpeech + AMI pretraining (reference template_scripts/
# run_pase_libri_ami_ihm_sdm.sh): repeated --data_root/--data_cfg/
# --dataset triples concatenate corpora; Libri gets the distortion
# stack while AMI's far-field sdm channel trains raw (--dtrans_cfg None
# for that dataset) against the aligned ihm clean channel.
python train.py \
  --net_cfg cfg/workers/workers.cfg \
  --fe_cfg cfg/frontend/PASE+.cfg \
  --stats "${STATS:-data/libri_ami_ihm_stats.pkl}" \
  --batch_size 32 --chunk_size 32000 --epoch 40 \
  --fe_lr 0.0005 --min_lr 0.0005 --lr_mode step --lrdec_step 20 \
  --random_scale True --compute_dtype bfloat16 \
  --data_root "${LIBRI_ROOT:-data/LibriSpeech_50h/wav_sel}" \
  --data_cfg "${LIBRI_CFG:-data/librispeech_data_50h.cfg}" \
  --dtrans_cfg cfg/distortions/pase+.cfg \
  --dataset LibriSpeechSegTupleWavDataset \
  --data_root "${AMI_SDM_ROOT:-data/ami/sdm}" \
  --data_cfg "${AMI_CFG:-data/ami_data_ihm_sdm.cfg}" \
  --dtrans_cfg None \
  --dataset AmiSegTupleWavDataset \
  --clean_root "${AMI_IHM_ROOT:-data/ami/ihm}" \
  --save_path "${SAVE_PATH:-ckpt_pase_libri_ami}" "$@"
