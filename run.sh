#!/usr/bin/env bash
# Canonical joint 3DVLP pretraining command — mirrors the reference's
# run.sh:1 flag-for-flag (grounding-focused pretrain stage; captioning and
# QA stages warm-start from it via --pretrain, see PROGRESS.md).
#
# Requires ScanNet/ScanRefer assets: --scannet_data (offline export dir),
# --scanrefer_dir, --labels_tsv, --mean_size_npz, --bert_vocab.
# Append --synthetic --smoke for an assetless smoke run.
python -m vlp3d.cli.train_3dvlp \
  --use_multiview --use_normal \
  --batch_size 8 --epoch 200 --lang_num_max 8 \
  --coslr --lr 0.002 \
  --no_caption --lang_num_aug 0 --unfreeze 6 --debug \
  --use_con --use_diou_loss \
  "$@"
