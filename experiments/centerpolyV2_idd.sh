#!/usr/bin/env bash
# Reproduction of reference experiments/centerpolyV2_idd.sh (dataset key
# normalized: the reference passed `--dataset idd` against an `IDD`
# factory key; our registry accepts both).
set -e

python -m centerpoly_tpu.main polydet --val_intervals 24 \
    --exp_id idd_smhg_16 --elliptical_gt --poly_weight 1 \
    --nbr_points 16 --dataset IDD --arch smallhourglass \
    --batch_size 4 --lr 2e-4 --load_model models/ctdet_coco_hg.pth \
    --poly_loss l1+iou

python -m centerpoly_tpu.test polydet --exp_id idd_smhg_16_TEST \
    --nbr_points 16 --dataset IDD --arch smallhourglass \
    --load_model exp/IDD/polydet/idd_smhg_16/model_best
