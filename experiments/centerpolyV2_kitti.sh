#!/usr/bin/env bash
# Reproduction of reference experiments/centerpolyV2_kitti.sh.
set -e

python -m centerpoly_tpu.main polydet --val_intervals 24 \
    --exp_id kitti_smhg_16 --elliptical_gt --poly_weight 1 \
    --nbr_points 16 --dataset kitti_poly --arch smallhourglass \
    --batch_size 4 --lr 2e-4 --load_model models/ctdet_coco_hg.pth \
    --poly_loss l1+iou

python -m centerpoly_tpu.test polydet --exp_id kitti_smhg_16_TEST \
    --nbr_points 16 --dataset kitti_poly --arch smallhourglass \
    --load_model exp/kitti_poly/polydet/kitti_smhg_16/model_best
