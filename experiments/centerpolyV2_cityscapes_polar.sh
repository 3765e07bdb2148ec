#!/usr/bin/env bash
# Reproduction of reference experiments/centerpolyV2_cityscapes_polar.sh.
# The reference scripts pass `--polar_order`, a typo for `--poly_order`
# (SURVEY.md §5) — fixed here.
set -e

run() {
  exp=$1; shift
  python -m centerpoly_tpu.main polydet --val_intervals 24 --exp_id "$exp" \
      --elliptical_gt --poly_weight 1 --nbr_points 16 --dataset cityscapes \
      --arch smallhourglass --batch_size 4 --lr 2e-4 \
      --load_model models/ctdet_coco_hg.pth --rep polar "$@"
  python -m centerpoly_tpu.test polydet --exp_id "${exp}_TEST" \
      --nbr_points 16 --dataset cityscapes --arch smallhourglass \
      --load_model "exp/cityscapes/polydet/$exp/model_best" --rep polar
}

run from_ctdet_smhg_1cnv_16_pw1_iou_l1_loss_polar --poly_loss l1+iou
run from_ctdet_smhg_1cnv_16_pw1_l1_loss_polar --poly_loss l1
run from_ctdet_smhg_1cnv_16_pw1_l1_order_loss_polar --poly_loss l1 --poly_order
run from_ctdet_smhg_1cnv_16_pw1_iou_l1_order_loss_polar --poly_loss l1+iou --poly_order
