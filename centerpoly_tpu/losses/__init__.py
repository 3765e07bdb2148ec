from .focal import focal_loss, clamped_sigmoid
from .regression import (
    reg_l1_loss, reg_smooth_l1_loss, norm_reg_l1_loss,
    reg_weighted_l1_loss, dense_l1_loss, bin_rot_loss)
from .poly import poly_loss, order_loss, poly_iou_loss
from .polydet import PolydetLossConfig, polydet_loss
from .ctdet import CtdetLossConfig, ctdet_loss

__all__ = [
    "focal_loss",
    "clamped_sigmoid",
    "reg_l1_loss",
    "reg_smooth_l1_loss",
    "norm_reg_l1_loss",
    "reg_weighted_l1_loss",
    "dense_l1_loss",
    "bin_rot_loss",
    "poly_loss",
    "order_loss",
    "poly_iou_loss",
    "PolydetLossConfig",
    "polydet_loss",
    "CtdetLossConfig",
    "ctdet_loss",
]
