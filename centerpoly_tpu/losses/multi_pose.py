"""Human-pose training loss (secondary task `multi_pose`).

Behavioral reference: src/lib/trains/multi_pose.py:19-87
(MultiPoseLoss.forward): center focal + wh/off regression + joint-offset
regression (weighted by per-joint visibility masks) + joint heatmap focal
+ joint sub-pixel offset regression.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax.numpy as jnp

from .focal import clamped_sigmoid, focal_loss
from .regression import (
    reg_l1_loss, reg_smooth_l1_loss, reg_weighted_l1_loss, dense_l1_loss)


@dataclasses.dataclass(frozen=True)
class MultiPoseLossConfig:
    hm_weight: float = 1.0
    wh_weight: float = 0.1
    off_weight: float = 1.0
    hp_weight: float = 1.0
    hm_hp_weight: float = 1.0
    mse_loss: bool = False
    reg_loss: str = "l1"
    dense_hp: bool = False
    hm_hp: bool = True
    reg_hp_offset: bool = True
    reg_offset: bool = True


def multi_pose_loss(
    outputs: List[Dict[str, jnp.ndarray]],
    batch: Dict[str, jnp.ndarray],
    cfg: MultiPoseLossConfig,
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    num_stacks = len(outputs)
    hm_l = wh_l = off_l = hp_l = hm_hp_l = hp_off_l = 0.0
    crit_reg = reg_smooth_l1_loss if cfg.reg_loss == "sl1" else reg_l1_loss

    for out in outputs:
        if cfg.mse_loss:
            hm_l += jnp.mean((out["hm"] - batch["hm"]) ** 2) / num_stacks
        else:
            hm = clamped_sigmoid(out["hm"])
            hm_l += focal_loss(hm, batch["hm"]) / num_stacks

        if cfg.dense_hp:
            hp_l += dense_l1_loss(out["hps"], batch["dense_hps_mask"],
                                  batch["dense_hps"]) / num_stacks
        else:
            hp_l += reg_weighted_l1_loss(
                out["hps"], batch["hps_mask"], batch["ind"], batch["hps"]
            ) / num_stacks
        if cfg.wh_weight > 0:
            wh_l += crit_reg(out["wh"], batch["reg_mask"], batch["ind"],
                             batch["wh"]) / num_stacks
        if cfg.reg_offset and cfg.off_weight > 0:
            off_l += crit_reg(out["reg"], batch["reg_mask"], batch["ind"],
                              batch["reg"]) / num_stacks
        if cfg.reg_hp_offset and cfg.off_weight > 0:
            hp_off_l += crit_reg(out["hp_offset"], batch["hp_mask"],
                                 batch["hp_ind"], batch["hp_offset"]
                                 ) / num_stacks
        if cfg.hm_hp and cfg.hm_hp_weight > 0:
            if cfg.mse_loss:
                hm_hp_l += jnp.mean(
                    (out["hm_hp"] - batch["hm_hp"]) ** 2) / num_stacks
            else:
                hm_hp = clamped_sigmoid(out["hm_hp"])
                hm_hp_l += focal_loss(hm_hp, batch["hm_hp"]) / num_stacks

    loss = (cfg.hm_weight * hm_l + cfg.wh_weight * wh_l
            + cfg.off_weight * off_l + cfg.hp_weight * hp_l
            + cfg.hm_hp_weight * hm_hp_l + cfg.off_weight * hp_off_l)
    return loss, {"loss": loss, "hm_l": hm_l, "hp_l": hp_l,
                  "hm_hp_l": hm_hp_l, "hp_off_l": hp_off_l,
                  "wh_l": wh_l, "off_l": off_l}
