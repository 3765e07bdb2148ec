"""CenterNet box-detection training loss (secondary task `ctdet`).

Behavioral reference: src/lib/trains/ctdet.py:20-91 (CtdetLoss.forward):
total = hm_weight * focal(sigmoid(hm))
      + wh_weight * wh_loss            (reg_l1 | smooth-l1 | dense | norm |
                                        cat_spec weighted)
      + off_weight * L1(reg at peaks)
averaged over stacks.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax.numpy as jnp

from .focal import clamped_sigmoid, focal_loss
from .regression import (
    reg_l1_loss, reg_smooth_l1_loss, norm_reg_l1_loss,
    reg_weighted_l1_loss, dense_l1_loss)


@dataclasses.dataclass(frozen=True)
class CtdetLossConfig:
    """Weights/flags; defaults match reference opts.py."""
    hm_weight: float = 1.0
    off_weight: float = 1.0
    wh_weight: float = 0.1
    mse_loss: bool = False
    reg_loss: str = "l1"          # l1 | sl1
    dense_wh: bool = False
    norm_wh: bool = False
    cat_spec_wh: bool = False
    reg_offset: bool = True


def ctdet_loss(
    outputs: List[Dict[str, jnp.ndarray]],
    batch: Dict[str, jnp.ndarray],
    cfg: CtdetLossConfig,
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """outputs: per-stack dicts with 'hm', 'wh', optional 'reg' (NHWC).
    batch: 'hm' (B,H,W,C), 'reg_mask'/'ind' (B,K), 'wh' (B,K,2) or
    dense/cat_spec variants, optional 'reg' (B,K,2)."""
    num_stacks = len(outputs)
    hm_l = wh_l = off_l = 0.0
    crit_reg = reg_smooth_l1_loss if cfg.reg_loss == "sl1" else reg_l1_loss

    for out in outputs:
        if cfg.mse_loss:
            hm_l += jnp.mean((out["hm"] - batch["hm"]) ** 2) / num_stacks
        else:
            hm = clamped_sigmoid(out["hm"])
            hm_l += focal_loss(hm, batch["hm"]) / num_stacks

        if cfg.wh_weight > 0:
            if cfg.dense_wh:
                wh_l += dense_l1_loss(
                    out["wh"], batch["dense_wh_mask"], batch["dense_wh"]
                ) / num_stacks
            elif cfg.cat_spec_wh:
                wh_l += reg_weighted_l1_loss(
                    out["wh"], batch["cat_spec_mask"], batch["ind"],
                    batch["cat_spec_wh"]) / num_stacks
            elif cfg.norm_wh:
                wh_l += norm_reg_l1_loss(
                    out["wh"], batch["reg_mask"], batch["ind"], batch["wh"]
                ) / num_stacks
            else:
                wh_l += crit_reg(
                    out["wh"], batch["reg_mask"], batch["ind"], batch["wh"]
                ) / num_stacks

        if cfg.reg_offset and cfg.off_weight > 0:
            off_l += crit_reg(
                out["reg"], batch["reg_mask"], batch["ind"], batch["reg"]
            ) / num_stacks

    loss = (cfg.hm_weight * hm_l + cfg.wh_weight * wh_l
            + cfg.off_weight * off_l)
    return loss, {"loss": loss, "hm_l": hm_l, "wh_l": wh_l, "off_l": off_l}
