"""Combined polydet training loss.

Behavioral reference: src/lib/trains/polydet.py:38-162 (PolydetLoss.forward):
total = hm_weight * focal(sigmoid(hm))
      + off_weight * L1(reg at peaks)
      + poly_weight * (poly [+ order])
      + depth_weight * L1(pseudo_depth at peaks)
averaged over stacks for multi-stack backbones (hourglass intermediate
supervision).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax.numpy as jnp

from .focal import clamped_sigmoid, focal_loss
from .regression import reg_l1_loss
from .poly import poly_loss


@dataclasses.dataclass(frozen=True)
class PolydetLossConfig:
    """Loss weights/flags; defaults match reference opts.py."""
    hm_weight: float = 1.0
    off_weight: float = 1.0
    poly_weight: float = 1.0
    depth_weight: float = 0.1
    rep: str = "cartesian"            # cartesian | polar | polar_fixed
    poly_loss: str = "l1"             # l1 | iou | l1+iou | relu
    poly_order: bool = False
    reg_offset: bool = True
    mse_loss: bool = False


def polydet_loss(
    outputs: List[Dict[str, jnp.ndarray]],
    batch: Dict[str, jnp.ndarray],
    cfg: PolydetLossConfig,
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    """Compute total loss and a stats dict.

    Args:
      outputs: per-stack dicts of NHWC head maps ('hm', 'poly',
        'pseudo_depth', optional 'reg') — raw logits for 'hm'.
      batch: GT dict with 'hm' (B,H,W,C), 'reg_mask' (B,K), 'ind' (B,K),
        'poly' (B,K,2N), 'pseudo_depth' (B,K,1), optional 'reg' (B,K,2).

    Returns (loss, stats) with the reference's stat keys
    (trains/polydet.py:148-161).
    """
    num_stacks = len(outputs)
    hm_l = off_l = poly_l = depth_l = order_l = 0.0

    for out in outputs:
        if cfg.mse_loss:
            hm = out["hm"]
            hm_l += jnp.mean((hm - batch["hm"]) ** 2) / num_stacks
        else:
            hm = clamped_sigmoid(out["hm"])
            hm_l += focal_loss(hm, batch["hm"]) / num_stacks

        depth_l += reg_l1_loss(
            out["pseudo_depth"], batch["reg_mask"], batch["ind"],
            batch["pseudo_depth"],
        ) / num_stacks

        if cfg.poly_order:
            p, o = poly_loss(
                out["poly"], batch["reg_mask"], batch["ind"], batch["poly"],
                rep=cfg.rep, kind=cfg.poly_loss, with_order=True,
            )
            poly_l += p / num_stacks
            order_l += o / num_stacks
        else:
            poly_l += poly_loss(
                out["poly"], batch["reg_mask"], batch["ind"], batch["poly"],
                rep=cfg.rep, kind=cfg.poly_loss,
            ) / num_stacks

        if cfg.reg_offset and cfg.off_weight > 0:
            off_l += reg_l1_loss(
                out["reg"], batch["reg_mask"], batch["ind"], batch["reg"]
            ) / num_stacks

    poly_total = poly_l + order_l if cfg.poly_order else poly_l
    loss = (
        cfg.hm_weight * hm_l
        + cfg.off_weight * off_l
        + cfg.poly_weight * poly_total
        + cfg.depth_weight * depth_l
    )
    stats = {"loss": loss, "hm_l": hm_l, "off_l": off_l, "poly_l": poly_l,
             "depth_l": depth_l}
    if cfg.poly_order:
        stats["order_l"] = order_l
    return loss, stats
