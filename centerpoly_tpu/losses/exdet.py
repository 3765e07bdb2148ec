"""ExtremeNet training loss (secondary task `exdet`).

Behavioral reference: src/lib/trains/exdet.py:17-42 (ExdetLoss.forward):
focal over the five extreme-point heatmaps (t/l/b/r/c) + masked L1 on the
four edge sub-pixel offsets.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax.numpy as jnp

from .focal import clamped_sigmoid, focal_loss
from .regression import reg_l1_loss

PARTS = ("t", "l", "b", "r", "c")


@dataclasses.dataclass(frozen=True)
class ExdetLossConfig:
    hm_weight: float = 1.0
    off_weight: float = 1.0
    mse_loss: bool = False
    reg_offset: bool = True


def exdet_loss(
    outputs: List[Dict[str, jnp.ndarray]],
    batch: Dict[str, jnp.ndarray],
    cfg: ExdetLossConfig,
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    num_stacks = len(outputs)
    hm_l = off_l = 0.0
    for out in outputs:
        for p in PARTS:
            tag = f"hm_{p}"
            if cfg.mse_loss:
                hm_l += jnp.mean(
                    (out[tag] - batch[tag]) ** 2) / num_stacks
            else:
                hm = clamped_sigmoid(out[tag])
                hm_l += focal_loss(hm, batch[tag]) / num_stacks
            if p != "c" and cfg.reg_offset and cfg.off_weight > 0:
                off_l += reg_l1_loss(
                    out[f"reg_{p}"], batch["reg_mask"],
                    batch[f"ind_{p}"], batch[f"reg_{p}"]) / num_stacks
    loss = cfg.hm_weight * hm_l + cfg.off_weight * off_l
    return loss, {"loss": loss, "hm_l": hm_l, "off_l": off_l}
