"""3D box-estimation training loss (secondary task `ddd`).

Behavioral reference: src/lib/trains/ddd.py:17-64 (DddLoss.forward):
total = hm_weight * focal(sigmoid(hm))
      + dep_weight * L1(1/sigmoid(dep) - 1 at peaks)
      + dim_weight * L1(dim) + rot_weight * BinRot(rot)
      + wh_weight * L1(wh) [reg_bbox] + off_weight * L1(reg),
wh/reg masked by rot_mask, dep/dim by reg_mask.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax.numpy as jnp

from .focal import clamped_sigmoid, focal_loss
from .regression import reg_l1_loss, bin_rot_loss


@dataclasses.dataclass(frozen=True)
class DddLossConfig:
    """Weights/flags; defaults match reference opts.py ddd section."""
    hm_weight: float = 1.0
    dep_weight: float = 1.0
    dim_weight: float = 1.0
    rot_weight: float = 1.0
    wh_weight: float = 0.1
    off_weight: float = 1.0
    mse_loss: bool = False
    reg_bbox: bool = True
    reg_offset: bool = True


def ddd_depth_transform(dep_logits: jnp.ndarray) -> jnp.ndarray:
    """inverse-sigmoid depth parametrization (ref trains/ddd.py:33)."""
    import jax
    return 1.0 / (jax.nn.sigmoid(dep_logits) + 1e-6) - 1.0


def ddd_loss(
    outputs: List[Dict[str, jnp.ndarray]],
    batch: Dict[str, jnp.ndarray],
    cfg: DddLossConfig,
) -> Tuple[jnp.ndarray, Dict[str, Any]]:
    num_stacks = len(outputs)
    hm_l = dep_l = rot_l = dim_l = wh_l = off_l = 0.0

    for out in outputs:
        if cfg.mse_loss:
            hm_l += jnp.mean((out["hm"] - batch["hm"]) ** 2) / num_stacks
        else:
            hm = clamped_sigmoid(out["hm"])
            hm_l += focal_loss(hm, batch["hm"]) / num_stacks

        dep = ddd_depth_transform(out["dep"])
        if cfg.dep_weight > 0:
            dep_l += reg_l1_loss(dep, batch["reg_mask"], batch["ind"],
                                 batch["dep"]) / num_stacks
        if cfg.dim_weight > 0:
            dim_l += reg_l1_loss(out["dim"], batch["reg_mask"], batch["ind"],
                                 batch["dim"]) / num_stacks
        if cfg.rot_weight > 0:
            rot_l += bin_rot_loss(out["rot"], batch["rot_mask"],
                                  batch["ind"], batch["rotbin"],
                                  batch["rotres"]) / num_stacks
        if cfg.reg_bbox and cfg.wh_weight > 0:
            wh_l += reg_l1_loss(out["wh"], batch["rot_mask"], batch["ind"],
                                batch["wh"]) / num_stacks
        if cfg.reg_offset and cfg.off_weight > 0:
            off_l += reg_l1_loss(out["reg"], batch["rot_mask"], batch["ind"],
                                 batch["reg"]) / num_stacks

    loss = (cfg.hm_weight * hm_l + cfg.dep_weight * dep_l
            + cfg.dim_weight * dim_l + cfg.rot_weight * rot_l
            + cfg.wh_weight * wh_l + cfg.off_weight * off_l)
    return loss, {"loss": loss, "hm_l": hm_l, "dep_l": dep_l,
                  "dim_l": dim_l, "rot_l": rot_l, "wh_l": wh_l,
                  "off_l": off_l}
