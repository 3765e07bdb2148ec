"""Prediction head stacks.

Each head is conv3x3(head_conv) -> ReLU -> conv1x1(channels); heatmap heads
get bias init -2.19 so initial sigmoid ~= 0.1 (reference:
pose_dla_dcn.py:446-468, large_hourglass.py:406-433).
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import jax.numpy as jnp
import flax.linen as nn


class HeadStack(nn.Module):
    """Emit a dict of NHWC head maps from a shared feature map."""
    heads: Mapping[str, int]       # head name -> channels
    head_conv: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        out = {}
        for name, channels in self.heads.items():
            h = x
            if self.head_conv > 0:
                h = nn.Conv(self.head_conv, (3, 3), padding="SAME",
                            use_bias=True, dtype=self.dtype,
                            name=f"{name}_conv")(h)
                h = nn.relu(h)
            bias_init = (
                nn.initializers.constant(-2.19)
                if "hm" in name else nn.initializers.zeros
            )
            h = nn.Conv(channels, (1, 1), use_bias=True,
                        bias_init=bias_init, dtype=self.dtype,
                        name=f"{name}_out")(h)
            out[name] = h
        return out


def polydet_heads(num_classes: int, nbr_points: int = 16,
                  reg_offset: bool = True,
                  cat_spec_poly: bool = False) -> Dict[str, int]:
    """Head table for the polydet task (ref opts.py:381-398)."""
    heads = {
        "hm": num_classes,
        "poly": nbr_points * 2 * (num_classes if cat_spec_poly else 1),
        "pseudo_depth": 1,
    }
    if reg_offset:
        heads["reg"] = 2
    return heads


def ctdet_heads(num_classes: int, reg_offset: bool = True,
                cat_spec_wh: bool = False) -> Dict[str, int]:
    heads = {
        "hm": num_classes,
        "wh": 2 * (num_classes if cat_spec_wh else 1),
    }
    if reg_offset:
        heads["reg"] = 2
    return heads
