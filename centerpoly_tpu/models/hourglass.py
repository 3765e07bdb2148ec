"""Stacked hourglass backbone (CornerNet architecture).

Behavioral reference: src/lib/models/networks/large_hourglass.py — the
paper's CenterPoly experiments use the 1-stack "smallhourglass"
(:486-492).  Structure: pre = 7x7/s2 conv(128) + s2 residual(256) (x4
downsample), then per stack a 5-level recursive hourglass with dims
[256, 256, 384, 384, 384, 512] / modules [2, 2, 2, 2, 2, 4], a 3x3
conv(256), and per-head stacks; intermediate supervision between stacks
(:438-462).

TPU notes: NHWC, downsampling inside the hourglass is the stride-2 first
residual of each level (ref make_hg_layer :465-468; pooling is identity),
upsampling is nearest x2 (ref nn.Upsample default).
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import ConvBN, Residual
from .heads import HeadStack


class HourglassLevel(nn.Module):
    """One recursion level: up1 (skip) + down -> inner -> up (merge: add)."""
    dims: Sequence[int]
    modules: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        curr_dim = self.dims[0]
        next_dim = self.dims[1]
        curr_mod = self.modules[0]
        next_mod = self.modules[1]

        up1 = x
        for i in range(curr_mod):
            up1 = Residual(curr_dim, dtype=self.dtype,
                           name=f"up1_{i}")(up1, train)

        low1 = Residual(next_dim, stride=2, dtype=self.dtype,
                        name="low1_0")(x, train)
        for i in range(1, curr_mod):
            low1 = Residual(next_dim, dtype=self.dtype,
                            name=f"low1_{i}")(low1, train)

        if len(self.dims) > 2:
            low2 = HourglassLevel(self.dims[1:], self.modules[1:],
                                  dtype=self.dtype, name="inner")(low1, train)
        else:
            low2 = low1
            for i in range(next_mod):
                low2 = Residual(next_dim, dtype=self.dtype,
                                name=f"low2_{i}")(low2, train)

        low3 = low2
        for i in range(curr_mod - 1):
            low3 = Residual(next_dim, dtype=self.dtype,
                            name=f"low3_{i}")(low3, train)
        low3 = Residual(curr_dim, dtype=self.dtype,
                        name=f"low3_{curr_mod - 1}")(low3, train)

        b, h, w, c = low3.shape
        up2 = jax.image.resize(low3, (b, h * 2, w * 2, c), method="nearest")
        return up1 + up2


class HourglassNet(nn.Module):
    """Full stacked hourglass with per-stack heads."""
    heads: Dict[str, int]
    num_stacks: int = 1
    dims: Sequence[int] = (256, 256, 384, 384, 384, 512)
    modules: Sequence[int] = (2, 2, 2, 2, 2, 4)
    head_conv: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[Dict[str, jnp.ndarray]]:
        curr_dim = self.dims[0]
        inter = ConvBN(128, kernel=7, stride=2, dtype=self.dtype,
                       name="pre_conv")(x, train)
        inter = Residual(256, stride=2, dtype=self.dtype,
                         name="pre_res")(inter, train)

        outs = []
        for s in range(self.num_stacks):
            kp = HourglassLevel(self.dims, self.modules, dtype=self.dtype,
                                name=f"kp_{s}")(inter, train)
            cnv = ConvBN(256, kernel=3, dtype=self.dtype,
                         name=f"cnv_{s}")(kp, train)
            outs.append(
                HeadStack(self.heads, self.head_conv, dtype=self.dtype,
                          name=f"heads_{s}")(cnv)
            )
            if s < self.num_stacks - 1:
                inter_ = ConvBN(curr_dim, kernel=1, relu=False,
                                dtype=self.dtype,
                                name=f"inter__{s}")(inter, train)
                cnv_ = ConvBN(curr_dim, kernel=1, relu=False,
                              dtype=self.dtype, name=f"cnv__{s}")(cnv, train)
                inter = nn.relu(inter_ + cnv_)
                inter = Residual(curr_dim, dtype=self.dtype,
                                 name=f"inter_{s}")(inter, train)
        return outs
