"""DLA-34 backbone with deformable-conv iterative deep aggregation.

Behavioral reference: src/lib/models/networks/pose_dla_dcn.py — DLA trunk
(levels [1,1,1,2,2,1], channels [16,32,64,128,256,512], :310-316), DLAUp /
IDAUp upsampling where every projection/node is a DCNv2 DeformConv
(:347-413), and a learnable grouped (depthwise) transposed conv upsample
with bilinear init (:335-344, 372-375).  `plain_upsample=True` gives the
DCN-free `dlav0`-style variant (reference dlav0.py) used as fallback.

All NHWC; the depthwise transposed conv is expressed as
`lax.conv_general_dilated` with lhs_dilation (TPU-native form of stride-f
transposed conv).
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import ConvBN, Residual, BN_MOMENTUM, bilinear_upsample_kernel
from .deform_conv import DeformConvBlock
from .heads import HeadStack


class Root(nn.Module):
    """Aggregation node: concat children -> 1x1 conv -> BN (+res) -> ReLU."""
    features: int
    residual: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, children: List[jnp.ndarray], train: bool = False):
        x = jnp.concatenate(children, axis=-1)
        x = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         dtype=self.dtype)(x)
        if self.residual:
            x = x + children[0]
        return nn.relu(x)


class Tree(nn.Module):
    """Recursive DLA tree (ref pose_dla_dcn.py:169-222)."""
    levels: int
    features: int
    stride: int = 1
    level_root: bool = False
    root_residual: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, children=None):
        children = [] if children is None else list(children)
        in_features = x.shape[-1]

        if self.stride > 1:
            bottom = nn.max_pool(x, (self.stride, self.stride),
                                 strides=(self.stride, self.stride))
        else:
            bottom = x
        if in_features != self.features:
            residual = ConvBN(self.features, 1, relu=False, dtype=self.dtype,
                              name="project")(bottom, train)
        else:
            residual = bottom
        if self.level_root:
            children.append(bottom)

        if self.levels == 1:
            x1 = Residual(self.features, stride=self.stride,
                          dtype=self.dtype, name="tree1")(
                x, train, residual=residual)
            x2 = Residual(self.features, dtype=self.dtype,
                          name="tree2")(x1, train, residual=x1)
            out = Root(self.features, residual=self.root_residual,
                       dtype=self.dtype, name="root")(
                [x2, x1] + children, train)
        else:
            x1 = Tree(self.levels - 1, self.features, stride=self.stride,
                      root_residual=self.root_residual, dtype=self.dtype,
                      name="tree1")(x, train)
            out = Tree(self.levels - 1, self.features,
                       root_residual=self.root_residual, dtype=self.dtype,
                       name="tree2")(x1, train, children=children + [x1])
        return out


class DLA(nn.Module):
    """DLA trunk: 6 feature levels at strides 1..32."""
    levels: Sequence[int] = (1, 1, 1, 2, 2, 1)
    channels: Sequence[int] = (16, 32, 64, 128, 256, 512)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        y = []
        x = ConvBN(self.channels[0], kernel=7, dtype=self.dtype,
                   name="base_layer")(x, train)
        # level0 / level1: plain conv stages
        for i in range(self.levels[0]):
            x = ConvBN(self.channels[0], 3, dtype=self.dtype,
                       name=f"level0_{i}")(x, train)
        y.append(x)
        for i in range(self.levels[1]):
            x = ConvBN(self.channels[1], 3, stride=2 if i == 0 else 1,
                       dtype=self.dtype, name=f"level1_{i}")(x, train)
        y.append(x)
        x = Tree(self.levels[2], self.channels[2], stride=2,
                 dtype=self.dtype, name="level2")(x, train)
        y.append(x)
        x = Tree(self.levels[3], self.channels[3], stride=2, level_root=True,
                 dtype=self.dtype, name="level3")(x, train)
        y.append(x)
        x = Tree(self.levels[4], self.channels[4], stride=2, level_root=True,
                 dtype=self.dtype, name="level4")(x, train)
        y.append(x)
        x = Tree(self.levels[5], self.channels[5], stride=2, level_root=True,
                 dtype=self.dtype, name="level5")(x, train)
        y.append(x)
        return y


class DepthwiseUpsample(nn.Module):
    """Learnable depthwise stride-f transposed conv, bilinear-initialized
    (ref pose_dla_dcn.py:372-375 grouped ConvTranspose2d + fill_up_weights).

    Expressed as lhs-dilated depthwise conv — the TPU-native formulation.
    """
    factor: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        f = self.factor
        if f == 1:
            return x
        k = 2 * f

        def init(key, shape, dtype=jnp.float32):
            w = bilinear_upsample_kernel(k)
            return jnp.broadcast_to(w[:, :, None, None], shape).astype(dtype)

        kernel = self.param("kernel", init, (k, k, 1, c))
        # transposed conv (stride f, pad f//2) == lhs_dilation f with
        # padding (k - 1 - f//2) on each side
        pad = k - 1 - f // 2
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            lhs_dilation=(f, f),
            rhs_dilation=(1, 1),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )
        return out


class IDAUp(nn.Module):
    """Iterative deep aggregation step (ref pose_dla_dcn.py:362-387).

    For layers[startp+1..endp): project to `features` (DCN), upsample, and
    merge with the previous layer through a DCN node.
    """
    features: int
    up_factors: Sequence[int]
    plain_upsample: bool = False
    dtype: Any = jnp.float32

    def _dcn(self, name):
        if self.plain_upsample:
            return ConvBN(self.features, 3, dtype=self.dtype, name=name)
        return DeformConvBlock(self.features, dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, layers: List[jnp.ndarray], train: bool = False):
        out = [layers[0]]
        for i in range(1, len(layers)):
            x = self._dcn(f"proj_{i}")(layers[i], train)
            x = DepthwiseUpsample(int(self.up_factors[i]), dtype=self.dtype,
                                  name=f"up_{i}")(x)
            x = self._dcn(f"node_{i}")(x + out[i - 1], train)
            out.append(x)
        return out


class DLASeg(nn.Module):
    """DLA-34 + DLAUp + final IDAUp + heads at stride `down_ratio`
    (ref pose_dla_dcn.py:427-482)."""
    heads: Dict[str, int]
    down_ratio: int = 4
    last_level: int = 5
    head_conv: int = 256
    plain_upsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[Dict[str, jnp.ndarray]]:
        first_level = int(np.log2(self.down_ratio))
        base = DLA(dtype=self.dtype, name="base")(x, train)
        channels = list(DLA.channels)

        # DLAUp: iteratively aggregate the deepest levels upward
        # (ref :390-413).  layers holds levels [first_level..5].
        layers = list(base[first_level:])
        n = len(layers)
        scales = [2 ** i for i in range(n)]
        out = [layers[-1]]
        in_list = layers
        for i in range(n - 1):
            j = n - i - 2  # aggregate layers[j:] onto layers[j]'s scale
            ida = IDAUp(
                channels[first_level + j],
                [s // scales[j] for s in scales[j:]],
                plain_upsample=self.plain_upsample,
                dtype=self.dtype,
                name=f"dla_up_ida_{i}",
            )
            merged = ida(in_list[j:], train)
            in_list = in_list[:j] + merged
            scales[j + 1:] = [scales[j]] * (n - j - 1)
            out.insert(0, in_list[-1])

        # final IDAUp over the first (last_level - first_level) outputs
        y = out[: self.last_level - first_level]
        y = IDAUp(
            channels[first_level],
            [2 ** i for i in range(self.last_level - first_level)],
            plain_upsample=self.plain_upsample,
            dtype=self.dtype,
            name="ida_up",
        )(y, train)

        z = HeadStack(self.heads, self.head_conv, dtype=self.dtype,
                      name="heads")(y[-1])
        return [z]
