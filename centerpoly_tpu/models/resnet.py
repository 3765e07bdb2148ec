"""ResNet backbones with deconv upsampling (SimpleBaselines style).

Behavioral reference: src/lib/models/networks/msra_resnet.py (res_18 /
res_101: ResNet trunk + three 4x4 stride-2 deconv stages to stride 4) and
resnet_dcn.py (resdcn_18 / resdcn_101: each deconv stage preceded by a
DCNv2 3x3).  NHWC Flax.
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import ConvBN, BN_MOMENTUM
from .deform_conv import DCNv2
from .heads import HeadStack


class Bottleneck(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = ConvBN(self.features, 1, dtype=self.dtype)(x, train)
        out = ConvBN(self.features, 3, stride=self.stride,
                     dtype=self.dtype)(out, train)
        out = ConvBN(self.features * 4, 1, relu=False,
                     dtype=self.dtype)(out, train)
        if self.stride != 1 or x.shape[-1] != self.features * 4:
            x = ConvBN(self.features * 4, 1, stride=self.stride, relu=False,
                       dtype=self.dtype, name="downsample")(x, train)
        return nn.relu(out + x)


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = ConvBN(self.features, 3, stride=self.stride,
                     dtype=self.dtype)(x, train)
        out = ConvBN(self.features, 3, relu=False, dtype=self.dtype)(out, train)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = ConvBN(self.features, 1, stride=self.stride, relu=False,
                       dtype=self.dtype, name="downsample")(x, train)
        return nn.relu(out + x)


RESNET_SPECS = {
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (Bottleneck, (3, 4, 6, 3)),
    101: (Bottleneck, (3, 4, 23, 3)),
}


class Deconv(nn.Module):
    """4x4 stride-2 transposed conv + BN + ReLU (one upsample stage)."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.ConvTranspose(self.features, (4, 4), strides=(2, 2),
                             padding="SAME", use_bias=False,
                             dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         dtype=self.dtype)(x)
        return nn.relu(x)


class ResNetDet(nn.Module):
    """ResNet trunk -> 3 deconv stages -> heads at stride 4."""
    heads: Dict[str, int]
    num_layers: int = 18
    head_conv: int = 64
    use_dcn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[Dict[str, jnp.ndarray]]:
        block, layers = RESNET_SPECS[self.num_layers]
        x = ConvBN(64, kernel=7, stride=2, dtype=self.dtype,
                   name="stem")(x, train)
        # torch MaxPool2d(3, 2, padding=1): symmetric padding, not "SAME"
        # (SAME pads (0,1) at stride 2, shifting the grid one pixel)
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))
        for stage, (n_blocks, feats) in enumerate(
                zip(layers, (64, 128, 256, 512))):
            for i in range(n_blocks):
                stride = 2 if (i == 0 and stage > 0) else 1
                x = block(feats, stride=stride, dtype=self.dtype,
                          name=f"layer{stage + 1}_{i}")(x, train)
        # deconv widths: msra_resnet.py:126-130 uses [256, 256, 256];
        # resnet_dcn.py:149-153 narrows to [256, 128, 64]
        widths = (256, 128, 64) if self.use_dcn else (256, 256, 256)
        for i, feats in enumerate(widths):
            if self.use_dcn:
                x = DCNv2(feats, dtype=self.dtype, name=f"dcn_{i}")(x, train)
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=BN_MOMENTUM, dtype=self.dtype,
                                 name=f"dcn_bn_{i}")(x)
                x = nn.relu(x)
            x = Deconv(feats, dtype=self.dtype, name=f"deconv_{i}")(x, train)
        z = HeadStack(self.heads, self.head_conv, dtype=self.dtype,
                      name="heads")(x)
        return [z]
