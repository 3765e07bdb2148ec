"""Shared Flax building blocks (NHWC, TPU-friendly).

Conv + BatchNorm + ReLU blocks and residuals used by every backbone.
BatchNorm uses momentum 0.9 (= reference BN_MOMENTUM 0.1 in torch's
convention, pose_dla_dcn.py:18) and per-replica statistics, matching the
reference's DataParallel-local BN.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax.numpy as jnp
import flax.linen as nn

# torch BN momentum 0.1 == flax momentum 0.9 (ema keeps `momentum` fraction)
BN_MOMENTUM = 0.9


class ConvBN(nn.Module):
    """Conv -> BatchNorm -> optional ReLU."""
    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    use_bn: bool = True
    relu: bool = True
    use_bias: Optional[bool] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_bias = (not self.use_bn) if self.use_bias is None else self.use_bias
        # torch-style symmetric padding (pad = dilation * (k-1)//2), NOT
        # "SAME": for stride>1 SAME pads asymmetrically (lo=0) which shifts
        # the sample grid one pixel vs the reference and breaks checkpoint
        # import parity.
        pad = self.dilation * (self.kernel // 2)
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            kernel_dilation=(self.dilation, self.dilation),
            padding=((pad, pad), (pad, pad)),
            use_bias=use_bias,
            dtype=self.dtype,
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=BN_MOMENTUM,
                dtype=self.dtype,
            )(x)
        if self.relu:
            x = nn.relu(x)
        return x


class Residual(nn.Module):
    """Basic 3x3-3x3 residual block (hourglass `residual` / DLA BasicBlock)."""
    features: int
    stride: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, residual=None):
        out = ConvBN(self.features, 3, self.stride, self.dilation,
                     dtype=self.dtype)(x, train)
        out = ConvBN(self.features, 3, 1, self.dilation, relu=False,
                     dtype=self.dtype)(out, train)
        if residual is None:
            if self.stride != 1 or x.shape[-1] != self.features:
                residual = ConvBN(self.features, 1, self.stride, relu=False,
                                  dtype=self.dtype)(x, train)
            else:
                residual = x
        return nn.relu(out + residual)


def bilinear_upsample_kernel(size: int) -> jnp.ndarray:
    """1-channel bilinear kernel used to init grouped transposed convs
    (ref pose_dla_dcn.py:335-344)."""
    import numpy as np

    f = int(np.ceil(size / 2))
    c = (2 * f - 1 - f % 2) / (2.0 * f)
    w = np.zeros((size, size), dtype=np.float32)
    for i in range(size):
        for j in range(size):
            w[i, j] = (1 - abs(i / f - c)) * (1 - abs(j / f - c))
    return jnp.asarray(w)


class BilinearUpsample(nn.Module):
    """x2^k upsample. The reference uses a bilinear-initialized grouped
    ConvTranspose2d that stays (in practice) a fixed bilinear filter; on TPU
    a resize is cheaper and fuses better."""
    factor: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        import jax
        return jax.image.resize(
            x, (b, h * self.factor, w * self.factor, c), method="bilinear"
        )
