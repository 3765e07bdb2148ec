"""Shared Flax building blocks (NHWC, TPU-friendly).

Conv + BatchNorm + ReLU blocks and residuals used by every backbone.
BatchNorm uses momentum 0.9 (= reference BN_MOMENTUM 0.1 in torch's
convention, pose_dla_dcn.py:18) and per-replica statistics, matching the
reference's DataParallel-local BN.
"""
from __future__ import annotations

import os
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

# torch BN momentum 0.1 == flax momentum 0.9 (ema keeps `momentum` fraction)
BN_MOMENTUM = 0.9


def stem_layout():
    """Layout override for LOW-CHANNEL convs (the high-res stem).

    NHWC puts C on the 128-wide lane dimension, so a C=16 stem conv
    wastes 7/8 of every vector register and MXU tile
    (experiments/probe_stem_layout.py).  CENTERPOLY_STEM_LAYOUT selects
    a mathematically identical formulation for convs whose channel
    counts are all <= the threshold:

      nhwc (default)    plain nn.Conv
      nchw[:max_c]      transpose so W rides the lanes, conv in
                        NCHW/OIHW, transpose back
      im2col[:max_c]    conv_general_dilated_patches + one matmul with
                        K = k*k*cin on the contraction (no lane padding
                        of the tiny cin)

    max_c defaults to 32 (covers the DLA 3->16->16->32 stem).  The
    parameter tree is IDENTICAL in every mode — checkpoints and torch
    import are layout-oblivious.
    """
    env = os.environ.get("CENTERPOLY_STEM_LAYOUT", "nhwc").lower()
    mode, _, thresh = env.partition(":")
    if mode not in ("nchw", "im2col"):
        return "nhwc", 0
    try:
        max_c = int(thresh) if thresh else 32
    except ValueError:
        import warnings
        warnings.warn(f"CENTERPOLY_STEM_LAYOUT={env!r}: bad threshold "
                      f"{thresh!r}; using 32")
        max_c = 32
    return mode, max_c


class _LayoutConv(nn.Module):
    """nn.Conv-compatible conv computed in an alternate layout.

    Same parameter names/shapes/init as the nn.Conv it replaces (kernel
    HWIO + bias), so it must be instantiated with name="Conv_0" to keep
    the checkpoint tree identical.
    """
    features: int
    kernel_size: tuple
    strides: tuple
    kernel_dilation: tuple
    padding: tuple
    use_bias: bool
    dtype: Any
    mode: str  # "nchw" | "im2col"

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, cin, self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        kernel = kernel.astype(self.dtype)
        x = x.astype(self.dtype)
        if self.mode == "nchw":
            y = jax.lax.conv_general_dilated(
                jnp.transpose(x, (0, 3, 1, 2)),
                jnp.transpose(kernel, (3, 2, 0, 1)),
                self.strides, self.padding,
                rhs_dilation=self.kernel_dilation,
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
            y = jnp.transpose(y, (0, 2, 3, 1))
        else:  # im2col
            patches = jax.lax.conv_general_dilated_patches(
                x, (kh, kw), self.strides, self.padding,
                rhs_dilation=self.kernel_dilation,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            # patches feature order is (cin, kh, kw) -> match it
            wf = jnp.transpose(kernel, (2, 0, 1, 3)).reshape(
                cin * kh * kw, self.features)
            y = jnp.einsum("bhwf,fo->bhwo", patches, wf)
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


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
        mode, max_c = stem_layout()
        if mode != "nhwc" and max(x.shape[-1], self.features) <= max_c:
            # low-channel conv: identical math in a lane-efficient
            # layout; name="Conv_0" keeps the param tree byte-identical
            x = _LayoutConv(
                self.features, (self.kernel, self.kernel),
                (self.stride, self.stride),
                (self.dilation, self.dilation),
                ((pad, pad), (pad, pad)),
                use_bias, self.dtype, mode, name="Conv_0")(x)
        else:
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
