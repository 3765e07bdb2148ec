"""Pallas TPU kernel for DCNv2 modulated deformable convolution.

The flagship custom kernel (reference consumes an external CUDA extension,
src/lib/models/networks/pose_dla_dcn.py:16,354).  The XLA formulation in
models/deform_conv.py materializes the (B, H, W, 9, C) bilinear-sampled
tensor in HBM between the gather and the contraction; this kernel keeps
the whole feature map resident in VMEM and fuses, per (tap, corner), the
hardware row-gather, the bilinear/mask weighting, and an MXU matmul into
an on-chip f32 accumulator — 36 gather+matmul pairs, no HBM intermediate.

Mosaic's gather primitive is an element-wise same-shape gather (indices
shape == operand shape): each gather therefore pulls exactly H*W rows
from the (H*W, C) table view, which is also why the grid is (batch,) and
the full map lives in VMEM (all DLA IDAUp levels fit).

Forward only: the backward pass reuses the XLA path's autodiff (exact
same math), wired through jax.custom_vjp in models/deform_conv.py.

TOOLCHAIN STATUS: the kernel is verified against the XLA oracle in Pallas
interpret mode (tests/test_dcn_pallas.py), but the current Mosaic build in
this image crashes on *any* sublane-axis `take_along_axis` (the compile
helper exits 1 even for a bare 1024-row gather; only the 128-lane shuffle
form compiles).  `pallas_supported` therefore probes a real compile per
shape and the DCNv2 module falls back to the XLA formulation — which this
repo has measured at 135x the reference baseline end-to-end, so the
fallback costs nothing today.  When the toolchain's gather lands, the
probe flips the fused kernel on with no code change.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

PALLAS_DCN_ENV = "CENTERPOLY_PALLAS_DCN"

# per-shape support cache after a compile probe
_PROBED: dict = {}


def _kernel(x_ref, off_ref, mask_ref, w_ref, b_ref, o_ref, *,
            H, W, C, Cout):
    from jax.experimental import pallas as pl  # noqa: F401

    n = H * W
    table = x_ref[0].reshape(n, C)
    off = off_ref[0].reshape(n, 18).astype(jnp.float32)
    masks = mask_ref[0].reshape(n, 9).astype(jnp.float32)

    # iota must be integer on TPU; cast after
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0).reshape(
        n, 1).astype(jnp.float32)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1).reshape(
        n, 1).astype(jnp.float32)

    # MXU operands in the activation dtype (bf16 in production; f32 when
    # the caller runs the kernel in f32 for oracle comparisons)
    cdt = x_ref.dtype
    acc = jnp.zeros((n, Cout), jnp.float32)
    for k in range(9):
        ky = float(k // 3 - 1)
        kx = float(k % 3 - 1)
        sy = yy + ky + off[:, 2 * k:2 * k + 1]
        sx = xx + kx + off[:, 2 * k + 1:2 * k + 2]
        y0 = jnp.floor(sy)
        x0 = jnp.floor(sx)
        fy = sy - y0
        fx = sx - x0
        m = masks[:, k:k + 1]
        w_k = w_ref[k].astype(cdt)  # (C, Cout)
        for dy, dx, wgt in ((0, 0, (1 - fy) * (1 - fx)),
                            (0, 1, (1 - fy) * fx),
                            (1, 0, fy * (1 - fx)),
                            (1, 1, fy * fx)):
            yi = y0 + dy
            xi = x0 + dx
            inb = ((yi >= 0) & (yi < H) & (xi >= 0) & (xi < W))
            idx = (jnp.clip(yi, 0, H - 1) * W
                   + jnp.clip(xi, 0, W - 1)).astype(jnp.int32)
            g = jnp.take_along_axis(
                table, jnp.broadcast_to(idx, (n, C)), axis=0)
            scale = (wgt * m * inb.astype(jnp.float32)).astype(cdt)
            acc += jnp.dot(g.astype(cdt) * scale, w_k,
                           preferred_element_type=jnp.float32)
    acc += b_ref[:].astype(jnp.float32)
    o_ref[0] = acc.reshape(H, W, Cout).astype(o_ref.dtype)


def _deform_conv2d_pallas_impl(x, offsets, masks, weights, bias):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    cout = weights.shape[-1]
    kern = functools.partial(_kernel, H=h, W=w, C=c, Cout=cout)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, 18), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, 9), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c, cout), lambda bi: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout,), lambda bi: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, cout), lambda bi: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * 9 * c * cout,
            bytes_accessed=(b * h * w * c * 2 * 5
                            + b * h * w * 27 * 4
                            + b * h * w * cout * 2),
            transcendentals=0,
        ),
    )(x, offsets, masks, weights.reshape(9, c, cout), bias)


def deform_conv2d_pallas(x, offsets, masks, weights, bias):
    """Fused DCNv2 forward. Same contract as deform_conv.deform_conv2d:
    x (B,H,W,C); offsets (B,H,W,18) tap-major (dy,dx); masks (B,H,W,9)
    already sigmoided; weights (3,3,C,Cout); bias (Cout,)."""
    if bias is None:
        bias = jnp.zeros((weights.shape[-1],), x.dtype)
    return _deform_conv2d_pallas_impl(x, offsets, masks, weights, bias)


def pallas_supported(h: int, w: int, c: int, cout: int) -> bool:
    """True when the Pallas DCN path should be used for this shape.

    Checks platform + the opt-out env var + a one-time compile probe per
    shape (Mosaic support for the gather form varies by version/shape).
    """
    env = os.environ.get(PALLAS_DCN_ENV, "auto").lower()
    if env in ("0", "off", "false"):
        return False
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    if platform != "tpu":
        return False
    key = (h, w, c, cout)
    if key in _PROBED:
        return _PROBED[key]
    try:
        xp = jnp.zeros((1, h, w, c), jnp.bfloat16)
        off = jnp.zeros((1, h, w, 18), jnp.float32)
        mk = jnp.ones((1, h, w, 9), jnp.float32)
        wt = jnp.zeros((3, 3, c, cout), jnp.bfloat16)
        bs = jnp.zeros((cout,), jnp.bfloat16)
        jax.jit(deform_conv2d_pallas).lower(
            xp, off, mk, wt, bs).compile()
        _PROBED[key] = True
    except Exception:
        _PROBED[key] = False
    return _PROBED[key]
