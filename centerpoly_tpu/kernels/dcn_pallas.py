"""Pallas TPU kernel for DCNv2 modulated deformable convolution.

The flagship custom kernel (reference consumes an external CUDA extension,
src/lib/models/networks/pose_dla_dcn.py:16,354).  The XLA formulation in
models/deform_conv.py materializes the (B, H, W, 9, C) bilinear-sampled
tensor in HBM between the gather and the contraction; this kernel keeps
the whole feature map resident in VMEM, performs the 4 corner gathers, the
bilinear/mask weighting, and the 9 per-tap MXU matmuls in one fused pass —
halving HBM traffic for the dominant IDAUp layers.

Forward only: the backward pass reuses the XLA path's autodiff (exact same
math), wired through jax.custom_vjp in models/deform_conv.py.

Layout notes:
  * the feature map is viewed as an (H*W, C) row table in VMEM; corner
    samples become row gathers (`take_along_axis` over the sublane axis),
    the one gather form Mosaic lowers to the hardware gather path;
  * the tap contraction runs as 9 (N, C) @ (C, Cout) MXU matmuls (static
    python loop), avoiding a lane-dimension reshape;
  * grid = (B, H / TH): row tiles sized so the gathered corner buffer
    stays within VMEM.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

PALLAS_DCN_ENV = "CENTERPOLY_PALLAS_DCN"

# per-(shape) support cache after a compile probe
_PROBED: dict = {}


def _row_tile(h: int, w: int, c: int, budget_bytes: int = 3 << 20) -> int:
    """Rows per grid step: corner buffer (TH*W*9, C) f32 under budget."""
    th = max(1, budget_bytes // max(1, w * 9 * c * 4))
    th = min(th, h)
    while h % th:
        th -= 1
    return max(th, 1)


def _kernel(x_ref, off_ref, mask_ref, w_ref, b_ref, o_ref, *,
            H, W, C, Cout, TH):
    from jax.experimental import pallas as pl  # noqa: F401

    table = x_ref[0].reshape(H * W, C)
    i = pl.program_id(1)

    off = off_ref[0].reshape(TH, W, 9, 2).astype(jnp.float32)
    m = mask_ref[0].reshape(TH * W * 9, 1)

    y_base = (i * TH).astype(jnp.float32)
    yy = jax.lax.broadcasted_iota(jnp.float32, (TH, W, 9), 0) + y_base
    xx = jax.lax.broadcasted_iota(jnp.float32, (TH, W, 9), 1)
    tap = jax.lax.broadcasted_iota(jnp.float32, (TH, W, 9), 2)
    ky = jnp.floor(tap / 3.0) - 1.0
    kx = jnp.mod(tap, 3.0) - 1.0

    sy = yy + ky + off[..., 0]
    sx = xx + kx + off[..., 1]
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    fy = (sy - y0).reshape(TH * W * 9, 1)
    fx = (sx - x0).reshape(TH * W * 9, 1)
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)

    n = TH * W * 9

    def corner(dy, dx, wgt):
        yi = y0 + dy
        xi = x0 + dx
        inb = ((yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)).reshape(n, 1)
        idx = (jnp.clip(yi, 0, H - 1) * W
               + jnp.clip(xi, 0, W - 1)).reshape(n, 1)
        g = jnp.take_along_axis(
            table, jnp.broadcast_to(idx, (n, C)), axis=0)
        return g.astype(jnp.float32) * (wgt * inb.astype(jnp.float32))

    sampled = corner(0, 0, (1 - fy) * (1 - fx))
    sampled += corner(0, 1, (1 - fy) * fx)
    sampled += corner(1, 0, fy * (1 - fx))
    sampled += corner(1, 1, fy * fx)
    sampled *= m.astype(jnp.float32)

    # 9 per-tap MXU matmuls: sampled rows are pixel-major x tap-major
    sampled = sampled.reshape(TH * W, 9, C)
    weights = w_ref[:].astype(jnp.float32)  # (9, C, Cout)
    acc = jnp.zeros((TH * W, Cout), jnp.float32)
    for k in range(9):
        acc += jnp.dot(sampled[:, k, :], weights[k],
                       preferred_element_type=jnp.float32)
    acc += b_ref[:].astype(jnp.float32)
    o_ref[0] = acc.reshape(TH, W, Cout).astype(o_ref.dtype)


def _deform_conv2d_pallas_impl(x, offsets, masks, weights, bias):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    cout = weights.shape[-1]
    th = _row_tile(h, w, c)
    kern = functools.partial(_kernel, H=h, W=w, C=c, Cout=cout, TH=th)
    grid = (b, h // th)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda bi, i: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w, 18), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w, 9), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c, cout), lambda bi, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout,), lambda bi, i: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w, cout),
                               lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
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


def pallas_supported(h: int, w: int, c: int, cout: int,
                     interpret_ok: bool = False) -> bool:
    """True when the Pallas DCN path should be used for this shape.

    Checks platform + an opt-out env var + a one-time compile probe per
    shape class (Mosaic support for the gather form can vary by version).
    """
    env = os.environ.get(PALLAS_DCN_ENV, "auto").lower()
    if env in ("0", "off", "false"):
        return False
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    if platform != "tpu" and not interpret_ok:
        return False
    # VMEM residency requirement for the table view
    if h * w * c * x_bytes_guess() > (10 << 20):
        return False
    key = (h, w, c, cout)
    if key in _PROBED:
        return _PROBED[key]
    try:
        b = 1
        xp = jnp.zeros((b, h, w, c), jnp.bfloat16)
        off = jnp.zeros((b, h, w, 18), jnp.float32)
        mk = jnp.ones((b, h, w, 9), jnp.float32)
        wt = jnp.zeros((3, 3, c, cout), jnp.bfloat16)
        bs = jnp.zeros((cout,), jnp.bfloat16)
        jax.jit(deform_conv2d_pallas).lower(
            xp, off, mk, wt, bs).compile()
        _PROBED[key] = True
    except Exception:
        _PROBED[key] = False
    return _PROBED[key]


def x_bytes_guess() -> int:
    return 2  # bf16 activations on the TPU path
