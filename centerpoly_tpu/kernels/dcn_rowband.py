"""Row-band one-hot-matmul Pallas DCNv2: exact columns, banded rows.

Third-generation TPU kernel for the reference's CUDA modulated
deformable conv (src/lib/models/networks/pose_dla_dcn.py:16,354), built
for the Mosaic compile surface bisected in
experiments/probe_mosaic_gather.py: every gather form crashes, but
matmuls, iota compares, static slices and 2-D elementwise all compile.

The key identity: bilinear sampling factorizes.  A sample at
(y + ky + oy, x + kx + ox) is

    sum_r  hat(dy - r) * [ sum_j hat(sx - j) * x[y + r, j, :] ]

with dy = ky + oy the RELATIVE row displacement and sx = x + kx + ox the
ABSOLUTE sample column; each hat has <= 2 nonzero integer arguments.  So:

  * COLUMNS are selected EXACTLY (no bound on x-offsets) by a dense
    interpolation matrix built arithmetically from iota compares —
    B2[j, p] = hat(sx[p] - j) — and contracted on the MXU:
    T = band @ B2.  One matmul does the whole row's x-interpolation
    for every input row of the band at once.  This is the "one-hot
    matmul gather" the gather unit can't give us, with the one-hot
    never materialized from indices (no gather to build it either).
  * ROWS are swept over a bounded band: y-offsets clamp to [-R, R]
    (x-offsets stay exact), so output row y only reads input rows
    y - (R+1) .. y + (R+2).  XLA materializes that band as D = 2R+4
    row-shifted zero-padded copies laid out (B*H, D*C, W); the kernel's
    row combination sum_r wy_r * T[rC:(r+1)C] is a cheap VPU reduce of
    statically-sliced chunks.  (The D-th chunk pads the band to an even
    row count; its hat weight is identically zero since |dy| <= R+1.)

Versus the dense halo kernel (dcn_halo.py, the previous generation):
the (2R+3)^2 = 121-361 displacement VPU sweep collapses to ONE MXU
matmul per tap plus a (2R+3)-chunk weighted sum — ~(2R+3)x less sweep
work, moved from the VPU to the MXU where the flops are free.  Per
DLA-34 stride-4 node (128, 256, 64)->64 at R=4 the kernel does 9 matmuls
of (768, 256) @ (256, 256) per output row: ~0.9 GFLOP/row-step, fully
MXU-shaped.

Semantics: identical to models.deform_conv.deform_conv2d with
y-offsets pre-clamped to [-R, R] (zero padding outside the image either
way; x-offsets unbounded/exact).  deform_conv2d_rowband_ref is the
bit-exact jax-level oracle used by the tests.  The backward pass is the
XLA autodiff of the oracle (custom_vjp recomputes with the production
quad/tapwise formulation); training keeps the XLA path as its default,
this kernel targets the inference hot path.

Layout notes (Mosaic constraints, same ground rules as dcn_halo.py):
everything in-kernel is 2-D; offsets/masks arrive transposed
(B*H, 18|9, W) so per-tap slices are (1, W) sublane rows (lane-dim-1
BLOCK layouts crash, (1, W) value slices are fine); weights arrive
(9, Cout, C) and are indexed with the static tap number; the output is
(B*H, Cout, W) and XLA transposes it back.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_MAX_OFFSET = 4

_VMEM_BUDGET = 96 * 1024 * 1024


def _tap_grid():
    ky = np.repeat(np.arange(-1, 2, dtype=np.float32), 3)
    kx = np.tile(np.arange(-1, 2, dtype=np.float32), 3)
    return ky, kx


def _clamp_y(offsets, r: float):
    """Clamp only the y components ([..., 0::2]) to [-r, r]."""
    oy = jnp.clip(offsets[..., 0::2], -r, r)
    ox = offsets[..., 1::2]
    return jnp.stack([oy, ox], axis=-1).reshape(offsets.shape)


def deform_conv2d_rowband_ref(x, offsets, masks, weights, bias,
                              max_offset: int = DEFAULT_MAX_OFFSET):
    """jax-level oracle: XLA deform_conv2d on y-clamped offsets."""
    from ..models.deform_conv import deform_conv2d
    return deform_conv2d(x, _clamp_y(offsets, float(max_offset)),
                         masks, weights, bias)


def _rowband_kernel(band_ref, off_ref, mask_ref, w_ref, b_ref, o_ref,
                    *, C, Cout, W, R):
    """One output row: 9 taps x (one MXU column-interp matmul +
    a (2R+3)-chunk row-weighted reduce + the 3x3-tap contraction)."""
    D = 2 * R + 4
    band = band_ref[0]                                   # (D*C, W)
    cdt = band.dtype
    iota_j = jax.lax.broadcasted_iota(jnp.float32, (W, W), 0)
    p_idx = jax.lax.broadcasted_iota(jnp.float32, (1, W), 1)
    ky, kx = _tap_grid()
    acc = jnp.broadcast_to(b_ref[:].astype(jnp.float32), (Cout, W))
    for k in range(9):
        oy = off_ref[0][2 * k:2 * k + 1, :].astype(jnp.float32)   # (1, W)
        ox = off_ref[0][2 * k + 1:2 * k + 2, :].astype(jnp.float32)
        dy = oy + ky[k]                  # relative row displacement
        sx = p_idx + ox + kx[k]          # absolute sample column
        x0 = jnp.floor(sx)
        fx = sx - x0
        # arithmetic one-hot interpolation: B2[j, p] = hat(sx[p] - j);
        # out-of-image x corners drop out (no iota row equals them) —
        # exact zero-pad semantics with NO x-offset bound
        b2 = ((iota_j == x0).astype(jnp.float32) * (1.0 - fx)
              + (iota_j == x0 + 1.0).astype(jnp.float32) * fx)
        t = jax.lax.dot(band, b2.astype(cdt),
                        preferred_element_type=jnp.float32)  # (D*C, W)
        samp = jnp.zeros((C, W), jnp.float32)
        for du in range(D):
            # wy == 0 for du == D-1 (the pad chunk): |dy| <= R+1 always
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(dy - float(du - (R + 1))))
            samp = samp + t[du * C:(du + 1) * C, :] * wy
        m_k = mask_ref[0][k:k + 1, :].astype(jnp.float32)
        acc = acc + jax.lax.dot(w_ref[k].astype(cdt),
                                (samp * m_k).astype(cdt),
                                preferred_element_type=jnp.float32)
    o_ref[0] = acc


def _fwd_vmem(c: int, cout: int, w: int, R: int, itemsize: int) -> int:
    """Rough per-step VMEM bound (double-buffered blocks + temps)."""
    d = 2 * R + 4
    band = d * c * w * itemsize
    t = d * c * w * 4
    b2 = w * w * (4 + itemsize)
    samp = c * w * 4
    acc = cout * w * 4
    wts = 9 * cout * c * itemsize
    return 2 * band + t + b2 + samp + acc + wts + 18 * w * 4 + 9 * w * 4


def _pallas_fwd(x, offsets, masks, weights, bias, R, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    cout = weights.shape[-1]
    D = 2 * R + 4
    if _fwd_vmem(c, cout, w, R, x.dtype.itemsize) > _VMEM_BUDGET:
        raise ValueError(f"rowband kernel: shape {(h, w, c, cout)} at "
                         f"R={R} exceeds VMEM budget")
    off = _clamp_y(offsets, float(R)).astype(jnp.float32)
    xt = jnp.transpose(x, (0, 1, 3, 2))                  # (B, H, C, W)
    xt = jnp.pad(xt, ((0, 0), (R + 1, R + 2), (0, 0), (0, 0)))
    band = jnp.concatenate([xt[:, d:d + h] for d in range(D)], axis=2)
    band = band.reshape(b * h, D * c, w)
    offt = jnp.transpose(off, (0, 1, 3, 2)).reshape(b * h, 18, w)
    maskt = jnp.transpose(masks.astype(jnp.float32),
                          (0, 1, 3, 2)).reshape(b * h, 9, w)
    wts = jnp.transpose(weights.reshape(9, c, cout), (0, 2, 1))
    kern = functools.partial(_rowband_kernel, C=c, Cout=cout, W=w, R=R)
    out = pl.pallas_call(
        kern,
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, D * c, w), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 18, w), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 9, w), lambda i: (i, 0, 0)),
            pl.BlockSpec((9, cout, c), lambda i: (0, 0, 0)),
            pl.BlockSpec((cout, 1), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, cout, w), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, cout, w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(band, offt, maskt, wts,
      jnp.reshape(bias, (cout, 1)).astype(jnp.float32))
    out = out.reshape(b, h, cout, w)
    return jnp.transpose(out, (0, 1, 3, 2)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def deform_conv2d_rowband(x, offsets, masks, weights, bias,
                          max_offset: int = DEFAULT_MAX_OFFSET,
                          interpret: bool = False):
    """Row-band Pallas DCNv2 forward; backward = XLA autodiff of the
    oracle (same math: y-clamped offsets, exact x).

    Same contract as deform_conv2d with y-offsets clamped to
    [-max_offset, max_offset]; deform_conv2d_rowband_ref is the oracle.
    """
    if bias is None:
        bias = jnp.zeros((weights.shape[-1],), x.dtype)
    return _pallas_fwd(x, offsets, masks, weights, bias, max_offset,
                       interpret)


def _rowband_fwd_rule(x, offsets, masks, weights, bias, max_offset,
                      interpret):
    out = deform_conv2d_rowband(x, offsets, masks, weights, bias,
                                max_offset, interpret)
    return out, (x, offsets, masks, weights, bias)


def _rowband_bwd_rule(max_offset, interpret, res, g):
    x, offsets, masks, weights, bias = res
    if bias is None:
        bias = jnp.zeros((weights.shape[-1],), x.dtype)
    _, vjp = jax.vjp(
        lambda *a: deform_conv2d_rowband_ref(*a, max_offset),
        x, offsets, masks, weights, bias)
    return vjp(g.astype(x.dtype))


deform_conv2d_rowband.defvjp(_rowband_fwd_rule, _rowband_bwd_rule)


_ROWBAND_PROBED: dict = {}


def rowband_supported(h: int, w: int, c: int, cout: int,
                      max_offset: int = DEFAULT_MAX_OFFSET,
                      dtype=jnp.bfloat16) -> bool:
    """Compile-probe the rowband kernel for a shape on this backend
    with the activation dtype that will actually run."""
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    if platform != "tpu":
        return False
    dtype = jnp.dtype(dtype)
    key = (h, w, c, cout, max_offset, dtype.name)
    if key not in _ROWBAND_PROBED:
        if _fwd_vmem(c, cout, w, max_offset,
                     dtype.itemsize) > _VMEM_BUDGET:
            _ROWBAND_PROBED[key] = False
            return False
        try:
            xp = jnp.zeros((1, h, w, c), dtype)
            off = jnp.zeros((1, h, w, 18), jnp.float32)
            mk = jnp.ones((1, h, w, 9), jnp.float32)
            wt = jnp.zeros((3, 3, c, cout), dtype)
            bs = jnp.zeros((cout,), dtype)
            jax.jit(functools.partial(
                deform_conv2d_rowband, max_offset=max_offset)).lower(
                    xp, off, mk, wt, bs).compile()
            _ROWBAND_PROBED[key] = True
        except Exception:
            _ROWBAND_PROBED[key] = False
    return _ROWBAND_PROBED[key]
