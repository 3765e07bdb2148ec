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
bit-exact jax-level oracle used by the tests.  The backward pass is a
FUSED Pallas kernel too (_rowband_bwd_kernel): with T = band @ B2 the
whole cotangent chain is matmuls (dband = dT @ B2^T, dB2 = band^T @ dT)
plus f32 hat-derivative differencing for the offset grads; dW/dmask/db
are XLA einsums of the re-emitted per-tap samples, and dx is the
XLA-side adjoint of the band construction (D shifted slice-adds).
Verified against XLA autodiff of the oracle in interpret mode for all
five grads (tests/test_dcn_rowband.py).

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


def _pack_factor(z: int, w: int) -> int:
    """Lane-packing factor: pack P = 128//w independent z-rows per grid
    step when the image width underfills the 128-wide lane registers
    (measured 2026-08-19: the un-packed kernel LOSES to XLA only at the
    W=64 DLA shape, where every matmul runs at half lane occupancy).
    P is halved until it divides the row count; CENTERPOLY_ROWBAND_PACK=0
    is the A/B escape hatch."""
    import os
    if os.environ.get("CENTERPOLY_ROWBAND_PACK", "auto").lower() in (
            "0", "off", "false"):
        return 1
    p = 1
    while p * 2 * w <= 128:  # largest power of two with p*w <= 128
        p *= 2
    while p > 1 and z % p:
        p //= 2
    return p


def _pack_lanes(a, p: int):
    """(z, M, w) -> (z/p, M, p*w): the q-th of p consecutive z-rows
    lands in lane half [q*w, (q+1)*w) of one packed row."""
    if p == 1:
        return a
    z, m, w = a.shape
    return a.reshape(z // p, p, m, w).transpose(0, 2, 1, 3).reshape(
        z // p, m, p * w)


def _unpack_lanes(a, p: int):
    """Inverse of _pack_lanes: (z/p, M, p*w) -> (z, M, w)."""
    if p == 1:
        return a
    zp, m, pw = a.shape
    w = pw // p
    return a.reshape(zp, m, p, w).transpose(0, 2, 1, 3).reshape(
        zp * p, m, w)


def deform_conv2d_rowband_ref(x, offsets, masks, weights, bias,
                              max_offset: int = DEFAULT_MAX_OFFSET):
    """jax-level oracle: XLA deform_conv2d on y-clamped offsets."""
    from ..models.deform_conv import deform_conv2d
    return deform_conv2d(x, _clamp_y(offsets, float(max_offset)),
                         masks, weights, bias)


def _rowband_kernel(band_ref, off_ref, mask_ref, w_ref, b_ref, o_ref,
                    *, C, Cout, W, WImg, R):
    """P = W // WImg output rows (lane-packed): 9 taps x (one MXU
    column-interp matmul + a (2R+3)-chunk row-weighted reduce + the
    3x3-tap contraction).

    Lane packing: when the image width WImg < 128, P independent
    output rows share one grid step side by side on the lane axis
    (W = P*WImg), so the B2 contraction and the tap matmul fill the
    128-wide MXU instead of running P-fold more steps at 1/P lane
    occupancy.  Each row's sample columns live in its own lane half
    [q*WImg, (q+1)*WImg); the global iota makes sx land there
    automatically, and `same` masks the two cross-half corner cases
    (x0+1 crossing into the next half at the right edge, x0 crossing
    below at the left edge) which must read as zero padding."""
    D = 2 * R + 4
    band = band_ref[0]                                   # (D*C, W)
    cdt = band.dtype
    # Mosaic's tpu.iota only produces integer vectors (a float iota
    # fails the MLIR verifier — measured on-chip 2026-08-19); build
    # int32 and convert
    iota_j = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0).astype(
        jnp.float32)
    p_idx = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1).astype(
        jnp.float32)
    # same[j, p] = the j input column and p output pixel belong to the
    # same packed row (always true when W == WImg)
    same = (jnp.floor(iota_j / float(WImg))
            == jnp.floor(p_idx / float(WImg))).astype(jnp.float32)
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
        # out-of-image x corners drop out (no iota row equals them, or
        # the cross-half `same` mask kills them) — exact zero-pad
        # semantics with NO x-offset bound
        b2 = ((iota_j == x0).astype(jnp.float32) * (1.0 - fx)
              + (iota_j == x0 + 1.0).astype(jnp.float32) * fx) * same
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


def _rowband_bwd_kernel(band_ref, off_ref, gkm_ref, samp_ref, doff_ref,
                        dband_ref, dt_s, dband_s, *, C, W, WImg, R):
    """Fused backward for one output row.

    With T_k = band @ B2_k, samp_k = sum_du wy_du * T_k[duC:(du+1)C] and
    out = sum_k W_k^T (samp_k * m_k), the cotangent chain is all
    matmuls: given gkm_k = (W_k @ g) * m_k,

      dT_k[duC+c, p] = gkm_k[c, p] * wy_du[p]
      dband         += dT_k  @ B2_k^T     (contract on the p axis)
      dB2_k          = band^T @ dT_k      (contract on the band rows)
      d(ox)[p]       = sum_j dB2_k[j, p] * d/dsx hat(sx[p] - j)
      d(oy)[p]       = sum_du (sum_c gkm_k * T_k[du]) * d/dy hat(dy - r)

    samp_k is re-emitted for the XLA-side dW/dmask/db contractions
    (keeping them in-kernel is unnecessary VMEM pressure — same split
    as dcn_halo).  Hat derivatives difference in f32 before any store
    (the dcn_halo lesson: offset grads are differences of neighbor
    correlations and die in bf16).
    """
    D = 2 * R + 4
    band = band_ref[0]                                   # (D*C, W)
    cdt = band.dtype
    iota_j = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0).astype(
        jnp.float32)  # int iota then convert: Mosaic rejects float iota
    p_idx = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1).astype(
        jnp.float32)
    # lane-packing cross-half mask (see _rowband_kernel); pre-masking
    # hit0/hit1 keeps b2 and the d/dsx difference (hit1 - hit0)
    # consistent with the forward
    same = (jnp.floor(iota_j / float(WImg))
            == jnp.floor(p_idx / float(WImg))).astype(jnp.float32)
    ky, kx = _tap_grid()
    dband_s[:] = jnp.zeros((D * C, W), jnp.float32)
    for k in range(9):
        oy = off_ref[0][2 * k:2 * k + 1, :].astype(jnp.float32)
        ox = off_ref[0][2 * k + 1:2 * k + 2, :].astype(jnp.float32)
        dy = oy + ky[k]
        sx = p_idx + ox + kx[k]
        x0 = jnp.floor(sx)
        fx = sx - x0
        hit0 = (iota_j == x0).astype(jnp.float32) * same
        hit1 = (iota_j == x0 + 1.0).astype(jnp.float32) * same
        b2 = hit0 * (1.0 - fx) + hit1 * fx               # (W_j, W_p)
        t = jax.lax.dot(band, b2.astype(cdt),
                        preferred_element_type=jnp.float32)  # (D*C, W)
        gk = gkm_ref[0][k * C:(k + 1) * C, :].astype(jnp.float32)
        doff_y = jnp.zeros((1, W), jnp.float32)
        samp = jnp.zeros((C, W), jnp.float32)
        for du in range(D):
            r_rel = float(du - (R + 1))
            ay = dy - r_rel
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(ay))     # (1, W)
            t_du = t[du * C:(du + 1) * C, :]
            samp = samp + t_du * wy
            dt_s[du * C:(du + 1) * C, :] = gk * wy
            # d/d(dy) hat(ay) under the floor/frac convention the oracle
            # autodiffs: -1 on the floor cell [0,1), +1 on the ceil cell
            # [-1,0).  NOT -sign(ay): that is 0 at integer dy, which is
            # every pixel at offset init (conv_offset starts at zero) —
            # the one-sided derivative there is -1, not 0.
            dhy = jnp.where((ay >= 0.0) & (ay < 1.0), -1.0,
                            jnp.where((ay >= -1.0) & (ay < 0.0), 1.0,
                                      0.0))
            doff_y = doff_y + jnp.sum(gk * t_du, axis=0,
                                      keepdims=True) * dhy
        samp_ref[0, k * C:(k + 1) * C, :] = samp.astype(samp_ref.dtype)
        dt = dt_s[:]
        # dband += dT @ B2^T: contract the output-pixel axis of both
        dband_s[:] += jax.lax.dot_general(
            dt.astype(cdt), b2.astype(cdt), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        # dB2 = band^T @ dT: contract the band-row axis of both
        db2 = jax.lax.dot_general(
            band, dt.astype(cdt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (W_j, W_p)
        # d/dsx hat(sx - j) = (j == x0+1) - (j == x0) inside the cell
        doff_x = jnp.sum(db2 * (hit1 - hit0), axis=0, keepdims=True)
        doff_ref[0, 2 * k:2 * k + 1, :] = doff_y
        doff_ref[0, 2 * k + 1:2 * k + 2, :] = doff_x
    dband_ref[0] = dband_s[:]


def _bwd_vmem(c: int, cout: int, w: int, R: int, itemsize: int) -> int:
    d = 2 * R + 4
    band = d * c * w * itemsize
    f32 = 4
    return (2 * band + 2 * (9 * c * w * f32)      # gkm in, samp out
            + 4 * d * c * w * f32                 # t, dt, dband x2
            + 2 * w * w * (f32 + itemsize)        # b2, db2
            + 4 * 18 * w * f32)


def _pallas_bwd(x, offsets, masks, weights, g, R, interpret=False):
    """Pallas backward: returns (dx, doffsets, dmasks, dweights, dbias).

    offsets arrive y-PRE-CLAMPED (the custom_vjp wrapper owns the clamp
    and its saturation pass-through)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    cout = weights.shape[-1]
    D = 2 * R + 4
    z = b * h
    P = _pack_factor(z, w)
    wp = P * w
    xt = jnp.transpose(x, (0, 1, 3, 2))
    xt = jnp.pad(xt, ((0, 0), (R + 1, R + 2), (0, 0), (0, 0)))
    band = jnp.concatenate([xt[:, d:d + h] for d in range(D)], axis=2)
    band = _pack_lanes(band.reshape(z, D * c, w), P)
    offt = jnp.transpose(offsets.astype(jnp.float32),
                         (0, 1, 3, 2)).reshape(z, 18, w)
    maskt = jnp.transpose(masks.astype(jnp.float32),
                          (0, 1, 3, 2)).reshape(z, 9, w)
    gt = jnp.transpose(g.astype(jnp.float32),
                       (0, 1, 3, 2)).reshape(z, cout, w)
    wk = weights.reshape(9, c, cout).astype(jnp.float32)
    # gk0[z,k,c,p] = W_k @ g (no mask); gkm = gk0 * m_k feeds the kernel
    gk0 = jnp.einsum("kco,zop->zkcp", wk, gt)
    gkm = (gk0 * maskt[:, :, None, :]).reshape(z, 9 * c, w)

    kern = functools.partial(_rowband_bwd_kernel, C=c, W=wp, WImg=w, R=R)
    samp, dofft, dband = pl.pallas_call(
        kern,
        grid=(z // P,),
        in_specs=[
            pl.BlockSpec((1, D * c, wp), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 18, wp), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 9 * c, wp), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 9 * c, wp), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 18, wp), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, D * c, wp), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((z // P, 9 * c, wp), x.dtype),
            jax.ShapeDtypeStruct((z // P, 18, wp), jnp.float32),
            jax.ShapeDtypeStruct((z // P, D * c, wp), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((D * c, wp), jnp.float32),
                        pltpu.VMEM((D * c, wp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(band, _pack_lanes(offt, P), _pack_lanes(gkm.astype(jnp.float32), P))
    samp = _unpack_lanes(samp, P)
    dofft = _unpack_lanes(dofft, P)
    dband = _unpack_lanes(dband, P)

    # dx: adjoint of the band construction — D shifted slice-adds into
    # the padded rows, then crop and transpose back
    dband = dband.reshape(b, h, D, c, w)
    dxt_pad = jnp.zeros((b, h + D - 1, c, w), jnp.float32)
    for d in range(D):
        dxt_pad = dxt_pad.at[:, d:d + h].add(dband[:, :, d])
    dx = jnp.transpose(dxt_pad[:, R + 1:R + 1 + h], (0, 1, 3, 2))

    doff = jnp.transpose(dofft.reshape(b, h, 18, w), (0, 1, 3, 2))
    samp_f = samp.reshape(z, 9, c, w).astype(jnp.float32)
    dmask = jnp.einsum("zkcp,zkcp->zkp", gk0, samp_f)
    dmask = jnp.transpose(dmask.reshape(b, h, 9, w), (0, 1, 3, 2))
    sm = samp_f * maskt[:, :, None, :]
    dw = jnp.einsum("zkcp,zop->kco", sm, gt).reshape(3, 3, c, cout)
    db = jnp.sum(gt, axis=(0, 2))
    return (dx.astype(x.dtype), doff.astype(offsets.dtype),
            dmask.astype(masks.dtype), dw.astype(weights.dtype),
            db.astype(weights.dtype))


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
    z = b * h
    P = _pack_factor(z, w)
    wp = P * w
    if _fwd_vmem(c, cout, wp, R, x.dtype.itemsize) > _VMEM_BUDGET:
        raise ValueError(f"rowband kernel: shape {(h, w, c, cout)} at "
                         f"R={R} exceeds VMEM budget")
    off = _clamp_y(offsets, float(R)).astype(jnp.float32)
    xt = jnp.transpose(x, (0, 1, 3, 2))                  # (B, H, C, W)
    xt = jnp.pad(xt, ((0, 0), (R + 1, R + 2), (0, 0), (0, 0)))
    band = jnp.concatenate([xt[:, d:d + h] for d in range(D)], axis=2)
    band = _pack_lanes(band.reshape(z, D * c, w), P)
    offt = _pack_lanes(
        jnp.transpose(off, (0, 1, 3, 2)).reshape(z, 18, w), P)
    maskt = _pack_lanes(jnp.transpose(masks.astype(jnp.float32),
                                      (0, 1, 3, 2)).reshape(z, 9, w), P)
    wts = jnp.transpose(weights.reshape(9, c, cout), (0, 2, 1))
    kern = functools.partial(_rowband_kernel, C=c, Cout=cout, W=wp,
                             WImg=w, R=R)
    out = pl.pallas_call(
        kern,
        grid=(z // P,),
        in_specs=[
            pl.BlockSpec((1, D * c, wp), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 18, wp), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 9, wp), lambda i: (i, 0, 0)),
            pl.BlockSpec((9, cout, c), lambda i: (0, 0, 0)),
            pl.BlockSpec((cout, 1), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, cout, wp), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((z // P, cout, wp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(band, offt, maskt, wts,
      jnp.reshape(bias, (cout, 1)).astype(jnp.float32))
    out = _unpack_lanes(out, P).reshape(b, h, cout, w)
    return jnp.transpose(out, (0, 1, 3, 2)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def deform_conv2d_rowband(x, offsets, masks, weights, bias,
                          max_offset: int = DEFAULT_MAX_OFFSET,
                          interpret: bool = False):
    """Row-band Pallas DCNv2 forward; backward = the fused Pallas
    kernel _rowband_bwd_kernel (XLA autodiff of the oracle is used only
    in the bias=None corner case — see _rowband_bwd_rule).

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
        # bias-less primal: keep the XLA-autodiff path (grad structure
        # must mirror the primal args)
        _, vjp = jax.vjp(
            lambda *a: deform_conv2d_rowband_ref(
                a[0], a[1], a[2], a[3],
                jnp.zeros((weights.shape[-1],), x.dtype), max_offset),
            x, offsets, masks, weights)
        return vjp(g.astype(x.dtype)) + (None,)
    r = float(max_offset)
    off_c = _clamp_y(offsets, r)
    dx, doff, dmask, dw, db = _pallas_bwd(
        x, off_c, masks, weights, g, max_offset, interpret)
    # y-clamp pass-through: scale y-offset grads by d clip/d oy — 1 in
    # the interior, 0 when saturated, 0.5 AT the exact bound (jnp.clip's
    # min/max tie convention; keeps us oracle-exact there too)
    oy = offsets[..., 0::2]
    keep = (jnp.where(oy > -r, 1.0, jnp.where(oy == -r, 0.5, 0.0))
            * jnp.where(oy < r, 1.0, jnp.where(oy == r, 0.5, 0.0)))
    doff = jnp.stack([doff[..., 0::2] * keep,
                      doff[..., 1::2]], axis=-1).reshape(offsets.shape)
    return (dx, doff.astype(offsets.dtype), dmask, dw,
            db.astype(jnp.float32).astype(
                bias.dtype if hasattr(bias, "dtype") else weights.dtype))


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
        wp = _pack_factor(h, w) * w  # probe at the lane-packed width
        if max(_fwd_vmem(c, cout, wp, max_offset, dtype.itemsize),
               _bwd_vmem(c, cout, wp, max_offset,
                         dtype.itemsize)) > _VMEM_BUDGET:
            _ROWBAND_PROBED[key] = False
            return False
        try:
            xp = jnp.zeros((1, h, w, c), dtype)
            off = jnp.zeros((1, h, w, 18), jnp.float32)
            mk = jnp.ones((1, h, w, 9), jnp.float32)
            wt = jnp.zeros((3, 3, c, cout), dtype)
            bs = jnp.zeros((cout,), dtype)

            def loss(*a):
                return jnp.sum(deform_conv2d_rowband(
                    *a, max_offset).astype(jnp.float32) ** 2)

            # fwd AND bwd must compile: training must not discover a
            # Mosaic failure at step time
            jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4))).lower(
                xp, off, mk, wt, bs).compile()
            _ROWBAND_PROBED[key] = True
        except Exception:
            _ROWBAND_PROBED[key] = False
    return _ROWBAND_PROBED[key]
