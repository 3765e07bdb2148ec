"""Modulated deformable convolution (DCNv2) for TPU.

The reference consumes an external CUDA extension
(reference: src/lib/models/networks/pose_dla_dcn.py:16,354 —
`DCN(chi, cho, kernel_size=(3,3), stride=1, padding=1, dilation=1,
deformable_groups=1)`).  Here the op is built from TPU-friendly pieces:

  1. an ordinary 3x3 conv produces 27 channels: 18 offsets (dy, dx per tap)
     and 9 modulation masks (sigmoid);
  2. each of the 9 taps is sampled from the input at its deformed location
     with bilinear interpolation (one fused gather per tap);
  3. the modulated samples contract against the 3x3 weights as a single
     (B*H*W, 9*Cin) x (9*Cin, Cout) matmul — MXU-shaped.

Several formulations of step 2+3 coexist; all compute IDENTICAL math and
are cross-tested (tests/test_train.py):

  deform_conv2d          fused reference oracle: 4 flat row-gathers +
                         one (B,H,W,9*Cin)x(9*Cin,Cout) einsum
  deform_conv2d_tapwise  9 per-tap checkpointed gather+matmul segments —
                         ~9x smaller temps, production default for large
                         shapes and the memory shape that fits
                         paper-scale training
  deform_conv2d_quad     quad-view single gather: one contiguous 4*Cin
                         chunk per (pixel, tap) fetches all 4 bilinear
                         corners (the gather unit is chunk-rate-bound)
  deform_conv2d_quad_tapwise  quad chunks + per-tap checkpoint (training)
  deform_conv2d_duo      duo-view pair gather: 2*Cin chunks, the midpoint
                         of the chunk-size ladder (wins iff the gather
                         unit's chunk-rate plateau ends at 256-512 B rows)
  deform_conv2d_duo_tapwise   duo chunks + per-tap checkpoint (training)
  deform_conv2d_pairs    2*Cin lax.gather slices — kept as a tested
                         reference; lowers serially on this toolchain,
                         do not use in production

Selection: CENTERPOLY_DCN_FORMULATION=auto|fused|tapwise|quad|
quad_tapwise|duo|duo_tapwise (auto: measured per-shape winner table,
else tapwise for large shapes / fused otherwise).
Two Pallas kernels exist in kernels/ (exact-gather: interpret-only on
this Mosaic; halo: compiles on-chip, opt-in CENTERPOLY_PALLAS_DCN).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import BN_MOMENTUM


def bilinear_sample_nhwc(img: jnp.ndarray, y: jnp.ndarray,
                         x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample an NHWC image at float coords.

    img: (H, W, C); y, x: (...,) float coordinates.  Out-of-range samples
    are zero (matching DCNv2's zero padding semantics).
    Returns (..., C).
    """
    h, w = img.shape[0], img.shape[1]
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    fy = y - y0
    fx = x - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def tap(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        v = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(valid[..., None], v, 0.0)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    fy = fy[..., None]
    fx = fx[..., None]
    return (v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx
            + v10 * fy * (1 - fx) + v11 * fy * fx)


def deform_conv2d(
    x: jnp.ndarray,
    offsets: jnp.ndarray,
    masks: jnp.ndarray,
    weights: jnp.ndarray,
    bias: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Core modulated deformable 3x3 conv (stride 1, SAME padding).

    Args:
      x: (B, H, W, Cin) input.
      offsets: (B, H, W, 18) — (dy, dx) per tap, tap-major ordering
        [dy0, dx0, dy1, dx1, ...] over the 3x3 grid (row-major taps).
      masks: (B, H, W, 9) — modulation scalars (already sigmoided).
      weights: (3, 3, Cin, Cout).
      bias: (Cout,) or None.

    TPU note: the 4 corner samples are flat row-gathers over (B*H*W, Cin)
    with a 1-D index — this hits XLA:TPU's fast bitpacked-gather path.  A
    vmap-over-batch formulation (3-deep gather indices) is ~100x slower on
    the same hardware; do not "simplify" this back.
    """
    b, h, w, cin = x.shape
    cout = weights.shape[-1]

    gy = jnp.arange(h, dtype=jnp.float32)[:, None]
    gx = jnp.arange(w, dtype=jnp.float32)[None, :]

    # tap grid offsets (ky, kx) in {-1, 0, 1}
    ky = jnp.repeat(jnp.arange(-1, 2, dtype=jnp.float32), 3)  # (9,)
    kx = jnp.tile(jnp.arange(-1, 2, dtype=jnp.float32), 3)    # (9,)

    off = offsets.reshape(b, h, w, 9, 2).astype(jnp.float32)
    sy = gy[None, :, :, None] + ky[None, None, None, :] + off[..., 0]
    sx = gx[None, :, :, None] + kx[None, None, None, :] + off[..., 1]

    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    fy = (sy - y0)[..., None].astype(x.dtype)
    fx = (sx - x0)[..., None].astype(x.dtype)
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)

    bidx = jnp.arange(b, dtype=jnp.int32)[:, None, None, None] * (h * w)
    xf = x.reshape(b * h * w, cin)

    def tap(yi, xi):
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        idx = bidx + jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        v = jnp.take(xf, idx, axis=0)
        return jnp.where(inb[..., None], v, 0)

    sampled = (
        tap(y0, x0) * (1 - fy) * (1 - fx)
        + tap(y0, x0 + 1) * (1 - fy) * fx
        + tap(y0 + 1, x0) * fy * (1 - fx)
        + tap(y0 + 1, x0 + 1) * fy * fx
    )
    sampled = sampled * masks[..., None]

    # Single MXU contraction: (B,H,W,9*Cin) @ (9*Cin,Cout)
    out = jnp.einsum(
        "bhwkc,kco->bhwo",
        sampled,
        weights.reshape(9, cin, cout),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


def deform_conv2d_pairs(
    x: jnp.ndarray,
    offsets: jnp.ndarray,
    masks: jnp.ndarray,
    weights: jnp.ndarray,
    bias: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """deform_conv2d with pairwise corner gathers.

    Identical math to deform_conv2d, but exploits that the two x-corners
    (y, x0) and (y, x0+1) of a bilinear sample are ADJACENT Cin-blocks in
    the row-major (B*H*W*Cin,) flat feature map: one lax.gather of a
    contiguous 2*Cin slice fetches both corners.  That halves the gather
    op count (2 instead of 4) and doubles the contiguous chunk size
    (2*Cin*2B = 256 B at Cin=64 bf16), which is the efficient regime for
    the TPU gather unit.  Out-of-image corners are masked to zero exactly
    as in deform_conv2d; at the right image edge the slice start is
    clamped to x0=w-2 and the two halves are swapped via a select, which
    reproduces the unclamped corner values wherever they are in range.
    """
    b, h, w, cin = x.shape
    cout = weights.shape[-1]

    gy = jnp.arange(h, dtype=jnp.float32)[:, None]
    gx = jnp.arange(w, dtype=jnp.float32)[None, :]
    ky = jnp.repeat(jnp.arange(-1, 2, dtype=jnp.float32), 3)  # (9,)
    kx = jnp.tile(jnp.arange(-1, 2, dtype=jnp.float32), 3)    # (9,)

    off = offsets.reshape(b, h, w, 9, 2).astype(jnp.float32)
    sy = gy[None, :, :, None] + ky[None, None, None, :] + off[..., 0]
    sx = gx[None, :, :, None] + kx[None, None, None, :] + off[..., 1]

    y0f = jnp.floor(sy)
    x0f = jnp.floor(sx)
    fy = (sy - y0f)[..., None].astype(x.dtype)
    fx = (sx - x0f)[..., None].astype(x.dtype)
    y0 = y0f.astype(jnp.int32)
    x0 = x0f.astype(jnp.int32)

    x0c = jnp.clip(x0, 0, w - 2)
    # swap the pair halves where the slice start was clamped DOWN
    # (x0 == w-1: half0 is x0-1, half1 is x0); when x0 is clamped UP
    # (x0 < 0) the only possibly-in-range corner is x0+1 == half0 at 0
    straight = (x0 == x0c)[..., None]

    bidx = jnp.arange(b, dtype=jnp.int32)[:, None, None, None] * (h * w)
    flat = x.reshape(b * h * w * cin)

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(4,), collapsed_slice_dims=(), start_index_map=(0,))

    def pair(yi):
        yc = jnp.clip(yi, 0, h - 1)
        start = ((bidx + yc * w + x0c) * cin)[..., None]
        v = jax.lax.gather(
            flat, start, dnums, slice_sizes=(2 * cin,), mode="clip")
        v0, v1 = v[..., :cin], v[..., cin:]
        vx0 = jnp.where(straight, v0, v1)
        vx1 = jnp.where(straight, v1, v0)
        yin = (yi >= 0) & (yi < h)
        in00 = (yin & (x0 >= 0) & (x0 < w))[..., None]
        in01 = (yin & (x0 + 1 >= 0) & (x0 + 1 < w))[..., None]
        return (jnp.where(in00, vx0, 0) * (1 - fx)
                + jnp.where(in01, vx1, 0) * fx)

    sampled = pair(y0) * (1 - fy) + pair(y0 + 1) * fy
    sampled = sampled * masks[..., None]

    out = jnp.einsum(
        "bhwkc,kco->bhwo",
        sampled,
        weights.reshape(9, cin, cout),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


def _quad_views(x: jnp.ndarray):
    """Four parity-strided copies of x whose 2x2 pixel blocks are
    contiguous 4*Cin chunks.

    View (p, q) holds cells starting at rows ≡ p (mod 2) and cols ≡ q
    (mod 2); cell (b, y2, x2) is the 2x2 block at (2*y2+p, 2*x2+q) laid
    out [r0c0, r0c1, r1c0, r1c1] along the last axis.  Returns the
    concatenated (ΣN_pq, 4*Cin) operand plus int32 per-view (base, hp,
    wq) tables for index arithmetic.
    """
    b, h, w, c = x.shape
    flats = []
    bases, hps, wqs = [], [], []
    base = 0
    for p in (0, 1):
        for q in (0, 1):
            hp = (h - p) // 2
            wq = (w - q) // 2
            v = x[:, p:p + 2 * hp, q:q + 2 * wq, :]
            v = v.reshape(b, hp, 2, wq, 2, c)
            v = v.transpose(0, 1, 3, 2, 4, 5).reshape(b * hp * wq, 4 * c)
            flats.append(v)
            bases.append(base)
            hps.append(hp)
            wqs.append(wq)
            base += b * hp * wq
    operand = jnp.concatenate(flats, axis=0)
    # (base, hp, wq) stay PYTHON ints: the callers select between the
    # four views with jnp.where arithmetic, never an indexed lookup — a
    # tables[vid] fancy-index would be THREE more gathers with full
    # (B,H,W,9) index tensors, tripling the descriptor count the quad
    # trick exists to cut
    return operand, list(zip(bases, hps, wqs))


def _select4(p, q, v00, v01, v10, v11):
    """view-table lookup as VPU selects on the parity bits."""
    return jnp.where(p == 0, jnp.where(q == 0, v00, v01),
                     jnp.where(q == 0, v10, v11))


def deform_conv2d_quad(
    x: jnp.ndarray,
    offsets: jnp.ndarray,
    masks: jnp.ndarray,
    weights: jnp.ndarray,
    bias: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """deform_conv2d with ONE gather per (pixel, tap): quad-view chunks.

    The TPU gather unit is chunk-rate-bound (~233-308M chunks/s measured,
    5% of HBM bandwidth), so the win is fewer, larger chunks: re-layout
    x into four parity-strided copies (_quad_views) whose 2x2 pixel
    blocks are contiguous 4*Cin chunks (512 B at Cin=64 bf16), then fetch
    ALL FOUR bilinear corners of a sample with a single jnp.take row —
    4x fewer chunks than the fused 4-corner formulation.  Out-of-image
    corners are masked to zero exactly as deform_conv2d; at image edges
    the cell start is clamped and the needed corners are re-selected
    from the chunk (clamping never moves an in-range corner out of the
    fetched 2x2 block).  Math identical to deform_conv2d.
    """
    b, h, w, cin = x.shape
    cout = weights.shape[-1]
    if h < 3 or w < 3:
        # quad parity views need at least 2 cells per axis; tiny maps
        # (deepest pyramid levels of small inputs) take the fused path
        return deform_conv2d(x, offsets, masks, weights, bias)

    gy = jnp.arange(h, dtype=jnp.float32)[:, None]
    gx = jnp.arange(w, dtype=jnp.float32)[None, :]
    ky = jnp.repeat(jnp.arange(-1, 2, dtype=jnp.float32), 3)  # (9,)
    kx = jnp.tile(jnp.arange(-1, 2, dtype=jnp.float32), 3)    # (9,)

    off = offsets.reshape(b, h, w, 9, 2).astype(jnp.float32)
    sy = gy[None, :, :, None] + ky[None, None, None, :] + off[..., 0]
    sx = gx[None, :, :, None] + kx[None, None, None, :] + off[..., 1]

    y0f = jnp.floor(sy)
    x0f = jnp.floor(sx)
    fy = (sy - y0f)[..., None].astype(x.dtype)
    fx = (sx - x0f)[..., None].astype(x.dtype)
    y0 = y0f.astype(jnp.int32)
    x0 = x0f.astype(jnp.int32)

    operand, tables = _quad_views(x)
    (b00, h00, w00), (b01, h01, w01), (b10, h10, w10), (b11, h11, w11) \
        = tables

    ry = jnp.clip(y0, 0, h - 2)
    cx = jnp.clip(x0, 0, w - 2)
    p = ry & 1
    q = cx & 1
    y2 = (ry - p) >> 1
    x2 = (cx - q) >> 1
    bb = jnp.arange(b, dtype=jnp.int32)[:, None, None, None]
    base = _select4(p, q, b00, b01, b10, b11)
    hp = _select4(p, q, h00, h01, h10, h11)
    wq = _select4(p, q, w00, w01, w10, w11)
    idx = base + (bb * hp + y2) * wq + x2            # (B,H,W,9)

    chunk = jnp.take(operand, idx, axis=0)           # (B,H,W,9,4C)
    c00 = chunk[..., 0 * cin:1 * cin]
    c01 = chunk[..., 1 * cin:2 * cin]
    c10 = chunk[..., 2 * cin:3 * cin]
    c11 = chunk[..., 3 * cin:4 * cin]

    dy0 = jnp.clip(y0 - ry, 0, 1)[..., None]
    dy1 = jnp.clip(y0 + 1 - ry, 0, 1)[..., None]
    dx0 = jnp.clip(x0 - cx, 0, 1)[..., None]
    dx1 = jnp.clip(x0 + 1 - cx, 0, 1)[..., None]

    def pick(dy, dx):
        top = jnp.where(dx == 0, c00, c01)
        bot = jnp.where(dx == 0, c10, c11)
        return jnp.where(dy == 0, top, bot)

    def inb(yi, xi):
        return ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w))[..., None]

    v00 = jnp.where(inb(y0, x0), pick(dy0, dx0), 0)
    v01 = jnp.where(inb(y0, x0 + 1), pick(dy0, dx1), 0)
    v10 = jnp.where(inb(y0 + 1, x0), pick(dy1, dx0), 0)
    v11 = jnp.where(inb(y0 + 1, x0 + 1), pick(dy1, dx1), 0)

    sampled = (v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx
               + v10 * fy * (1 - fx) + v11 * fy * fx)
    sampled = sampled * masks[..., None]

    out = jnp.einsum(
        "bhwkc,kco->bhwo",
        sampled,
        weights.reshape(9, cin, cout),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


def deform_conv2d_quad_tapwise(
    x: jnp.ndarray,
    offsets: jnp.ndarray,
    masks: jnp.ndarray,
    weights: jnp.ndarray,
    bias: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Training-scale DCN: quad-view single gathers, one checkpointed tap
    at a time.

    Combines deform_conv2d_quad's 4x chunk-count reduction (one 4*Cin
    chunk fetches all four bilinear corners; the take's TRANSPOSE is then
    also a 4x-fewer-chunk scatter-add, which is the training win) with
    deform_conv2d_tapwise's memory shape: each tap's gather+contraction
    is wrapped in jax.checkpoint so only the tap inputs persist as
    autodiff residuals.  The quad operand is built once per call and
    shared by all taps (it is one extra 4x-of-x residual; the per-tap
    temps stay (B,H,W,4Cin)).  Math identical to deform_conv2d.
    """
    b, h, w, cin = x.shape
    cout = weights.shape[-1]
    if h < 3 or w < 3:
        return deform_conv2d_tapwise(x, offsets, masks, weights, bias)

    gy = jnp.arange(h, dtype=jnp.float32)[:, None]
    gx = jnp.arange(w, dtype=jnp.float32)[None, :]
    ky = jnp.repeat(jnp.arange(-1, 2, dtype=jnp.float32), 3)  # (9,)
    kx = jnp.tile(jnp.arange(-1, 2, dtype=jnp.float32), 3)    # (9,)

    off = offsets.reshape(b, h, w, 9, 2).astype(jnp.float32)
    sy = jnp.moveaxis(gy[None, :, :, None] + ky[None, None, None, :]
                      + off[..., 0], -1, 0)        # (9,B,H,W)
    sx = jnp.moveaxis(gx[None, :, :, None] + kx[None, None, None, :]
                      + off[..., 1], -1, 0)
    wk = weights.reshape(9, cin, cout)

    operand, tables = _quad_views(x)
    (b00, h00, w00), (b01, h01, w01), (b10, h10, w10), (b11, h11, w11) \
        = tables
    bb = jnp.arange(b, dtype=jnp.int32)[:, None, None]

    @jax.checkpoint
    def tap_contrib(operand, tsy, tsx, tmk, twk):
        y0f = jnp.floor(tsy)
        x0f = jnp.floor(tsx)
        fy = (tsy - y0f)[..., None].astype(x.dtype)
        fx = (tsx - x0f)[..., None].astype(x.dtype)
        y0 = y0f.astype(jnp.int32)
        x0 = x0f.astype(jnp.int32)
        ry = jnp.clip(y0, 0, h - 2)
        cx = jnp.clip(x0, 0, w - 2)
        p = ry & 1
        q = cx & 1
        base = _select4(p, q, b00, b01, b10, b11)
        hp = _select4(p, q, h00, h01, h10, h11)
        wq = _select4(p, q, w00, w01, w10, w11)
        idx = (base + (bb * hp + ((ry - p) >> 1)) * wq
               + ((cx - q) >> 1))                   # (B,H,W)
        chunk = jnp.take(operand, idx, axis=0)      # (B,H,W,4C)
        c00 = chunk[..., 0 * cin:1 * cin]
        c01 = chunk[..., 1 * cin:2 * cin]
        c10 = chunk[..., 2 * cin:3 * cin]
        c11 = chunk[..., 3 * cin:4 * cin]
        dy0 = jnp.clip(y0 - ry, 0, 1)[..., None]
        dy1 = jnp.clip(y0 + 1 - ry, 0, 1)[..., None]
        dx0 = jnp.clip(x0 - cx, 0, 1)[..., None]
        dx1 = jnp.clip(x0 + 1 - cx, 0, 1)[..., None]

        def pick(dy, dx):
            top = jnp.where(dx == 0, c00, c01)
            bot = jnp.where(dx == 0, c10, c11)
            return jnp.where(dy == 0, top, bot)

        def inb(yi, xi):
            return ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w))[..., None]

        s = (jnp.where(inb(y0, x0), pick(dy0, dx0), 0) * (1 - fy) * (1 - fx)
             + jnp.where(inb(y0, x0 + 1), pick(dy0, dx1), 0) * (1 - fy) * fx
             + jnp.where(inb(y0 + 1, x0), pick(dy1, dx0), 0) * fy * (1 - fx)
             + jnp.where(inb(y0 + 1, x0 + 1), pick(dy1, dx1), 0) * fy * fx)
        s = s * tmk[..., None]
        return jax.lax.dot_general(
            s.reshape(b * h * w, cin), twk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    out = tap_contrib(operand, sy[0], sx[0], masks[..., 0], wk[0])
    for k in range(1, 9):
        out = out + tap_contrib(operand, sy[k], sx[k], masks[..., k], wk[k])
    out = out.reshape(b, h, w, cout)
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


def _duo_views(x: jnp.ndarray):
    """Two x-parity-strided copies of x whose 1x2 pixel pairs are
    contiguous 2*Cin chunks.

    View q holds pairs starting at cols ≡ q (mod 2); pair (b, y, x2) is
    the 1x2 block at (y, 2*x2+q) laid out [c0, c1] along the last axis.
    Returns the concatenated (ΣN_q, 2*Cin) operand plus per-view
    (base, wq) Python-int tables (same no-fancy-index rule as
    _quad_views).
    """
    b, h, w, c = x.shape
    flats = []
    tables = []
    base = 0
    for q in (0, 1):
        wq = (w - q) // 2
        v = x[:, :, q:q + 2 * wq, :].reshape(b * h * wq, 2 * c)
        flats.append(v)
        tables.append((base, wq))
        base += b * h * wq
    return jnp.concatenate(flats, axis=0), tables


def deform_conv2d_duo(
    x: jnp.ndarray,
    offsets: jnp.ndarray,
    masks: jnp.ndarray,
    weights: jnp.ndarray,
    bias: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """deform_conv2d with TWO gathers per (pixel, tap): duo-view chunks.

    The midpoint of the chunk-size ladder between the fused 4-corner
    formulation (4 gathers of Cin) and quad (1 gather of 4*Cin): the two
    x-corners of each bilinear row are one 2*Cin chunk (256 B at Cin=64
    bf16), fetched once per row — 2x fewer chunks than fused.  If the
    on-chip gather unit's chunk-rate plateau ends between 256 B and
    512 B rows (experiments/probe_gather_rates.py measures this), duo
    beats both neighbors; the shoot-out (bench_dcn_variants.py) decides.
    Math identical to deform_conv2d.
    """
    b, h, w, cin = x.shape
    cout = weights.shape[-1]
    if w < 3:
        return deform_conv2d(x, offsets, masks, weights, bias)

    gy = jnp.arange(h, dtype=jnp.float32)[:, None]
    gx = jnp.arange(w, dtype=jnp.float32)[None, :]
    ky = jnp.repeat(jnp.arange(-1, 2, dtype=jnp.float32), 3)  # (9,)
    kx = jnp.tile(jnp.arange(-1, 2, dtype=jnp.float32), 3)    # (9,)

    off = offsets.reshape(b, h, w, 9, 2).astype(jnp.float32)
    sy = gy[None, :, :, None] + ky[None, None, None, :] + off[..., 0]
    sx = gx[None, :, :, None] + kx[None, None, None, :] + off[..., 1]

    y0f = jnp.floor(sy)
    x0f = jnp.floor(sx)
    fy = (sy - y0f)[..., None].astype(x.dtype)
    fx = (sx - x0f)[..., None].astype(x.dtype)
    y0 = y0f.astype(jnp.int32)
    x0 = x0f.astype(jnp.int32)

    operand, tables = _duo_views(x)
    (base0, w0), (base1, w1) = tables

    cx = jnp.clip(x0, 0, w - 2)
    q = cx & 1
    x2 = (cx - q) >> 1
    bb = jnp.arange(b, dtype=jnp.int32)[:, None, None, None]
    base = jnp.where(q == 0, base0, base1)
    wq = jnp.where(q == 0, w0, w1)

    dx0 = jnp.clip(x0 - cx, 0, 1)[..., None]
    dx1 = jnp.clip(x0 + 1 - cx, 0, 1)[..., None]

    def row(yi):
        """Fetch the x-pair chunk on row yi; returns (left, right, inb_y)."""
        yc = jnp.clip(yi, 0, h - 1)
        idx = base + (bb * h + yc) * wq + x2          # (B,H,W,9)
        chunk = jnp.take(operand, idx, axis=0)        # (B,H,W,9,2C)
        c0 = chunk[..., :cin]
        c1 = chunk[..., cin:]
        return c0, c1, ((yi >= 0) & (yi < h))[..., None]

    def pick(c0, c1, dx):
        return jnp.where(dx == 0, c0, c1)

    def inb_x(xi):
        return ((xi >= 0) & (xi < w))[..., None]

    t0, t1, iny0 = row(y0)
    b0, b1, iny1 = row(y0 + 1)
    v00 = jnp.where(iny0 & inb_x(x0), pick(t0, t1, dx0), 0)
    v01 = jnp.where(iny0 & inb_x(x0 + 1), pick(t0, t1, dx1), 0)
    v10 = jnp.where(iny1 & inb_x(x0), pick(b0, b1, dx0), 0)
    v11 = jnp.where(iny1 & inb_x(x0 + 1), pick(b0, b1, dx1), 0)

    sampled = (v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx
               + v10 * fy * (1 - fx) + v11 * fy * fx)
    sampled = sampled * masks[..., None]

    out = jnp.einsum(
        "bhwkc,kco->bhwo",
        sampled,
        weights.reshape(9, cin, cout),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


def deform_conv2d_duo_tapwise(
    x: jnp.ndarray,
    offsets: jnp.ndarray,
    masks: jnp.ndarray,
    weights: jnp.ndarray,
    bias: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Training-scale duo: duo-view pair gathers, one checkpointed tap at
    a time (jax.checkpoint memory shape of deform_conv2d_tapwise, 2x
    fewer gather/scatter chunks; see deform_conv2d_duo)."""
    b, h, w, cin = x.shape
    cout = weights.shape[-1]
    if w < 3:
        return deform_conv2d_tapwise(x, offsets, masks, weights, bias)

    gy = jnp.arange(h, dtype=jnp.float32)[:, None]
    gx = jnp.arange(w, dtype=jnp.float32)[None, :]
    ky = jnp.repeat(jnp.arange(-1, 2, dtype=jnp.float32), 3)  # (9,)
    kx = jnp.tile(jnp.arange(-1, 2, dtype=jnp.float32), 3)    # (9,)

    off = offsets.reshape(b, h, w, 9, 2).astype(jnp.float32)
    sy = jnp.moveaxis(gy[None, :, :, None] + ky[None, None, None, :]
                      + off[..., 0], -1, 0)        # (9,B,H,W)
    sx = jnp.moveaxis(gx[None, :, :, None] + kx[None, None, None, :]
                      + off[..., 1], -1, 0)
    wk = weights.reshape(9, cin, cout)

    operand, tables = _duo_views(x)
    (base0, w0), (base1, w1) = tables
    bb = jnp.arange(b, dtype=jnp.int32)[:, None, None]

    @jax.checkpoint
    def tap_contrib(operand, tsy, tsx, tmk, twk):
        y0f = jnp.floor(tsy)
        x0f = jnp.floor(tsx)
        fy = (tsy - y0f)[..., None].astype(x.dtype)
        fx = (tsx - x0f)[..., None].astype(x.dtype)
        y0 = y0f.astype(jnp.int32)
        x0 = x0f.astype(jnp.int32)
        cx = jnp.clip(x0, 0, w - 2)
        q = cx & 1
        x2 = (cx - q) >> 1
        base = jnp.where(q == 0, base0, base1)
        wq = jnp.where(q == 0, w0, w1)
        dx0 = jnp.clip(x0 - cx, 0, 1)[..., None]
        dx1 = jnp.clip(x0 + 1 - cx, 0, 1)[..., None]

        def row(yi):
            yc = jnp.clip(yi, 0, h - 1)
            idx = base + (bb * h + yc) * wq + x2      # (B,H,W)
            chunk = jnp.take(operand, idx, axis=0)    # (B,H,W,2C)
            return (chunk[..., :cin], chunk[..., cin:],
                    ((yi >= 0) & (yi < h))[..., None])

        def inb_x(xi):
            return ((xi >= 0) & (xi < w))[..., None]

        t0, t1, iny0 = row(y0)
        b0_, b1_, iny1 = row(y0 + 1)
        s = (jnp.where(iny0 & inb_x(x0),
                       jnp.where(dx0 == 0, t0, t1), 0) * (1 - fy) * (1 - fx)
             + jnp.where(iny0 & inb_x(x0 + 1),
                         jnp.where(dx1 == 0, t0, t1), 0) * (1 - fy) * fx
             + jnp.where(iny1 & inb_x(x0),
                         jnp.where(dx0 == 0, b0_, b1_), 0) * fy * (1 - fx)
             + jnp.where(iny1 & inb_x(x0 + 1),
                         jnp.where(dx1 == 0, b0_, b1_), 0) * fy * fx)
        s = s * tmk[..., None]
        return jax.lax.dot_general(
            s.reshape(b * h * w, cin), twk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    out = tap_contrib(operand, sy[0], sx[0], masks[..., 0], wk[0])
    for k in range(1, 9):
        out = out + tap_contrib(operand, sy[k], sx[k], masks[..., k], wk[k])
    out = out.reshape(b, h, w, cout)
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


def deform_conv2d_tapwise(
    x: jnp.ndarray,
    offsets: jnp.ndarray,
    masks: jnp.ndarray,
    weights: jnp.ndarray,
    bias: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """deform_conv2d computed one 3x3 tap at a time, each tap checkpointed.

    Same math as deform_conv2d (one flat row-gather per corner + MXU
    contraction), but the (B,H,W,9,Cin) sampled tensor never exists: each
    of the 9 taps samples (4 gathers over (B*H*W,Cin)) and immediately
    contracts to a (B*H*W,Cout) contribution.  jax.checkpoint around each
    tap keeps only the tap's INPUTS as autodiff residuals, so backward
    recomputes one tap's gathers at a time — peak temp memory drops ~9x
    vs the fused formulation, which is what lets the paper-scale DLA-34
    train step (batch 8, 512x1024, 18 DCN nodes) fit 16G HBM.  Numerics
    match deform_conv2d up to accumulation order.
    """
    b, h, w, cin = x.shape
    cout = weights.shape[-1]

    gy = jnp.arange(h, dtype=jnp.float32)[:, None]
    gx = jnp.arange(w, dtype=jnp.float32)[None, :]
    ky = jnp.repeat(jnp.arange(-1, 2, dtype=jnp.float32), 3)  # (9,)
    kx = jnp.tile(jnp.arange(-1, 2, dtype=jnp.float32), 3)    # (9,)

    off = offsets.reshape(b, h, w, 9, 2).astype(jnp.float32)
    # (9, B, H, W) absolute sample coords per tap
    sy = jnp.moveaxis(gy[None, :, :, None] + ky[None, None, None, :]
                      + off[..., 0], -1, 0)
    sx = jnp.moveaxis(gx[None, :, :, None] + kx[None, None, None, :]
                      + off[..., 1], -1, 0)
    wk = weights.reshape(9, cin, cout)         # (9, Cin, Cout)

    bidx = jnp.arange(b, dtype=jnp.int32)[:, None, None] * (h * w)
    xf = x.reshape(b * h * w, cin)

    @jax.checkpoint
    def tap_contrib(xf, tsy, tsx, tmk, twk):
        y0 = jnp.floor(tsy)
        x0 = jnp.floor(tsx)
        fy = (tsy - y0)[..., None].astype(x.dtype)
        fx = (tsx - x0)[..., None].astype(x.dtype)
        y0 = y0.astype(jnp.int32)
        x0 = x0.astype(jnp.int32)

        def tap(yi, xi):
            inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
            idx = bidx + jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
            v = jnp.take(xf, idx, axis=0)
            return jnp.where(inb[..., None], v, 0)

        s = (tap(y0, x0) * (1 - fy) * (1 - fx)
             + tap(y0, x0 + 1) * (1 - fy) * fx
             + tap(y0 + 1, x0) * fy * (1 - fx)
             + tap(y0 + 1, x0 + 1) * fy * fx)
        s = s * tmk[..., None]
        return jax.lax.dot_general(
            s.reshape(b * h * w, cin), twk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    out = tap_contrib(xf, sy[0], sx[0], masks[..., 0], wk[0])
    for k in range(1, 9):
        out = out + tap_contrib(xf, sy[k], sx[k], masks[..., k], wk[k])
    out = out.reshape(b, h, w, cout)
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


@jax.custom_vjp
def _deform_conv2d_fast(x, offsets, masks, weights, bias):
    """Pallas forward + XLA-autodiff backward (identical math)."""
    from ..kernels.dcn_pallas import deform_conv2d_pallas
    return deform_conv2d_pallas(x, offsets, masks, weights, bias)


def _dc_fwd(x, offsets, masks, weights, bias):
    return _deform_conv2d_fast(x, offsets, masks, weights, bias), (
        x, offsets, masks, weights, bias)


def _dc_bwd(res, g):
    _, vjp = jax.vjp(deform_conv2d, *res)
    return vjp(g)


_deform_conv2d_fast.defvjp(_dc_fwd, _dc_bwd)


# Above this many elements in the (B,H,W,9,Cin) sampled tensor, wrap the
# sampling+contraction in jax.checkpoint so autodiff recomputes the gathers
# instead of keeping ~4 tensors of that size alive as residuals across all
# 18 DCN nodes (DLA-34 batch-8 512x1024 training OOMs 16G HBM without this).
# Remat is free at inference (checkpoint only affects grad) and the bwd
# recompute is one extra gather+multiply sweep per node.
_REMAT_ELEMS = 1 << 26


def _dcn_remat_on(b: int, h: int, w: int, cin: int) -> bool:
    import os
    env = os.environ.get("CENTERPOLY_DCN_REMAT", "auto").lower()
    if env in ("0", "off", "false"):
        return False
    if env in ("1", "on", "true"):
        return True
    thresh = int(env) if env.isdigit() else _REMAT_ELEMS
    return b * h * w * 9 * cin > thresh


def use_pallas_dcn(h: int, w: int, c: int, cout: int) -> bool:
    """Gate for the exact-gather Pallas forward path
    (CENTERPOLY_PALLAS_DCN=0/1/auto)."""
    import os
    env = os.environ.get("CENTERPOLY_PALLAS_DCN", "auto").lower()
    if (env in ("0", "off", "false") or env.startswith("halo")
            or env.startswith("rowband")):
        return False
    try:
        from ..kernels.dcn_pallas import pallas_supported
        return pallas_supported(h, w, c, cout)
    except Exception:
        return False


FORMULATIONS = {}  # name -> callable; filled after the defs below


def _auto_table():
    """Measured winners (experiments/dcn_auto_table.json).

    Entries key on "b,h,w,cin,train" with exact-match lookup.  The
    committed table is written from a FULL-MODEL A/B (one formulation
    for every DCN node, experiments/profile_inference.py --ab_forms
    --write_table), not from isolated per-shape microbenchmarks: the
    round-4 on-chip A/B measured per-layer mixing (each shape using its
    isolated-microbench winner) at 63.1 ms/frame on DLA-34 @ 512x1024
    vs 35.0 ms for uniform `duo` — isolated-shape timings do not
    transfer into the compiled full model, so selection must be
    model-consistent.  bench_dcn_variants.py --write_table (per-shape)
    remains available for kernel research but should not feed
    production selection.
    """
    global _AUTO_TABLE
    if _AUTO_TABLE is None:
        import json
        import os
        path = os.environ.get(
            "CENTERPOLY_DCN_AUTO_TABLE",
            os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), "experiments",
                "dcn_auto_table.json"))
        table = {}
        try:
            with open(path) as f:
                raw = json.load(f)
            table = {k: v for k, v in raw.items() if v in (
                "fused", "tapwise", "quad", "quad_tapwise",
                "duo", "duo_tapwise")}
        except (OSError, ValueError):
            pass
        _AUTO_TABLE = table
    return _AUTO_TABLE


_AUTO_TABLE = None


def resolve_formulation(b: int, h: int, w: int, cin: int,
                        train: bool) -> str:
    """Pick the DCN formulation for a shape.

    Order: explicit CENTERPOLY_DCN_FORMULATION env > measured winner
    from the auto table (written by a full-model A/B, see _auto_table)
    > static heuristic.  The heuristic's inference default is `duo`:
    the round-4 on-chip full-model A/B measured DLA-34 @ 512x1024 at
    duo 35.0 ms / fused 39.3 / quad 40.6 / tapwise 61.1 ms per frame.
    Remat-needing training shapes keep the per-tap-checkpointed family
    (memory constraint, not a speed pick).
    """
    import os
    form = os.environ.get("CENTERPOLY_DCN_FORMULATION", "auto").lower()
    if form in FORMULATIONS:
        return form
    if form not in ("auto", ""):   # empty = shell idiom for "unset"
        # a typo ('quad-tapwise', or 'rowband' which belongs to
        # CENTERPOLY_PALLAS_DCN) must not silently train/benchmark a
        # different formulation than the one explicitly asked for
        raise ValueError(
            f"CENTERPOLY_DCN_FORMULATION={form!r} is not a known "
            f"formulation; use 'auto' or one of "
            f"{sorted(FORMULATIONS)} (Pallas kernels are selected via "
            f"CENTERPOLY_PALLAS_DCN instead)")
    need_remat = train and _dcn_remat_on(b, h, w, cin)
    table = _auto_table()
    hit = table.get(f"{b},{h},{w},{cin},{int(bool(train))}")
    if hit is None and b != 1:
        # batch-relaxed fallback: the formulation race is about the
        # per-pixel gather path, which is batch-invariant to first
        # order — a measured b=1 winner for the same (h,w,cin) class
        # beats the static heuristic (memory is separately protected by
        # the remat coercion below)
        hit = table.get(f"1,{h},{w},{cin},{int(bool(train))}")
    if hit is not None:
        if need_remat:
            # the remat guard is a MEMORY constraint, not a speed pick:
            # at paper scale only the per-tap-checkpointed formulations
            # fit HBM, so coerce a measured winner to its tapwise
            # sibling rather than let a table hit reintroduce the OOM
            hit = {"fused": "tapwise", "quad": "quad_tapwise",
                   "duo": "duo_tapwise"}.get(hit, hit)
        return hit
    if need_remat:
        return "duo_tapwise"
    big = b * h * w * 9 * cin > (1 << 22)
    return "duo" if big else "fused"


def _parse_bounded_mode(prefix: str, default_r: int):
    """Parse CENTERPOLY_PALLAS_DCN='<prefix>[:<R>]'.

    Returns (requested, R): requested=False when the env doesn't start
    with the prefix; a malformed R warns and falls back to default_r.
    """
    import os
    env = os.environ.get("CENTERPOLY_PALLAS_DCN", "auto").lower()
    if not env.startswith(prefix):
        return False, default_r
    r = default_r
    if ":" in env:
        spec = env.split(":", 1)[1]
        try:
            r = int(spec)
        except ValueError:
            import warnings
            warnings.warn(
                f"CENTERPOLY_PALLAS_DCN={env!r}: cannot parse max offset "
                f"{spec!r}; using default {default_r}")
            r = default_r
    return True, r


def halo_dcn_mode(h: int, w: int, c: int, cout: int, dtype=None):
    """Gate for the bounded-offset halo kernel.

    CENTERPOLY_PALLAS_DCN=halo or halo:<R> opts in (R = max offset,
    default kernels.dcn_halo.DEFAULT_MAX_OFFSET).  Returns (use, R):
    use=True only when the kernel compile-probes OK on this backend with
    the activation dtype that will actually run; R is returned whenever
    halo mode is requested so the XLA fallback applies the SAME offset
    clamp (identical semantics either way).
    """
    from ..kernels.dcn_halo import DEFAULT_MAX_OFFSET, halo_supported
    requested, r = _parse_bounded_mode("halo", DEFAULT_MAX_OFFSET)
    if not requested:
        return False, None
    kwargs = {} if dtype is None else {"dtype": dtype}
    return halo_supported(h, w, c, cout, r, **kwargs), r


def rowband_dcn_mode(h: int, w: int, c: int, cout: int, dtype=None):
    """Gate for the row-band one-hot-matmul kernel.

    CENTERPOLY_PALLAS_DCN=rowband or rowband:<R> opts in (R = max
    Y-offset; x-offsets stay exact/unbounded).  Returns (use, R) with
    the same contract as halo_dcn_mode: R is returned whenever rowband
    mode is requested so the XLA fallback applies the SAME y-only clamp.
    """
    from ..kernels.dcn_rowband import (DEFAULT_MAX_OFFSET,
                                       rowband_supported)
    requested, r = _parse_bounded_mode("rowband", DEFAULT_MAX_OFFSET)
    if not requested:
        return False, None
    kwargs = {} if dtype is None else {"dtype": dtype}
    return rowband_supported(h, w, c, cout, r, **kwargs), r


FORMULATIONS.update({
    "fused": deform_conv2d,
    "tapwise": deform_conv2d_tapwise,
    "quad": deform_conv2d_quad,
    "quad_tapwise": deform_conv2d_quad_tapwise,
    "duo": deform_conv2d_duo,
    "duo_tapwise": deform_conv2d_duo_tapwise,
})


class DCNv2(nn.Module):
    """DCNv2 layer: offset/mask conv + deformable sampling + contraction.

    Matches the reference call signature semantics: 3x3, stride 1,
    dilation 1, one deformable group.  The offset conv is zero-initialized
    (standard DCNv2 init: starts as a plain conv).

    The fused Pallas kernel (kernels/dcn_pallas.py) takes the forward when
    supported for the shape (CENTERPOLY_PALLAS_DCN=auto|1); the XLA
    formulation is the correctness oracle and the backward pass."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        # 27 = 18 offsets + 9 masks
        om = nn.Conv(
            27, (3, 3), padding="SAME",
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="conv_offset_mask",
        )(x)
        offsets = om[..., :18]
        masks = jax.nn.sigmoid(om[..., 18:])
        # observability for the bounded-offset kernels: collected only
        # when apply(..., mutable=["intermediates"]) asks for it
        # (tools/analyze_dcn_offsets.py picks R from these)
        self.sow("intermediates", "dcn_offsets", offsets)
        weights = self.param(
            "kernel",
            nn.initializers.he_normal(),
            (3, 3, cin, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        _, h, w, _ = x.shape
        if use_pallas_dcn(h, w, cin, self.features):
            return _deform_conv2d_fast(
                x, offsets, masks, weights.astype(x.dtype),
                bias.astype(x.dtype))
        use_rb, rb_r = rowband_dcn_mode(h, w, cin, self.features,
                                        dtype=x.dtype)
        if rb_r is not None:
            # rowband mode: y-offsets bounded, x exact.  The kernel owns
            # its own clamp (and the 0.5 saturation tie-gradient) — pass
            # it RAW offsets; clamping here too would compose two clamps
            # and halve the gradient at the bound to 0.25
            if use_rb:
                from ..kernels.dcn_rowband import deform_conv2d_rowband
                return deform_conv2d_rowband(
                    x, offsets, masks, weights.astype(x.dtype),
                    bias.astype(x.dtype), rb_r)
            # XLA fallback under rowband mode: apply the identical
            # y-only bound once so the math matches the kernel path
            from ..kernels.dcn_rowband import _clamp_y
            offsets = _clamp_y(offsets, float(rb_r))
        use_halo, r = halo_dcn_mode(h, w, cin, self.features,
                                    dtype=x.dtype)
        if r is not None:
            # halo mode: bounded offsets (documented TPU-native locality
            # bound) — clamp consistently whether the kernel or the XLA
            # fallback runs, so the math is identical either way
            offsets = jnp.clip(offsets, -float(r), float(r))
            if use_halo:
                from ..kernels.dcn_halo import deform_conv2d_halo
                return deform_conv2d_halo(
                    x, offsets, masks, weights.astype(x.dtype),
                    bias.astype(x.dtype), r)
        form = resolve_formulation(x.shape[0], h, w, cin, train)
        fn = FORMULATIONS[form]
        return fn(x, offsets, masks, weights.astype(x.dtype),
                  bias.astype(x.dtype))


class DeformConvBlock(nn.Module):
    """DCNv2 -> BN -> ReLU (ref pose_dla_dcn.py:347-359 DeformConv)."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = DCNv2(self.features, dtype=self.dtype)(x, train)
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=BN_MOMENTUM, dtype=self.dtype)(x)
        return nn.relu(x)
