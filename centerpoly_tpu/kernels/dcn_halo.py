"""Gather-free Pallas DCNv2: bounded-offset halo/shift decomposition.

The flagship custom kernel (reference CUDA counterpart:
src/lib/models/networks/pose_dla_dcn.py:16,354).  The exact kernel in
dcn_pallas.py needs a row gather that this image's Mosaic cannot compile
(experiments/probe_mosaic_gather.py: every gather form crashes; only
static slices, 2-D dynamic rotates, <=128-lane shuffles and matmuls
compile).  This kernel removes the gather entirely:

  * offsets are clamped to [-R, R] (R = max_offset, default 4);
  * a bilinear sample at (y+ky+dy, x+kx+dx) then touches only pixels at
    integer displacements (u, v) in [-(R+1), R+2] of the output pixel;
  * the feature map is zero-padded by m = R+2 and flattened row-major to
    (Hp*Wp, C); displacement (u, v) becomes ONE dynamic 2-D roll by
    u*Wp + v (pltpu.roll / tpu.dynamic_rotate) — cross-row wraparound
    only pollutes the pad ring, which the crop (and the zero-padded
    modulation mask) kills;
  * the contribution weight is the separable bilinear hat
    max(0, 1-|ky+dy-u|) * max(0, 1-|kx+dx-v|) on the VPU (the absolute
    pixel coordinate cancels — only the offset-vs-displacement residual
    matters);
  * the 9 modulated tap samples contract against the 3x3 weights on the
    MXU into an f32 output accumulator.

Mosaic constraints that shaped this (measured via probe/bisect scripts):
3-D rolls/crops/broadcasts crash the compiler; any block with LANE
dimension 1 (e.g. per-tap masks as (1, 9, N, 1)) crashes it too, so
offsets/masks stay in their natural (B, N, 18)/(B, N, 9) layouts and the
kernel takes static column slices; dynamic rotate is 32-bit-only (rolls
run in f32); big fori_loop carries get spilled by the register allocator
(135 MB+ at production shapes), so accumulation goes through VMEM
scratch and a REVISITED output block instead; and the channel dimension
is grid-blocked (grid = (B, C/CB), CB <= 128) so the whole working set
stays ~50 MB of the 128 MB VMEM.

Semantics: identical to the XLA-path deform_conv2d with offsets
pre-clamped to [-R, R] (zero padding outside the image either way).  The
offset clamp is the one deliberate deviation from the reference's
unbounded offsets — a TPU-native locality bound; trained DCN offsets are
zero-initialised and rarely exceed a few pixels.  deform_conv2d_halo_ref
is the bit-exact jax-level oracle used by the tests.

The backward pass is scatter-free for the same reason (reverse rolls)
and is FOUR lean Pallas sweeps + XLA einsums: three samp-kernel sweeps
emit per-tap weighted samples — hat weights for the value (-> dW,
dmask, db as einsums against g), and the two hat DERIVATIVES (+-1
inside the unit window) whose einsum against gkm = (g @ W_k^T) * m_k
gives d(offset); a dx kernel accumulates the reverse-rolled
hat-weighted cotangent.  One fused backward kernel is impossible on
this toolchain: every (N, 1) temp in the unrolled 9-tap body pads to a
full 128-lane tile and the fused variants measured 140-343 MB of scoped
VMEM against the 128 MB budget.  Contracting hat derivatives in-kernel
against bf16 gkm is numerically wrong too (offset grads are DIFFERENCES
of neighbor correlations — measured 0.33 rel err); the sweep form
differences in f32 before any bf16 store.  Verified against XLA
autodiff of the oracle in interpret mode (tests/test_dcn_halo.py) and
on-chip vs XLA autodiff (experiments/bench_dcn_kernel.py).  One caveat
on comparing offset grads: the bilinear hat's derivative is
discontinuous at integer sample positions, so an offset landing within
~1e-6 of a knot (expectation ~1 per 147k random elements) makes the two
implementations pick different — equally valid — subgradients; judge
agreement by percentile, not max (on-chip p99.9 rel err vs an f32
ground truth is 8e-4, BETTER than the production XLA path's 3.6e-3,
because the sweeps difference in f32 while the XLA path quantizes
bilinear fractions to x.dtype).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_MAX_OFFSET = 4


def _tap_grid():
    ky = np.repeat(np.arange(-1, 2, dtype=np.float32), 3)
    kx = np.tile(np.arange(-1, 2, dtype=np.float32), 3)
    return ky, kx


def deform_conv2d_halo_ref(x, offsets, masks, weights, bias,
                           max_offset: int = DEFAULT_MAX_OFFSET):
    """jax-level oracle: the XLA deform_conv2d on clamped offsets."""
    from ..models.deform_conv import deform_conv2d
    r = float(max_offset)
    return deform_conv2d(x, jnp.clip(offsets, -r, r), masks, weights, bias)


def _geometry(h: int, w: int, R: int) -> Tuple[int, int, int, int]:
    """(m, Hp, Wp, N): pad width, padded dims, flat rows (8-aligned)."""
    m = R + 2
    hp, wp = h + 2 * m, w + 2 * m
    n = hp * wp
    n = (n + 7) // 8 * 8  # sublane alignment; extension rows are masked
    return m, hp, wp, n


def _pad_flat(t, m: int, n: int):
    """(B, H, W, F) -> (B, N, F) zero-padded + row-major flattened.

    Done OUTSIDE the kernel: XLA pads/reshapes fuse for free while any
    in-kernel 3-D op crashes this Mosaic build.
    """
    b, h, w, f = t.shape
    tp = jnp.pad(t, ((0, 0), (m, m), (m, m), (0, 0)))
    flat = tp.reshape(b, (h + 2 * m) * (w + 2 * m), f)
    extra = n - flat.shape[1]
    if extra:
        flat = jnp.pad(flat, ((0, 0), (0, extra), (0, 0)))
    return flat


def _crop_flat(t, h: int, w: int, m: int):
    """(B, N, F) -> (B, H, W, F): undo _pad_flat (outside the kernel)."""
    b = t.shape[0]
    hp, wp = h + 2 * m, w + 2 * m
    return t[:, :hp * wp, :].reshape(b, hp, wp, -1)[:, m:m + h, m:m + w, :]


def _fwd_kernel(x_ref, off_ref, mask_ref, w_ref, b_ref, o_ref,
                *acc, N, Wp, CB, Cout, R):
    """One (batch, channel-block) grid step; output block is revisited
    across channel blocks and accumulated in f32.

    Displacement loop OUTER: each of the (2R+3)^2 integer displacements
    rolls the feature block ONCE and feeds all 9 tap accumulators —
    ~10x less roll traffic than a per-tap displacement sweep (which
    measured 13x slower than XLA)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D = 2 * R + 3                             # u, v in [-(R+1), R+1]
    cb = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)          # (N, CB); rolls are 32-bit
    cdt = x_ref.dtype

    @pl.when(cb == 0)
    def _init():
        o_ref[0] = jnp.broadcast_to(b_ref[:].astype(jnp.float32),
                                    (N, Cout))

    ky, kx = _tap_grid()
    for k in range(9):
        acc[k][:] = jnp.zeros((N, CB), jnp.float32)

    def uv_body(i, _):
        u = i // D - (R + 1)
        v = jnp.mod(i, D) - (R + 1)
        uf = u.astype(jnp.float32)
        vf = v.astype(jnp.float32)
        rolled = pltpu.roll(x, jnp.mod(-(u * Wp + v), N), 0)
        for k in range(9):
            # static column slices: lane-dim-1 block layouts crash Mosaic
            dy = off_ref[0][:, 2 * k:2 * k + 1] + ky[k]   # (N, 1)
            dx = off_ref[0][:, 2 * k + 1:2 * k + 2] + kx[k]
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(dy - uf))
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(dx - vf))
            acc[k][:] += (wy * wx) * rolled
        return 0

    jax.lax.fori_loop(0, D * D, uv_body, 0)
    for k in range(9):
        m_k = mask_ref[0][:, k:k + 1]                     # (N, 1); 0 pad
        o_ref[0] += jnp.dot((acc[k][:] * m_k).astype(cdt),
                            w_ref[k].astype(cdt),
                            preferred_element_type=jnp.float32)


def _samp_kernel(x_ref, off_ref, samp_ref, *, N, Wp, CB, R, mode="val"):
    """Per-tap weighted-sample sweep for the backward pass.

    mode='val' emits samp[k] = sum_uv hat_k(uv) * x(. + uv) — the only
    roll-dependent forward quantity the gradients need; dW, dmask and
    db are then plain contractions of samp/g that XLA fuses outside the
    kernel (keeping them in-kernel blew VMEM: every (N, 1) temp is
    padded to a full 128-lane tile by Mosaic).

    mode='dy'/'dx' swap one hat factor for its derivative (+-1 inside
    the unit window): the result contracts against gkm = (g @ W_k^T)*m_k
    outside the kernel to give d(offset).  Doing that differencing here
    in f32 BEFORE any bf16 store is what keeps offset grads accurate —
    contracting bf16-quantized gkm against per-cell correlations
    in-kernel measured 0.33 rel err on-chip."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D = 2 * R + 3
    x = x_ref[0]                              # f32 (pre-cast outside)
    sdt = samp_ref.dtype                      # x.dtype: halves the
    ky, kx = _tap_grid()                      # double-buffered out block
    for k in range(9):
        samp_ref[0, k] = jnp.zeros((N, CB), sdt)

    def uv_body(i, _):
        u = i // D - (R + 1)
        v = jnp.mod(i, D) - (R + 1)
        uf = u.astype(jnp.float32)
        vf = v.astype(jnp.float32)
        rolled = pltpu.roll(x, jnp.mod(-(u * Wp + v), N), 0)
        for k in range(9):
            ay = off_ref[0][:, 2 * k:2 * k + 1] + ky[k] - uf
            ax = off_ref[0][:, 2 * k + 1:2 * k + 2] + kx[k] - vf
            # hat derivative uses the ONE-SIDED floor/frac convention
            # (-1 on [0,1), +1 on [-1,0)); -sign(a) is 0 at integer
            # displacements — i.e. at zero offset init — where the
            # oracle's derivative is -1, and grads would freeze there.
            if mode == "dy":
                fy = jnp.where((ay >= 0.0) & (ay < 1.0), -1.0,
                               jnp.where((ay >= -1.0) & (ay < 0.0),
                                         1.0, 0.0))
            else:
                fy = jnp.maximum(0.0, 1.0 - jnp.abs(ay))
            if mode == "dx":
                fx = jnp.where((ax >= 0.0) & (ax < 1.0), -1.0,
                               jnp.where((ax >= -1.0) & (ax < 0.0),
                                         1.0, 0.0))
            else:
                fx = jnp.maximum(0.0, 1.0 - jnp.abs(ax))
            # <=4 of the (2R+3)^2 hat cells are nonzero per pixel, so
            # low-precision accumulation is effectively a 4-term sum
            samp_ref[0, k] += ((fy * fx) * rolled).astype(sdt)
        return 0

    jax.lax.fori_loop(0, D * D, uv_body, 0)


def _dx_kernel(off_ref, gkm_ref, dx_ref, dx_s, *, N, Wp, CB, R):
    """dx for one (batch, channel-block) grid step.

    gkm = (g @ W_k^T) * m_k arrives as an input (XLA computes it — a
    plain einsum); dx accumulates ONE reverse roll per displacement of
    the tap-summed hat-weighted cotangent.  No feature input needed.
    dx and d(offset) are SEPARATE kernels: a combined body keeps every
    unrolled tap's (N, 1) temps live, each padded to a full 128-lane
    tile (measured 140-343 MB of scoped VMEM in fused variants)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D = 2 * R + 3
    cdt = gkm_ref.dtype
    ky, kx = _tap_grid()
    dx_s[:] = jnp.zeros((N, CB), jnp.float32)

    def uv_body(i, _):
        u = i // D - (R + 1)
        v = jnp.mod(i, D) - (R + 1)
        uf = u.astype(jnp.float32)
        vf = v.astype(jnp.float32)
        t = jnp.zeros((N, CB), cdt)
        for k in range(9):
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(
                off_ref[0][:, 2 * k:2 * k + 1] + ky[k] - uf))
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(
                off_ref[0][:, 2 * k + 1:2 * k + 2] + kx[k] - vf))
            t += (wy * wx).astype(cdt) * gkm_ref[0, k]
        dx_s[:] += pltpu.roll(t.astype(jnp.float32),
                              jnp.mod(u * Wp + v, N), 0)
        return 0

    jax.lax.fori_loop(0, D * D, uv_body, 0)
    dx_ref[0] = dx_s[:].astype(dx_ref.dtype)




_VMEM_BUDGET = 100 * 1024 * 1024  # leave headroom under the 128 MB limit


def _fwd_vmem(n: int, cb: int, cout: int) -> int:
    """Rough fwd working set: f32 x copy + rolled temps + 9 accumulators
    + f32 output block + offset/mask columns."""
    return 4 * n * (13 * cb + cout + 27)


def _bwd_vmem(n: int, cb: int, cout: int) -> int:
    """Max working set of the two backward kernels (bf16 gkm input):
    samp kernel = f32 x + 9-plane f32 output block + roll temps;
    dxoff kernel = f32 x + bf16 gkm block + dx scratch + roll/carry
    temps (every (N, 1)/(N, 18) value pads to 128 lanes)."""
    samp = 36 * n * cb + 4 * n * (4 * cb + 64)
    dxoff = 36 * n * cb + 4 * n * (6 * cb + 192)
    return max(samp, dxoff)


def _channel_block(c: int, n: int, cout: int, vmem_fn) -> int:
    """Channel block whose working set fits VMEM.

    Mosaic requires a block's lane dimension to be a multiple of 128 or
    equal to the full array dimension, so the only legal blocks are
    c itself (c <= 128) or 128 (c a multiple of 128).  Returns 0 when
    neither fits (caller falls back to the XLA path — e.g. the stride-4
    DLA map, whose 140k flat rows cannot hold 9 per-tap accumulators in
    VMEM without row blocking)."""
    for cb in ((c,) if c <= 128 else (128,)):
        if c % cb == 0 and vmem_fn(n, cb, cout) <= _VMEM_BUDGET:
            return cb
    return 0


def _pallas_fwd(x, offsets, masks, weights, bias, R, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    cout = weights.shape[-1]
    m, hp, wp, n = _geometry(h, w, R)
    cbs = _channel_block(c, n, cout, _fwd_vmem)
    if not cbs:
        raise ValueError(f"halo kernel: no channel block fits VMEM for "
                         f"shape {(h, w, c, cout)}")
    r = float(R)
    xf = _pad_flat(x, m, n)
    of = _pad_flat(jnp.clip(offsets, -r, r), m, n)
    mf = _pad_flat(masks, m, n)
    kern = functools.partial(_fwd_kernel, N=n, Wp=wp, CB=cbs, Cout=cout,
                             R=R)
    out = pl.pallas_call(
        kern,
        grid=(b, c // cbs),
        in_specs=[
            pl.BlockSpec((1, n, cbs), lambda bi, cb: (bi, 0, cb)),
            pl.BlockSpec((1, n, 18), lambda bi, cb: (bi, 0, 0)),
            pl.BlockSpec((1, n, 9), lambda bi, cb: (bi, 0, 0)),
            pl.BlockSpec((9, cbs, cout), lambda bi, cb: (0, cb, 0)),
            pl.BlockSpec((cout,), lambda bi, cb: (0,)),
        ],
        out_specs=pl.BlockSpec((1, n, cout), lambda bi, cb: (bi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, cout), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n, cbs), jnp.float32)
                        for _ in range(9)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(xf, of, mf, weights.reshape(9, c, cout), bias)
    return _crop_flat(out, h, w, m).astype(x.dtype)


def _pallas_bwd(x, offsets, masks, weights, g, R, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    cout = weights.shape[-1]
    m, hp, wp, n = _geometry(h, w, R)
    cbs = _channel_block(c, n, cout, _bwd_vmem)
    if not cbs:
        raise ValueError(f"halo kernel bwd: no channel block fits VMEM "
                         f"for shape {(h, w, c, cout)}")
    r = float(R)
    f32 = jnp.float32
    xf = _pad_flat(x, m, n).astype(f32)       # rolls are 32-bit
    of = _pad_flat(jnp.clip(offsets, -r, r), m, n)
    mf = _pad_flat(masks, m, n)
    gf = _pad_flat(g, m, n).astype(f32)       # zero pad ring
    w9 = weights.reshape(9, c, cout)
    limit = pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024)

    # Pallas 1-3: per-tap weighted-sample sweeps (value + the two hat
    # derivatives for d(offset))
    def samp_sweep(mode):
        return pl.pallas_call(
            functools.partial(_samp_kernel, N=n, Wp=wp, CB=cbs, R=R,
                              mode=mode),
            grid=(b, c // cbs),
            in_specs=[
                pl.BlockSpec((1, n, cbs), lambda bi, cb: (bi, 0, cb)),
                pl.BlockSpec((1, n, 18), lambda bi, cb: (bi, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 9, n, cbs),
                                   lambda bi, cb: (bi, 0, 0, cb)),
            out_shape=jax.ShapeDtypeStruct((b, 9, n, c), x.dtype),
            compiler_params=limit,
            interpret=interpret,
        )(xf, of)

    samp = samp_sweep("val")
    sampgy = samp_sweep("dy")
    sampgx = samp_sweep("dx")

    # XLA: every contraction of samp/g is a fused einsum on the MXU
    gk = jnp.einsum('bno,kco->bknc', gf, w9.astype(f32))
    dmask = jnp.einsum('bknc,bknc->bkn', gk,
                       samp.astype(f32)).transpose(0, 2, 1)
    dw = jnp.einsum('bknc,bnk,bno->kco', samp.astype(f32), mf, gf)
    db = jnp.sum(gf, axis=(0, 1))
    gkmf = gk * mf.transpose(0, 2, 1)[..., None]      # f32 (B, 9, N, C)
    doff = jnp.stack(
        [jnp.einsum('bknc,bknc->bkn', gkmf, sampgy.astype(f32)),
         jnp.einsum('bknc,bknc->bkn', gkmf, sampgx.astype(f32))],
        axis=-1).transpose(0, 2, 1, 3).reshape(b, n, 18)
    gkm = gkmf.astype(x.dtype)

    # Pallas 4: dx (reverse-roll sweep; needs only gkm + offsets)
    dx = pl.pallas_call(
        functools.partial(_dx_kernel, N=n, Wp=wp, CB=cbs, R=R),
        grid=(b, c // cbs),
        in_specs=[
            pl.BlockSpec((1, n, 18), lambda bi, cb: (bi, 0, 0)),
            pl.BlockSpec((1, 9, n, cbs), lambda bi, cb: (bi, 0, 0, cb)),
        ],
        out_specs=pl.BlockSpec((1, n, cbs), lambda bi, cb: (bi, 0, cb)),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((n, cbs), f32)],
        compiler_params=limit,
        interpret=interpret,
    )(of, gkm)
    return (_crop_flat(dx, h, w, m), _crop_flat(doff, h, w, m),
            _crop_flat(dmask, h, w, m),
            dw.reshape(3, 3, c, cout), db)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def deform_conv2d_halo(x, offsets, masks, weights, bias,
                       max_offset: int = DEFAULT_MAX_OFFSET,
                       interpret: bool = False):
    """Fused bounded-offset DCNv2 (Pallas fwd + Pallas bwd).

    Same contract as deform_conv2d with offsets clamped to
    [-max_offset, max_offset]; deform_conv2d_halo_ref is the oracle.
    """
    if bias is None:
        bias = jnp.zeros((weights.shape[-1],), x.dtype)
    return _pallas_fwd(x, offsets, masks, weights, bias, max_offset,
                       interpret)


def _halo_fwd_rule(x, offsets, masks, weights, bias, max_offset, interpret):
    out = deform_conv2d_halo(x, offsets, masks, weights, bias,
                             max_offset, interpret)
    return out, (x, offsets, masks, weights)


def _halo_bwd_rule(max_offset, interpret, res, g):
    x, offsets, masks, weights = res
    dx, doff, dmask, dw, db = _pallas_bwd(
        x, offsets, masks, weights, g.astype(x.dtype), max_offset,
        interpret)
    # clamp pass-through: zero offset grads where the clamp saturated,
    # INCLUDING the exact bound.  jnp.clip's tie convention would pass
    # 0.5 of a one-sided derivative there, but the derivative's
    # floor+1 cell for the extreme taps (|ky|=1 toward the bound) lies
    # outside the swept band u ∈ [-(R+1), R+1], so the kernel cannot
    # reproduce it; exact-bound offsets are measure-zero in training
    # and the clamp itself is already our deviation from the reference.
    r = float(max_offset)
    doff = jnp.where((offsets > -r) & (offsets < r), doff, 0.0)
    return (dx, doff.astype(offsets.dtype), dmask.astype(masks.dtype),
            dw.astype(weights.dtype), db.astype(jnp.float32).astype(
                weights.dtype))


deform_conv2d_halo.defvjp(_halo_fwd_rule, _halo_bwd_rule)


_HALO_PROBED: dict = {}


def halo_supported(h: int, w: int, c: int, cout: int,
                   max_offset: int = DEFAULT_MAX_OFFSET,
                   dtype=jnp.bfloat16) -> bool:
    """Compile-probe the halo kernel for a shape on the current backend.

    `dtype` must be the activation dtype that will actually run: Mosaic
    support can differ between bf16 and f32, so the probe key includes it
    (f32-activation training must not discover a compile failure at step
    time after a bf16 probe passed).
    """
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    if platform != "tpu":
        return False
    dtype = jnp.dtype(dtype)
    key = (h, w, c, cout, max_offset, dtype.name)
    if key not in _HALO_PROBED:
        # cheap static gate before any compile: both directions must fit
        _, _, _, n = _geometry(h, w, max_offset)
        if (not _channel_block(c, n, cout, _fwd_vmem)
                or not _channel_block(c, n, cout, _bwd_vmem)):
            _HALO_PROBED[key] = False
            return False
        try:
            xp = jnp.zeros((1, h, w, c), dtype)
            off = jnp.zeros((1, h, w, 18), jnp.float32)
            mk = jnp.ones((1, h, w, 9), jnp.float32)
            wt = jnp.zeros((3, 3, c, cout), dtype)
            bs = jnp.zeros((cout,), dtype)

            def loss(*a):
                return jnp.sum(deform_conv2d_halo(*a, max_offset).astype(
                    jnp.float32) ** 2)

            # fwd AND bwd must compile: training must not discover a
            # Mosaic failure at step time
            jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4))).lower(
                xp, off, mk, wt, bs).compile()
            _HALO_PROBED[key] = True
        except Exception:
            _HALO_PROBED[key] = False
    return _HALO_PROBED[key]
