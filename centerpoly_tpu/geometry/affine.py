"""Affine transforms for image preprocessing and detection post-processing.

Reproduces the semantics of the reference's host-side cv2 affine pipeline
(reference: src/lib/utils/image.py:27-92) without an OpenCV dependency: the
2x3 matrix is solved in closed form from the same 3 point correspondences,
and `warp_affine` provides an on-device (XLA) bilinear warp so preprocessing
can run on TPU instead of the host.

Layout convention: points are (x, y); images are HWC (host) / NHWC (device).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _get_3rd_point(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Third point completing a right-angle triangle (ref image.py:69-71)."""
    direct = a - b
    return b + np.array([-direct[1], direct[0]], dtype=np.float32)


def _get_dir(src_point, rot_rad: float) -> np.ndarray:
    sn, cs = np.sin(rot_rad), np.cos(rot_rad)
    return np.array(
        [src_point[0] * cs - src_point[1] * sn,
         src_point[0] * sn + src_point[1] * cs],
        dtype=np.float32,
    )


def _solve_affine(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """2x3 affine matrix mapping the 3 src points onto the 3 dst points.

    Closed-form replacement for cv2.getAffineTransform.
    """
    # [x', y']^T = M @ [x, y, 1]^T  for each of the three correspondences.
    ones = np.ones((3, 1), dtype=np.float64)
    a = np.concatenate([src.astype(np.float64), ones], axis=1)  # (3, 3)
    m = np.linalg.solve(a, dst.astype(np.float64))  # (3, 2)
    return m.T.astype(np.float64)  # (2, 3)


def get_affine_transform(
    center,
    scale,
    rot: float,
    output_size,
    shift=(0.0, 0.0),
    inv: bool = False,
) -> np.ndarray:
    """Crop/resize affine used by both train-time augmentation and inference.

    Matches reference src/lib/utils/image.py:27-60: maps a square (or
    rectangular) source window of side `scale` centered at `center` onto the
    `output_size` = (w, h) canvas, with optional rotation (degrees).
    """
    center = np.asarray(center, dtype=np.float32)
    if not isinstance(scale, (np.ndarray, list, tuple)):
        scale = np.array([scale, scale], dtype=np.float32)
    scale = np.asarray(scale, dtype=np.float32)
    shift = np.asarray(shift, dtype=np.float32)

    src_w = scale[0]
    dst_w, dst_h = output_size[0], output_size[1]

    rot_rad = np.pi * rot / 180.0
    src_dir = _get_dir([0, src_w * -0.5], rot_rad)
    dst_dir = np.array([0, dst_w * -0.5], dtype=np.float32)

    src = np.zeros((3, 2), dtype=np.float32)
    dst = np.zeros((3, 2), dtype=np.float32)
    src[0, :] = center + scale * shift
    src[1, :] = center + src_dir + scale * shift
    dst[0, :] = [dst_w * 0.5, dst_h * 0.5]
    dst[1, :] = np.array([dst_w * 0.5, dst_h * 0.5], dtype=np.float32) + dst_dir
    src[2, :] = _get_3rd_point(src[0, :], src[1, :])
    dst[2, :] = _get_3rd_point(dst[0, :], dst[1, :])

    if inv:
        return _solve_affine(dst, src)
    return _solve_affine(src, dst)


def affine_transform_points(pts, trans) -> np.ndarray:
    """Apply a 2x3 affine to an (..., 2) array of (x, y) points."""
    pts = np.asarray(pts, dtype=np.float64)
    out = pts @ np.asarray(trans)[:, :2].T + np.asarray(trans)[:, 2]
    return out


def transform_preds(coords, center, scale, output_size) -> np.ndarray:
    """Map output-grid coords back to source-image coords (ref image.py:19-24).

    One matmul over all points — replaces the reference's per-point loop.
    """
    trans = get_affine_transform(center, scale, 0, output_size, inv=True)
    return affine_transform_points(coords, trans).astype(np.float32)


# ---------------------------------------------------------------------------
# On-device warp (XLA): replaces host cv2.warpAffine in the inference path.
# ---------------------------------------------------------------------------

def warp_affine(image: jax.Array, trans, out_hw, fill: float = 0.0) -> jax.Array:
    """Bilinear affine warp of an HWC image onto an (H, W) canvas.

    `trans` is the forward 2x3 matrix (source -> output). Sampling inverts it
    on the fly so semantics match cv2.warpAffine(..., INTER_LINEAR) with
    constant border `fill`.  jit-friendly: out_hw must be static.

    TPU note: per-pixel 2-D gathers are slow on TPU; use
    `warp_axis_aligned` (matmul-based) when the affine has no
    rotation/shear — which is every inference-path transform (rot=0).
    """
    trans = jnp.asarray(trans, dtype=jnp.float32)
    # Invert [A | t]: x_src = A^-1 (x_dst - t)
    a = trans[:, :2]
    t = trans[:, 2]
    inv_a = jnp.linalg.inv(a)
    out_h, out_w = out_hw
    ys = jnp.arange(out_h, dtype=jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # (H, W)
    dx = gx - t[0]
    dy = gy - t[1]
    # elementwise multiply-add, NOT a matmul: default matmul precision is
    # bf16 on TPU, which quantizes pixel coordinates by ~0.1 px
    sx = dx * inv_a[0, 0] + dy * inv_a[0, 1]
    sy = dx * inv_a[1, 0] + dy * inv_a[1, 1]

    h, w = image.shape[0], image.shape[1]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def sample(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        v = image[yc, xc]
        return jnp.where(valid[..., None], v, fill)

    v00 = sample(y0i, x0i)
    v01 = sample(y0i, x0i + 1)
    v10 = sample(y0i + 1, x0i)
    v11 = sample(y0i + 1, x0i + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    out = (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )
    return out.astype(image.dtype)


def _sampling_matrix(out_size: int, in_size: int, scale, shift):
    """(out, in) bilinear sampling matrix for in = (out - shift) / scale.

    Rows sample with tent weights; out-of-range taps contribute zero
    (constant-border fill 0, like cv2.warpAffine) — no renormalization.
    """
    o = jnp.arange(out_size, dtype=jnp.float32)
    src = (o - shift) / scale                           # (out,)
    i = jnp.arange(in_size, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(src[:, None] - i[None, :]))
    return w


def warp_axis_aligned(image: jax.Array, trans, out_hw) -> jax.Array:
    """Axis-aligned (no rotation/shear) affine warp as two MXU matmuls.

    Equivalent to `warp_affine` for trans = [[ax, 0, tx], [0, ay, ty]]:
    out = W_y @ image @ W_x^T with explicit bilinear sampling matrices —
    the fast TPU form (per-pixel gathers are slow; dense sampling matmuls
    are not).
    """
    trans = jnp.asarray(trans, dtype=jnp.float32)
    out_h, out_w = out_hw
    in_h, in_w, c = image.shape
    wy = _sampling_matrix(out_h, in_h, trans[1, 1], trans[1, 2])
    wx = _sampling_matrix(out_w, in_w, trans[0, 0], trans[0, 2])
    img = image.astype(jnp.float32)
    # highest precision: default TPU f32 dots run bf16 passes, which would
    # quantize pixel values by ~0.4%
    out = jnp.einsum("yi,iwc->ywc", wy, img,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    out = jnp.einsum("xj,yjc->yxc", wx, out,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return out.astype(image.dtype)
