"""Gaussian target splatting for center heatmaps.

Host-side numpy versions mirror the reference GT encoder exactly
(reference: src/lib/utils/image.py:95-173), and `render_heatmap` is a
vectorized on-device alternative that renders all objects in one masked
max-reduction (no per-object Python loop) for an on-TPU input pipeline.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def gaussian_radius(det_size, min_overlap: float = 0.7) -> float:
    """CornerNet radius so any center within it keeps IoU>=min_overlap.

    Matches reference image.py:95-115 (three quadratic cases, min).
    """
    height, width = det_size

    a1 = 1.0
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    sq1 = np.sqrt(b1 ** 2 - 4 * a1 * c1)
    r1 = (b1 + sq1) / 2

    a2 = 4.0
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    sq2 = np.sqrt(b2 ** 2 - 4 * a2 * c2)
    r2 = (b2 + sq2) / 2

    a3 = 4.0 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    sq3 = np.sqrt(b3 ** 2 - 4 * a3 * c3)
    r3 = (b3 + sq3) / 2
    return min(r1, r2, r3)


def _gaussian2d(shape, sigma: float) -> np.ndarray:
    m, n = [(s - 1.0) / 2.0 for s in shape]
    y, x = np.ogrid[-m:m + 1, -n:n + 1]
    h = np.exp(-(x * x + y * y) / (2 * sigma * sigma))
    h[h < np.finfo(h.dtype).eps * h.max()] = 0
    return h


def splat_gaussian(heatmap: np.ndarray, center, radius: int, k: float = 1.0):
    """Max-merge a round gaussian patch into `heatmap` (ref image.py:126-141)."""
    diameter = 2 * radius + 1
    gaussian = _gaussian2d((diameter, diameter), sigma=diameter / 6)
    x, y = int(center[0]), int(center[1])
    height, width = heatmap.shape[:2]
    left, right = min(x, radius), min(width - x, radius + 1)
    top, bottom = min(y, radius), min(height - y, radius + 1)
    if right + left <= 0 or bottom + top <= 0:
        return heatmap
    masked_heatmap = heatmap[y - top:y + bottom, x - left:x + right]
    masked_gaussian = gaussian[radius - top:radius + bottom,
                               radius - left:radius + right]
    if min(masked_gaussian.shape) > 0 and min(masked_heatmap.shape) > 0:
        np.maximum(masked_heatmap, masked_gaussian * k, out=masked_heatmap)
    return heatmap


def _gaussian_ellipse2d(shape, sigma: float) -> np.ndarray:
    """Elliptical gaussian patch; formula matches ref image.py:144-156.

    shape = (2*radius_y+1, 2*radius_x+1).  Note the reference scales row
    offsets by W/max and column offsets by H/max (its x/y names are swapped
    but self-consistent); reproduced as-is for target parity.
    """
    h, w = shape
    max_radius = max(h, w)
    row_scale = w / max_radius
    col_scale = h / max_radius
    rows = (np.arange(h) - h // 2) * row_scale
    cols = (np.arange(w) - w // 2) * col_scale
    val = (rows[:, None] ** 2 + cols[None, :] ** 2) / (2 * sigma ** 2)
    return np.exp(-val)


def splat_ellipse_gaussian(heatmap: np.ndarray, center, radius_x: int,
                           radius_y: int, k: float = 1.0):
    """Max-merge an elliptical gaussian (ref image.py:159-173)."""
    x, y = int(center[0]), int(center[1])
    height, width = heatmap.shape[:2]
    left, right = min(x, radius_x), min(width - x, radius_x + 1)
    top, bottom = min(y, radius_y), min(height - y, radius_y + 1)
    sigma = (2 * min(radius_x, radius_y) + 1) / 6
    gaussian = _gaussian_ellipse2d((2 * radius_y + 1, 2 * radius_x + 1), sigma)
    masked_heatmap = heatmap[y - top:y + bottom, x - left:x + right]
    masked_gaussian = gaussian[radius_y - top:radius_y + bottom,
                               radius_x - left:radius_x + right]
    if min(masked_gaussian.shape) > 0 and min(masked_heatmap.shape) > 0:
        np.maximum(masked_heatmap, masked_gaussian * k, out=masked_heatmap)
    return heatmap


def render_heatmap(centers, radii, class_ids, mask, num_classes: int,
                   out_hw) -> jnp.ndarray:
    """Vectorized on-device heatmap render: all K objects in one reduction.

    Args:
      centers: (K, 2) float (x, y) in output-grid coords.
      radii: (K, 2) float (radius_x, radius_y) — round gaussians pass equal
        values; elliptical semantics follow `_gaussian_ellipse2d`.
      class_ids: (K,) int32.
      mask: (K,) bool/0-1 validity.
      num_classes: C.
      out_hw: static (H, W).

    Returns (C, H, W) heatmap = per-class max over objects. Fixed-shape; the
    per-object patch windows of the host version become a full-map masked
    gaussian (values outside the integer radius box are zeroed to match the
    patch cut-off of the reference splat).
    """
    h, w = out_hw
    centers = jnp.asarray(centers, dtype=jnp.float32)
    radii = jnp.asarray(radii, dtype=jnp.float32)
    mask = jnp.asarray(mask)
    cx = jnp.floor(centers[:, 0])[:, None, None]  # int-cast center like host
    cy = jnp.floor(centers[:, 1])[:, None, None]
    rx = radii[:, 0][:, None, None]
    ry = radii[:, 1][:, None, None]
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    dy = ys - cy
    dx = xs - cx
    hh = 2 * ry + 1
    ww = 2 * rx + 1
    mx = jnp.maximum(hh, ww)
    row_scale = ww / mx
    col_scale = hh / mx
    sigma = (2 * jnp.minimum(rx, ry) + 1) / 6
    val = ((dy * row_scale) ** 2 + (dx * col_scale) ** 2) / (2 * sigma ** 2)
    g = jnp.exp(-val)
    inside = (jnp.abs(dx) <= rx) & (jnp.abs(dy) <= ry)
    g = jnp.where(inside & mask[:, None, None].astype(bool), g, 0.0)  # (K,H,W)
    onehot = (jnp.arange(num_classes)[:, None] ==
              jnp.asarray(class_ids)[None, :]).astype(jnp.float32)  # (C, K)
    # per-class max over objects of that class
    g_cls = onehot[:, :, None, None] * g[None, :, :, :]
    return jnp.max(g_cls, axis=1)
