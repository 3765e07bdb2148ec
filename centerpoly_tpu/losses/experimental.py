"""Experimental raster-based losses from the reference (capability parity).

Behavioral reference: src/lib/models/losses.py:961-1090 —
  * DiskLoss (:961-1066): rasterize disks of radius |r| (the last polygon
    channel) at each predicted vertex, IoU against the rasterized GT
    polygon; returned alongside an (disabled in the reference) repulsion
    term.  Constructed by trains/polydet.py:29 but NOT part of the total
    loss — the rasterization is non-differentiable, so these are analysis/
    diagnostic losses, reproduced host-side in numpy.
  * AreaPolyLoss (:1068-1090): rasterize every predicted polygon of an
    image into one mask and MSE against a GT mask.
  * create_mask (:225-277): the rep-aware polygon rasterizer both use
    (vertices offset by a quarter-canvas margin, like the reference).
"""
from __future__ import annotations

import math
from typing import Tuple

import numpy as np


def _fill_polygon(points, height: int, width: int) -> np.ndarray:
    """PIL-polygon-fill equivalent (value 255 inside, like the reference)."""
    from PIL import Image, ImageDraw

    img = Image.new("L", (width, height), 0)
    pts = [(float(x), float(y)) for x, y in points]
    if len(pts) >= 3:
        ImageDraw.Draw(img).polygon(pts, outline=255, fill=255)
    return np.array(img, dtype=np.float32)


def create_mask(pred_row: np.ndarray, target_row: np.ndarray,
                height: int, width: int,
                rep: str = "cartesian") -> Tuple[np.ndarray, np.ndarray]:
    """Rasterize one object's predicted + GT polygons (ref :225-277).

    pred_row/target_row: (2N,) vertex arrays in the head's representation.
    The quarter-canvas offset keeps centered polygons inside the canvas.
    """
    off_x = width // 4
    off_y = height // 4
    n2 = len(pred_row) - (len(pred_row) % 2)

    def polar(row, j):
        return (row[j] * math.cos(row[j + 1]),
                row[j] * math.sin(row[j + 1]))

    pred_pts, gt_pts = [], []
    for j in range(0, n2 - 1, 2):
        if rep == "polar":
            px, py = polar(pred_row, j)
            gx, gy = polar(target_row, j)
        elif rep == "polar_fixed":
            # prediction uses the fixed angle table; GT stays polar
            # (ref :261-272, incl. the literal 2*3.14)
            ang = 2 * 3.14 - 2 * 3.14 / n2 * j
            px = pred_row[j] * math.cos(ang)
            py = pred_row[j] * math.sin(ang)
            gx, gy = polar(target_row, j)
        else:
            px, py = pred_row[j], pred_row[j + 1]
            gx, gy = target_row[j], target_row[j + 1]
        pred_pts.append((px + off_x, py + off_y))
        gt_pts.append((gx + off_x, gy + off_y))
    return (_fill_polygon(pred_pts, height, width),
            _fill_polygon(gt_pts, height, width))


def disk_loss(pred: np.ndarray, mask: np.ndarray, target: np.ndarray,
              height: int, width: int, rep: str = "cartesian"
              ) -> Tuple[float, float]:
    """Disk-vs-GT-polygon IoU loss (ref :961-1066).

    pred/target: (B, K, 2N+1) gathered rows — the extra last channel is
    the disk radius.  Returns (loss, repulsion) like the reference; the
    repulsion term is kept at 0 (disabled in the reference too).

    REFERENCE-EXACT QUIRK (kept deliberately): the vertex loop bound
    `shape[2] - 3` mirrors the reference's `shape[1] - 3`
    (losses.py:1013), which stops one vertex early — the disk at the
    LAST vertex is never rasterized.  Kept because this is a parity
    reproduction of a diagnostic loss, not a training term.
    """
    from PIL import Image, ImageDraw

    off_x = width // 4
    off_y = height // 4
    loss = 0.0
    for b in range(pred.shape[0]):
        for i in range(pred.shape[1]):
            if not mask[b][i]:
                continue
            _, gt_mask = create_mask(pred[b][i], target[b][i],
                                     height, width, rep)
            disks = Image.new("L", (width, height), 0)
            r = math.ceil(abs(float(pred[b][i][-1])))
            draw = ImageDraw.Draw(disks)
            for j in range(0, pred.shape[2] - 3, 2):
                x = float(pred[b][i][j])
                y = float(pred[b][i][j + 1])
                draw.ellipse([(x - r + off_x, y - r + off_y),
                              (x + r + off_x, y + r + off_y)],
                             outline=255, fill=255)
            d = np.array(disks, np.float32)
            inter = float(np.sum((d + gt_mask) == 510))
            union = float(np.sum(d != 0) + np.sum(gt_mask != 0) - inter)
            loss += 1 - inter / (union + 1e-6)
    denom = float(mask.sum()) + 1e-6
    return loss / denom, 0.0


def area_poly_loss(pred: np.ndarray, mask: np.ndarray,
                   target_mask: np.ndarray, centers: np.ndarray) -> float:
    """Rasterized-polygons-vs-GT-mask MSE (ref :1068-1090).

    pred: (B, K, 2N) gathered vertex rows; centers: (B, K, 2);
    target_mask: (B, H, W) GT float masks.

    REFERENCE-EXACT QUIRKS (kept deliberately, losses.py:1075-1089):
    ALL K slots' vertices — including padded/invalid objects — are
    concatenated into ONE polygon outline and filled with a single
    PIL polygon() call, and `mask` enters only the denominator.  A
    per-object masked union fill would be the "intended" semantics,
    but this is a parity reproduction of a diagnostic loss the
    reference never enables in the total."""
    b, _, _ = pred.shape
    h, w = target_mask.shape[1:3]
    loss = 0.0
    for bi in range(b):
        pts = []
        for i in range(pred.shape[1]):
            for j in range(0, pred.shape[2] - 1, 2):
                pts.append((int(pred[bi][i][j] + centers[bi][i][0]),
                            int(pred[bi][i][j + 1] + centers[bi][i][1])))
        m = _fill_polygon(pts, h, w)
        loss += float(np.mean((m - target_mask[bi]) ** 2))
    denom = float(mask.sum()) * pred.shape[2] + 1e-4
    return loss / denom
