"""Prediction-mask rendering for instance-segmentation eval.

Behavioral reference: src/lib/datasets/dataset/cityscapes.py:196-283
(`format_and_write_to_cityscapes`): for every detection above threshold,
rasterize the polygon at full resolution, thicken the contour with
Bresenham lines + radius-2 disks at each contour pixel, process instances
in pseudo-depth order, suppress pixels already claimed by earlier masks
with score >= 0.5, drop excluded classes and regions under 100 px, and
write per-instance PNGs + a txt manifest `mask.png labelID min(1,
score*1.2)`.
"""
from __future__ import annotations

import os
from typing import Dict, List, Sequence, Tuple

import numpy as np
from PIL import Image, ImageDraw


def bresenham_line(x0: int, y0: int, x1: int, y1: int) -> List[Tuple[int, int]]:
    """Integer line rasterization (replaces the `bresenham` pip module)."""
    pts = []
    dx = abs(x1 - x0)
    dy = abs(y1 - y0)
    sx = 1 if x0 < x1 else -1
    sy = 1 if y0 < y1 else -1
    err = dx - dy
    x, y = x0, y0
    while True:
        pts.append((x, y))
        if x == x1 and y == y1:
            break
        e2 = 2 * err
        if e2 > -dy:
            err -= dy
            x += sx
        if e2 < dx:
            err += dx
            y += sy
    return pts


def render_instance_mask(points: Sequence[Tuple[int, int]], size_wh,
                         thicken_radius: int = 2) -> Image.Image:
    """Filled polygon + thickened contour (ref :253-264)."""
    mask = Image.new("L", size_wh, 0)
    draw = ImageDraw.Draw(mask)
    draw.polygon(list(points), outline=255, fill=255)
    contour = bresenham_line(points[-1][0], points[-1][1],
                             points[0][0], points[0][1])
    for i in range(len(points) - 1):
        contour += bresenham_line(points[i][0], points[i][1],
                                  points[i + 1][0], points[i + 1][1])
    r = thicken_radius
    for px, py in set(contour):
        draw.ellipse([(px - r, py - r), (px + r, py + r)],
                     outline=255, fill=255)
    return mask


def rasterize_results(results_per_image: Dict, meta, save_dir: str,
                      id_to_file: Dict[int, str], thresh: float = 0.05):
    """Write eval-format masks + manifests for every image.

    results_per_image: {image_id: {class_ind: (n, 5+2N+1) array-likes}}
      rows [x0, y0, x1, y1, score, poly..., depth] in source coords.
    meta: DatasetMeta (eval_image_size, class_name, label_to_id,
      eval_drop_classes).
    """
    h, w = meta.eval_image_size
    masks_dir = os.path.join(save_dir, "masks")
    os.makedirs(masks_dir, exist_ok=True)

    for image_id, per_class in results_per_image.items():
        image_name = id_to_file[int(image_id)]
        base = os.path.basename(image_name)
        txt_path = os.path.join(save_dir,
                                base.replace(".png", ".txt").replace(
                                    ".jpg", ".txt"))
        lines = []
        to_remove = np.zeros((h, w), dtype=np.uint8)
        params = []
        for cls_ind, rows in per_class.items():
            if cls_ind == "fg":
                continue
            label = meta.class_name[int(cls_ind)]
            for row in np.asarray(rows, dtype=np.float32).reshape(
                    -1, np.asarray(rows).shape[-1] if len(rows) else 1):
                if row[4] > thresh:
                    depth = row[-1]
                    poly = row[5:-1]
                    points = [(int(x), int(y))
                              for x, y in zip(poly[0::2], poly[1::2])]
                    params.append((points, float(row[4]), label,
                                   float(depth)))

        count = 0
        # draw-order: ascending pseudo-depth (ref :239)
        for points, score, label, depth in sorted(params,
                                                  key=lambda a: a[-1]):
            drop = label in meta.eval_drop_classes
            if not drop:
                mask_img = render_instance_mask(points, (w, h))
                mask = np.array(mask_img)
                mask = mask * (1 - to_remove)
            else:
                # reference-exact: drop-class polygons are never drawn
                # (cityscapes.py:242 draws only inside the
                # label != pole/sign/light branch), so their
                # score>=0.5 suppression contribution below is an
                # all-zero mask there too — they do NOT carve pixels
                # out of later instances
                mask = np.zeros((h, w), dtype=np.uint8)
            if score >= 0.5:
                to_remove = np.logical_or(to_remove, mask > 0).astype(
                    np.uint8)
            if not drop and np.count_nonzero(mask) > 100:
                mask_name = base.replace(".png", f"_{count}.png").replace(
                    ".jpg", f"_{count}.png")
                Image.fromarray(mask).save(
                    os.path.join(masks_dir, mask_name))
                lines.append(
                    f"masks/{mask_name} {meta.label_to_id[label]} "
                    f"{min(1, score * 1.2)}\n")
                count += 1
        with open(txt_path, "w") as f:
            f.writelines(lines)
