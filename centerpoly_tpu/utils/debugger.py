"""Debug visualizer: heatmap blends, box/polygon/keypoint overlays.

Behavioral reference: src/lib/utils/debugger.py — an image store keyed by
id, colormap rendering of class heatmaps, coco-style box/pose overlays,
the polydet polygon overlay (:214-234), and save_all_imgs for debug level
4 (opts.py:19-24: 1=only show, 2=+pred/gt heatmaps, 3=ipynb, 4=save all).
OpenCV-based, host-side only.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np


def _color_table(n: int = 80) -> np.ndarray:
    colors = []
    for j in range(n):
        colors.append(((j * 67) % 255, (j * 131) % 255, (j * 197) % 255))
    return np.array(colors, dtype=np.uint8)


class Debugger:
    def __init__(self, num_classes: int = 8,
                 class_names: Optional[List[str]] = None,
                 down_ratio: int = 4, theme: str = "black"):
        self.imgs: Dict[str, np.ndarray] = {}
        self.num_classes = num_classes
        self.names = class_names or [str(i) for i in range(num_classes)]
        self.down_ratio = down_ratio
        self.theme = theme
        self.colors = _color_table(max(num_classes, 32))

    # -- image store ------------------------------------------------------

    def add_img(self, img: np.ndarray, img_id: str = "default"):
        self.imgs[img_id] = img.copy()

    def add_mask(self, mask: np.ndarray, bg: np.ndarray,
                 img_id: str = "default", trans: float = 0.8):
        self.imgs[img_id] = (
            mask.reshape(mask.shape[0], mask.shape[1], 1) * 255 * trans
            + bg * (1 - trans)).astype(np.uint8)

    def add_blend_img(self, back: np.ndarray, fore: np.ndarray,
                      img_id: str = "blend", trans: float = 0.7):
        """Overlay a colormapped heatmap on an image (ref :94-106)."""
        import cv2
        if self.theme == "white":
            fore = 255 - fore
        if fore.shape[:2] != back.shape[:2]:
            fore = cv2.resize(fore, (back.shape[1], back.shape[0]))
        if len(fore.shape) == 2:
            fore = fore.reshape(*fore.shape, 1)
        img = back * (1.0 - trans) + fore * trans
        self.imgs[img_id] = np.clip(img, 0, 255).astype(np.uint8)

    # -- colormaps --------------------------------------------------------

    def gen_colormap(self, img: np.ndarray,
                     output_res=None) -> np.ndarray:
        """(H, W, C) class heatmap -> (h*R, w*R, 3) color render
        (ref :108-140; NHWC here instead of CHW)."""
        import cv2
        h, w, c = img.shape
        if output_res is None:
            output_res = (h * self.down_ratio, w * self.down_ratio)
        colors = self.colors[:c].reshape(1, 1, c, 3).astype(np.float32)
        color_map = (img[..., None] * colors).max(axis=2)  # (H, W, 3)
        color_map = np.clip(color_map, 0, 255).astype(np.uint8)
        return cv2.resize(color_map, (output_res[1], output_res[0]))

    def gen_colormap_hp(self, img: np.ndarray, output_res=None):
        """Joint-heatmap variant (ref :141-169)."""
        return self.gen_colormap(img, output_res)

    # -- overlays ---------------------------------------------------------

    def add_coco_bbox(self, bbox, cat: int, conf: float = 1.0,
                      show_txt: bool = True, img_id: str = "default"):
        import cv2
        bbox = np.array(bbox, dtype=np.int32)
        cat = int(cat)
        c = [int(v) for v in self.colors[cat % len(self.colors)]]
        name = self.names[cat] if cat < len(self.names) else str(cat)
        txt = f"{name}{conf:.1f}"
        cv2.rectangle(self.imgs[img_id], (bbox[0], bbox[1]),
                      (bbox[2], bbox[3]), c, 2)
        if show_txt:
            font = cv2.FONT_HERSHEY_SIMPLEX
            cat_size = cv2.getTextSize(txt, font, 0.5, 2)[0]
            cv2.rectangle(self.imgs[img_id],
                          (bbox[0], bbox[1] - cat_size[1] - 2),
                          (bbox[0] + cat_size[0], bbox[1] - 2), c, -1)
            cv2.putText(self.imgs[img_id], txt, (bbox[0], bbox[1] - 2),
                        font, 0.5, (0, 0, 0), thickness=1,
                        lineType=cv2.LINE_AA)

    def add_polydet(self, vertices, cat: int, conf: float = 1.0,
                    show_txt: bool = True, img_id: str = "default"):
        """Polygon overlay (ref :214-234)."""
        import cv2
        pts = np.asarray(vertices, dtype=np.int32).reshape(-1, 2)
        cat = int(cat)
        c = [int(v) for v in self.colors[cat % len(self.colors)]]
        cv2.polylines(self.imgs[img_id], [pts], True, c, 2)
        if show_txt and len(pts):
            name = self.names[cat] if cat < len(self.names) else str(cat)
            txt = f"{name}{conf:.1f}"
            x0, y0 = int(pts[:, 0].min()), int(pts[:, 1].min())
            cv2.putText(self.imgs[img_id], txt, (x0, max(0, y0 - 2)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, c, 1,
                        lineType=cv2.LINE_AA)

    def add_coco_hp(self, points, img_id: str = "default"):
        """17-joint skeleton overlay (ref :203-213)."""
        import cv2
        edges = [[0, 1], [0, 2], [1, 3], [2, 4], [3, 5], [4, 6], [5, 6],
                 [5, 7], [7, 9], [6, 8], [8, 10], [5, 11], [6, 12],
                 [11, 12], [11, 13], [13, 15], [12, 14], [14, 16]]
        points = np.asarray(points, dtype=np.int32).reshape(-1, 2)
        for j in range(len(points)):
            cv2.circle(self.imgs[img_id], (points[j, 0], points[j, 1]),
                       3, (255, 255, 255), -1)
        for e in edges:
            if e[0] < len(points) and e[1] < len(points):
                cv2.line(self.imgs[img_id],
                         (points[e[0], 0], points[e[0], 1]),
                         (points[e[1], 0], points[e[1], 1]),
                         (255, 0, 255), 2)

    def add_points(self, points, img_id: str = "default"):
        import cv2
        for pt in np.asarray(points).reshape(-1, 2):
            cv2.circle(self.imgs[img_id], (int(pt[0]), int(pt[1])), 3,
                       (0, 255, 255), -1)

    # -- output -----------------------------------------------------------

    def show_all_imgs(self, pause: bool = False):
        import cv2
        for i, v in self.imgs.items():
            cv2.imshow(f"{i}", v)
        cv2.waitKey(0 if pause else 1)

    def save_img(self, img_id: str = "default", path: str = "./debug/"):
        import cv2
        os.makedirs(path, exist_ok=True)
        cv2.imwrite(os.path.join(path, f"{img_id}.png"), self.imgs[img_id])

    def save_all_imgs(self, path: str = "./debug/", prefix: str = ""):
        import cv2
        os.makedirs(path, exist_ok=True)
        for i, v in self.imgs.items():
            cv2.imwrite(os.path.join(path, f"{prefix}{i}.png"), v)


def debug_polydet_batch(debugger: Debugger, image: np.ndarray,
                        hm_pred: np.ndarray, hm_gt: Optional[np.ndarray],
                        dets, gt_dets=None, center_thresh: float = 0.3):
    """Compose the polydet debug views (ref trains/polydet.py:182-218):
    pred/gt heatmap blends + out_pred/out_gt polygon overlays.

    image: uint8 HWC; hm_*: (h, w, C) prob maps at output stride;
    dets rows [x0,y0,x1,y1,score,cls,poly...,depth] at output scale.
    """
    pred_cm = debugger.gen_colormap(hm_pred)
    debugger.add_blend_img(image, pred_cm, "pred_hm")
    if hm_gt is not None:
        gt_cm = debugger.gen_colormap(hm_gt)
        debugger.add_blend_img(image, gt_cm, "gt_hm")
    debugger.add_img(image, img_id="out_pred")
    r = debugger.down_ratio
    for det in np.asarray(dets):
        if det[4] > center_thresh:
            debugger.add_polydet(np.asarray(det[6:-1]) * r, int(det[5]),
                                 det[4], img_id="out_pred")
    if gt_dets is not None:
        debugger.add_img(image, img_id="out_gt")
        for det in np.asarray(gt_dets):
            if det[4] > center_thresh:
                debugger.add_coco_bbox(np.asarray(det[:4]) * r,
                                       int(det[5]), det[4],
                                       img_id="out_gt")
    return debugger
