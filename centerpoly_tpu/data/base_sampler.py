"""Shared GT-encoder machinery for all task samplers.

Factors the augmentation pipeline every reference sampler repeats
(src/lib/datasets/sample/{polydet,ctdet,multi_pose,exdet,ddd}.py):
random crop via center/scale jitter, horizontal flip, affine input warp,
PCA color aug, normalization.  Host-side numpy; NHWC outputs.
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

from ..geometry.affine import get_affine_transform
from .coco_poly import CocoPolyAnnotations

# Cityscapes PCA color-aug eigen decomposition
# (ref dataset/cityscapes.py:101-107)
EIG_VAL = np.array([0.2141788, 0.01817699, 0.00341571], dtype=np.float32)
EIG_VEC = np.array([
    [-0.58752847, -0.69563484, 0.41340352],
    [-0.5832747, 0.00994535, -0.81221408],
    [-0.56089297, 0.71832671, 0.41158938],
], dtype=np.float32)


def color_aug(rng: np.random.RandomState, img: np.ndarray) -> np.ndarray:
    """CornerNet-style brightness/contrast/saturation + PCA lighting
    (ref utils/image.py:234-263). img float32 [0,1] HWC, modified copy."""
    img = img.copy()
    gs = img.mean(axis=2)
    gs_mean = gs.mean()

    def brightness(a):
        img[:] *= a

    def contrast(a):
        img[:] = img * a + gs_mean * (1 - a)

    def saturation(a):
        img[:] = img * a + gs[:, :, None] * (1 - a)

    fns = [brightness, contrast, saturation]
    order = rng.permutation(3)
    for i in order:
        alpha = 1.0 + rng.uniform(-0.4, 0.4)
        fns[i](alpha)
    alpha = rng.normal(scale=0.1, size=(3,))
    img += EIG_VEC @ (EIG_VAL * alpha)
    return img


def _get_border(border: int, size: int) -> int:
    i = 1
    while size - border // i <= border // i:
        i *= 2
    return border // i


class BaseSampler:
    """Callable GT encoder bound to a dataset + config."""

    # default image dims for the fixture fallback when the annotation
    # omits height/width (polydet overrides with the cityscapes frame)
    fallback_hw = (512, 512)

    def __init__(self, cfg, meta, annotations: CocoPolyAnnotations,
                 split: str = "train", img_dir: Optional[str] = None,
                 seed: int = 123):
        self.cfg = cfg
        self.meta = meta
        self.coco = annotations
        self.split = split
        self.img_dir = img_dir
        self.images = annotations.get_img_ids()
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.images)

    def _load_image(self, img_id: int) -> np.ndarray:
        info = self.coco.load_img(img_id)
        # CSV-generated GT carries absolute file_name paths
        # (tools/csv_coco, ref convert_csv_to_coco.py) — os.path.join
        # with an absolute second arg resolves to it regardless of
        # img_dir, matching the reference.
        path = os.path.join(self.img_dir or "", info["file_name"])
        if os.path.isfile(path):
            import cv2
            img = cv2.imread(path)
            if img is not None:
                return img
        # fixture-friendly fallback: deterministic noise of the right size
        h = info.get("height", self.fallback_hw[0])
        w = info.get("width", self.fallback_hw[1])
        r = np.random.RandomState(img_id % (2 ** 31))
        return (r.rand(h, w, 3) * 255).astype(np.uint8)

    def _augment_geometry(self, img: np.ndarray,
                          allow_flip: bool = True
                          ) -> Tuple[np.ndarray, np.ndarray, float, bool]:
        """Random crop jitter + flip (ref sample/ctdet.py:51-72).
        Returns (img, center, scale, flipped)."""
        cfg = self.cfg
        rng = self.rng
        height, width = img.shape[:2]
        c = np.array([width / 2.0, height / 2.0], dtype=np.float32)
        s = max(height, width) * 1.0
        flipped = False
        if self.split == "train":
            if not cfg.not_rand_crop:
                s = s * rng.choice(np.arange(0.6, 1.4, 0.1))
                w_border = _get_border(128, width)
                h_border = _get_border(128, height)
                c[0] = rng.randint(low=w_border, high=width - w_border)
                c[1] = rng.randint(low=h_border, high=height - h_border)
            else:
                sf, cf = cfg.scale, cfg.shift
                c[0] += s * np.clip(rng.randn() * cf, -2 * cf, 2 * cf)
                c[1] += s * np.clip(rng.randn() * cf, -2 * cf, 2 * cf)
                s = s * np.clip(rng.randn() * sf + 1, 1 - sf, 1 + sf)
            if allow_flip and rng.random_sample() < cfg.flip:
                flipped = True
                img = img[:, ::-1, :]
                c[0] = width - c[0] - 1
        return img, c, s, flipped

    def _warp_input(self, img: np.ndarray, c, s, rot: float = 0.0
                    ) -> np.ndarray:
        """Affine warp to (input_h, input_w) + color aug + normalize."""
        cfg = self.cfg
        input_h, input_w = cfg.input_h, cfg.input_w
        trans_input = get_affine_transform(c, s, rot, (input_w, input_h))
        try:
            import cv2
            inp = cv2.warpAffine(img, trans_input.astype(np.float32),
                                 (input_w, input_h),
                                 flags=cv2.INTER_LINEAR)
        except ImportError:
            import jax.numpy as jnp
            from ..geometry.affine import warp_affine
            inp = np.asarray(warp_affine(
                jnp.asarray(img.astype(np.float32)), trans_input,
                (input_h, input_w)))
        inp = inp.astype(np.float32) / 255.0
        if self.split == "train" and not cfg.no_color_aug:
            inp = color_aug(self.rng, inp)
        return (inp - np.asarray(cfg.mean, np.float32)) / np.asarray(
            cfg.std, np.float32)
