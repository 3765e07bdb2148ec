"""Soft-NMS for multi-scale test-time merging.

Host numpy implementation of the Soft-NMS algorithm (linear / gaussian /
hard), equivalent in behavior to the reference's Cython extension
(reference: src/lib/external/nms.pyx, used by detectors/polydet.py:62-67
only when multi-scale testing or --nms is on), plus a fixed-shape on-device
variant for fully-fused pipelines.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _iou_single(box, boxes):
    x1 = np.maximum(box[0], boxes[:, 0])
    y1 = np.maximum(box[1], boxes[:, 1])
    x2 = np.minimum(box[2], boxes[:, 2])
    y2 = np.minimum(box[3], boxes[:, 3])
    iw = np.maximum(x2 - x1, 0.0)
    ih = np.maximum(y2 - y1, 0.0)
    inter = iw * ih
    a1 = (box[2] - box[0]) * (box[3] - box[1])
    a2 = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return inter / np.maximum(a1 + a2 - inter, 1e-9)


def soft_nms(dets: np.ndarray, nt: float = 0.5, sigma: float = 0.5,
             thresh: float = 0.001, method: int = 2) -> np.ndarray:
    """In-place soft-NMS over rows [x0, y0, x1, y1, score, ...].

    method: 0 = hard NMS, 1 = linear, 2 = gaussian.  Returns indices kept
    (scores in `dets` are updated in place, matching the Cython extension's
    contract).
    """
    n = dets.shape[0]
    keep = []
    boxes = dets[:, :4]
    scores = dets[:, 4]
    alive = np.ones(n, dtype=bool)
    while True:
        live = np.where(alive)[0]
        if live.size == 0:
            break
        i = live[np.argmax(scores[live])]
        if scores[i] < thresh:
            break
        keep.append(i)
        alive[i] = False
        rest = np.where(alive)[0]
        if rest.size == 0:
            break
        ious = _iou_single(boxes[i], boxes[rest])
        if method == 1:  # linear
            decay = np.where(ious > nt, 1.0 - ious, 1.0)
        elif method == 2:  # gaussian
            decay = np.exp(-(ious * ious) / sigma)
        else:  # hard
            decay = np.where(ious > nt, 0.0, 1.0)
        scores[rest] *= decay
        alive[rest] &= scores[rest] >= thresh
    return np.array(keep, dtype=np.int64)


def soft_nms_39(dets: np.ndarray, nt: float = 0.5, sigma: float = 0.5,
                thresh: float = 0.001, method: int = 2) -> np.ndarray:
    """39-column (pose) variant (ref nms.pyx soft_nms_39) — the algorithm
    only reads cols [:4] and updates col 4, so it is the same routine."""
    return soft_nms(dets, nt=nt, sigma=sigma, thresh=thresh, method=method)


def soft_nms_batch(boxes: jnp.ndarray, scores: jnp.ndarray,
                   sigma: float = 0.5, thresh: float = 0.001) -> jnp.ndarray:
    """Fixed-shape on-device gaussian soft-NMS.

    Args:
      boxes: (K, 4), scores: (K,).  Returns decayed scores (K,) after K
      sequential suppression steps via lax.scan (no dynamic shapes).
    """
    k = scores.shape[0]

    def iou_mat(b):
        x1 = jnp.maximum(b[:, None, 0], b[None, :, 0])
        y1 = jnp.maximum(b[:, None, 1], b[None, :, 1])
        x2 = jnp.minimum(b[:, None, 2], b[None, :, 2])
        y2 = jnp.minimum(b[:, None, 3], b[None, :, 3])
        inter = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
        area = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        return inter / jnp.maximum(area[:, None] + area[None, :] - inter, 1e-9)

    ious = iou_mat(boxes)

    def step(carry, _):
        s, processed = carry
        masked = jnp.where(processed, -jnp.inf, s)
        i = jnp.argmax(masked)
        decay = jnp.exp(-(ious[i] ** 2) / sigma)
        decay = jnp.where(processed, 1.0, decay).at[i].set(1.0)
        s = s * decay
        processed = processed.at[i].set(True)
        return (s, processed), None

    (out, _), _ = jax.lax.scan(
        step, (scores, jnp.zeros(k, dtype=bool)), None, length=k
    )
    return jnp.where(out >= thresh, out, 0.0)


def hard_nms_batch(boxes: jnp.ndarray, scores: jnp.ndarray,
                   iou_thresh: float = 0.7) -> jnp.ndarray:
    """Fixed-shape on-device hard box-NMS: keep mask (K,) bool.

    Functional equivalent of the reference's CUDA bitmask kernel
    (src/tools/voc_eval_lib/nms/nms_kernel.cu) expressed as a lax.scan
    over score-sorted candidates: a box survives iff no higher-scored
    surviving box overlaps it above `iou_thresh`.
    """
    k = scores.shape[0]
    order = jnp.argsort(-scores)
    b = boxes[order]

    x1 = jnp.maximum(b[:, None, 0], b[None, :, 0])
    y1 = jnp.maximum(b[:, None, 1], b[None, :, 1])
    x2 = jnp.minimum(b[:, None, 2], b[None, :, 2])
    y2 = jnp.minimum(b[:, None, 3], b[None, :, 3])
    inter = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    area = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    ious = inter / jnp.maximum(area[:, None] + area[None, :] - inter, 1e-9)

    def step(keep, i):
        # suppressed iff any earlier kept box overlaps too much
        earlier = jnp.arange(k) < i
        sup = jnp.any(keep & earlier & (ious[i] > iou_thresh))
        keep = keep.at[i].set(~sup)
        return keep, None

    keep_sorted, _ = jax.lax.scan(
        step, jnp.ones(k, dtype=bool), jnp.arange(k))
    # unsort back to the input order
    return jnp.zeros(k, dtype=bool).at[order].set(keep_sorted)
