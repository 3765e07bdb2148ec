"""Polygon losses: L1 (cartesian / polar / polar_fixed / deadzone), exact
polygon-IoU, and the vertex-order loss.

Behavioral reference: src/lib/models/losses.py:833-959 (PolyLoss.forward).
The reference's IoU branch runs a per-object Python Weiler-Atherton clip on
GPU tensors; here it is the fixed-shape triangle-fan intersection from
`geometry.polygon`, vmapped over every object slot and masked — one fused
XLA computation for the whole batch.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry.polygon import polar_to_cartesian, polygon_iou
from ..ops.gather import gather_feat_nhwc


def _unwrap_angles(angles: jnp.ndarray) -> jnp.ndarray:
    """Reference's angle unwrap (losses.py:894-899), vectorized.

    Once any positive angle has been seen (scanning vertex order), negative
    angles get +2*3.14 (the reference uses the literal 3.14).
    """
    seen_pos = jnp.cumsum((angles > 0).astype(jnp.int32), axis=-1) > 0
    return jnp.where((angles < 0) & seen_pos, angles + 2 * 3.14, angles)


def order_loss(pred_poly: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Vertex-order penalty: sum of positive angle inversions.

    pred_poly: (B, K, 2N) polar predictions; mask: (B, K).
    loss = sum_{j<k} max(0, theta_j - theta_k) over masked objects,
    normalized by (10 * mask.sum() + 1e-4)  (ref losses.py:891-906).
    """
    angles = _unwrap_angles(pred_poly[..., 1::2])  # (B, K, N)
    n = angles.shape[-1]
    diff = angles[..., :, None] - angles[..., None, :]  # (B, K, N, N)
    upper = jnp.triu(jnp.ones((n, n), dtype=bool), k=1)
    # Reference iterates j in [0, N-1), k in [j, N): pairs j < k (j == k
    # contributes 0), i.e. the strict upper triangle.
    pos = jnp.maximum(diff, 0.0) * upper
    per_obj = jnp.sum(pos, axis=(-1, -2))
    total = jnp.sum(per_obj * mask.astype(per_obj.dtype))
    return total / (10.0 * jnp.sum(mask.astype(per_obj.dtype)) + 1e-4)


def poly_iou_loss(pred_poly: jnp.ndarray, target_poly: jnp.ndarray,
                  mask: jnp.ndarray) -> jnp.ndarray:
    """Mean (1 - IoU) over masked objects, polar representation.

    Per object (ref losses.py:876-888): sort predicted (r, theta) vertex
    pairs by theta, take |r|, compute exact polygon IoU against the target
    polygon; loss = 1 - sum(IoU) / (mask.sum() + 1e-6).
    """
    b, k, n2 = pred_poly.shape
    n = n2 // 2
    pred = pred_poly.reshape(b, k, n, 2)
    tgt = target_poly.reshape(b, k, n, 2)

    order = jnp.argsort(pred[..., 1], axis=-1)
    pred_sorted = jnp.take_along_axis(pred, order[..., None], axis=2)
    pred_sorted = jnp.concatenate(
        [jnp.abs(pred_sorted[..., 0:1]), pred_sorted[..., 1:2]], axis=-1
    )

    pred_xy = polar_to_cartesian(pred_sorted)
    tgt_xy = polar_to_cartesian(tgt)

    iou = jax.vmap(jax.vmap(polygon_iou))(pred_xy, tgt_xy)  # (B, K)
    m = mask.astype(iou.dtype)
    iou_sum = jnp.sum(iou * m)
    return 1.0 - iou_sum / (jnp.sum(m) + 1e-6)


def poly_l1_loss(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray,
                 rep: str, deadzone: float | None = None) -> jnp.ndarray:
    """Masked L1 over polygon channels (ref losses.py:910-945).

    pred/target: (B, K, 2N); mask: (B, K).
      cartesian    -> plain masked L1.
      polar        -> L1 on radii (even channels) + sum(1 - cos(dtheta)).
      polar_fixed  -> L1 on radii only.
      deadzone (rep='cartesian' + poly_loss='relu') -> only |err| >= alpha
        counts (alpha = 20, ref losses.py:913-918).
    Normalized by expanded mask sum (objects x 2N) + 1e-6.
    """
    m = jnp.broadcast_to(mask[..., None].astype(pred.dtype), pred.shape)
    norm = jnp.sum(m) + 1e-6
    if rep == "cartesian":
        err = jnp.abs(pred * m - target * m)
        if deadzone is not None:
            err = err * (err >= deadzone)
        return jnp.sum(err) / norm
    # polar variants: even channels are radii, odd channels are angles
    radii_mask = jnp.zeros(pred.shape[-1], dtype=pred.dtype)
    radii_mask = radii_mask.at[0::2].set(1.0)
    rm = radii_mask[None, None, :]
    loss = jnp.sum(jnp.abs(pred * m * rm - target * m * rm))
    if rep == "polar":
        am = (1.0 - radii_mask)[None, None, :]
        loss = loss + jnp.sum(1.0 - jnp.cos(pred * m * am - target * m * am))
    elif rep != "polar_fixed":
        raise NotImplementedError(f"rep={rep}")
    return loss / norm


def poly_loss(
    output: jnp.ndarray,
    mask: jnp.ndarray,
    ind: jnp.ndarray,
    target: jnp.ndarray,
    rep: str = "cartesian",
    kind: str = "l1",
    with_order: bool = False,
):
    """Full polygon loss dispatch (ref losses.py:838-959).

    Args:
      output: (B, H, W, 2N) polygon head map.
      mask: (B, K) object validity; ind: (B, K) flat peak indices.
      target: (B, K, 2N) GT polygons in `rep` representation.
      kind: 'l1' | 'iou' | 'l1+iou' | 'relu'.
      with_order: also return the vertex-order loss.

    Returns loss, or (loss, order) when with_order.
    """
    pred = gather_feat_nhwc(output, ind)  # (B, K, 2N)

    loss = 0.0
    if kind in ("iou", "l1+iou", "relu"):
        # The reference adds its IoU branch for all three kinds and for
        # EVERY rep — but it computes IoU on the raw channel pairs
        # sorted by column 1 (losses.py:877-887), i.e. it treats
        # cartesian (x, y) as (r, theta).  This repo's poly_iou_loss is
        # the conscious fix (true-coordinate IoU via polar->cartesian),
        # which is only meaningful for polar reps; with rep='cartesian'
        # the IoU term is dropped for 'relu' (the deadzone L1 remains,
        # the reference's relu+cartesian main term) and is an error for
        # the explicitly-IoU kinds.
        if rep == "cartesian":
            if kind != "relu":
                raise ValueError(
                    "poly_loss kind 'iou'/'l1+iou' requires a polar "
                    "rep: poly_iou_loss sorts (r, theta) pairs by theta")
        else:
            loss = poly_iou_loss(pred, target, mask)
    if kind in ("l1", "l1+iou"):
        loss = loss + poly_l1_loss(pred, target, mask, rep)
    elif kind == "relu":
        loss = loss + poly_l1_loss(pred, target, mask, rep, deadzone=20.0)

    if with_order:
        return loss, order_loss(pred, mask)
    return loss
