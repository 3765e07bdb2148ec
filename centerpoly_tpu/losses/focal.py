"""Penalty-reduced pixel-wise focal loss (CornerNet variant).

Matches reference src/lib/models/losses.py:146-171 (`_neg_loss`) and the
sigmoid clamp of src/lib/models/utils.py:8-10.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def clamped_sigmoid(x: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """sigmoid clamped to [eps, 1-eps] so log() in the focal loss is safe."""
    return jnp.clip(jax.nn.sigmoid(x), eps, 1.0 - eps)


def focal_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Focal loss on an already-sigmoided heatmap.

    pos (gt == 1): -log(p) (1-p)^2 ; neg: -log(1-p) p^2 (1-gt)^4.
    Normalized by the number of positives; if none, the unnormalized
    negative term is returned (ref losses.py:167-170).
    """
    pos_mask = (gt == 1.0).astype(pred.dtype)
    neg_mask = (gt < 1.0).astype(pred.dtype)
    neg_weights = jnp.power(1.0 - gt, 4)

    pos_loss = jnp.log(pred) * jnp.power(1.0 - pred, 2) * pos_mask
    neg_loss = (
        jnp.log(1.0 - pred) * jnp.power(pred, 2) * neg_weights * neg_mask
    )

    num_pos = jnp.sum(pos_mask)
    pos_sum = jnp.sum(pos_loss)
    neg_sum = jnp.sum(neg_loss)
    return jnp.where(
        num_pos == 0,
        -neg_sum,
        -(pos_sum + neg_sum) / jnp.maximum(num_pos, 1.0),
    )
