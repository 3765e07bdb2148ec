"""Masked regression losses at gathered peak indices.

Matches reference src/lib/models/losses.py:817-830 (RegL1Loss) and
:201-216 (RegLoss, smooth-L1): predictions are gathered from the NHWC head
map at flat peak indices, masked by object validity, and normalized by the
count of masked elements.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.gather import gather_feat_nhwc


def reg_l1_loss(output: jnp.ndarray, mask: jnp.ndarray, ind: jnp.ndarray,
                target: jnp.ndarray) -> jnp.ndarray:
    """L1 at peaks. output (B,H,W,D); mask (B,K); ind (B,K); target (B,K,D).

    Normalizer is the *expanded* mask sum (objects x D), matching
    ref losses.py:823-828.
    """
    pred = gather_feat_nhwc(output, ind)
    m = mask[..., None].astype(pred.dtype)
    m = jnp.broadcast_to(m, pred.shape)
    loss = jnp.sum(jnp.abs(pred * m - target * m))
    return loss / (jnp.sum(m) + 1e-4)


def reg_smooth_l1_loss(output: jnp.ndarray, mask: jnp.ndarray,
                       ind: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Smooth-L1 (huber, beta=1) variant (ref losses.py:201-216).

    Note the reference normalizes by the *unexpanded* mask sum here.
    """
    pred = gather_feat_nhwc(output, ind)
    num = jnp.sum(mask.astype(pred.dtype))
    m = jnp.broadcast_to(mask[..., None].astype(pred.dtype), pred.shape)
    diff = jnp.abs(pred * m - target * m)
    loss = jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5)
    return jnp.sum(loss) / (num + 1e-4)
