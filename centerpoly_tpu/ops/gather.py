"""Gather-at-peak-index primitives.

TPU-native counterparts of the reference's `_gather_feat` /
`_transpose_and_gather_feat` (reference: src/lib/models/utils.py:12-26) —
here feature maps are NHWC, so the gather is a single `take_along_axis`
over the flattened spatial axis with no transpose.
"""
from __future__ import annotations

import jax.numpy as jnp


def gather_feat(feat: jnp.ndarray, ind: jnp.ndarray) -> jnp.ndarray:
    """Gather rows of (B, L, C) at indices (B, K) -> (B, K, C)."""
    ind = ind.astype(jnp.int32)
    return jnp.take_along_axis(feat, ind[:, :, None], axis=1)


def gather_feat_nhwc(feat: jnp.ndarray, ind: jnp.ndarray) -> jnp.ndarray:
    """Gather channels of an NHWC map at flat spatial indices.

    Args:
      feat: (B, H, W, C).
      ind: (B, K) flat indices y * W + x.

    Returns (B, K, C).
    """
    b, h, w, c = feat.shape
    flat = feat.reshape(b, h * w, c)
    return gather_feat(flat, ind)
