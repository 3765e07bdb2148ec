"""Masked regression losses at gathered peak indices.

Matches reference src/lib/models/losses.py:817-830 (RegL1Loss) and
:201-216 (RegLoss, smooth-L1): predictions are gathered from the NHWC head
map at flat peak indices, masked by object validity, and normalized by the
count of masked elements.
"""
from __future__ import annotations

import jax
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


def norm_reg_l1_loss(output: jnp.ndarray, mask: jnp.ndarray,
                     ind: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Target-normalized L1 (ref losses.py:1093-1106 NormRegL1Loss):
    pred scaled by 1/(target+1e-4), regressed toward 1."""
    pred = gather_feat_nhwc(output, ind)
    m = jnp.broadcast_to(mask[..., None].astype(pred.dtype), pred.shape)
    pred = pred / (target + 1e-4)
    tgt = jnp.ones_like(target)
    loss = jnp.sum(jnp.abs(pred * m - tgt * m))
    return loss / (jnp.sum(m) + 1e-4)


def reg_weighted_l1_loss(output: jnp.ndarray, mask: jnp.ndarray,
                         ind: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Per-element-masked L1 (ref losses.py:1108-1118 RegWeightedL1Loss):
    mask is (B, K, D) float, e.g. cat_spec masks."""
    pred = gather_feat_nhwc(output, ind)
    m = mask.astype(pred.dtype)
    loss = jnp.sum(jnp.abs(pred * m - target * m))
    return loss / (jnp.sum(m) + 1e-4)


def dense_l1_loss(output: jnp.ndarray, mask: jnp.ndarray,
                  target: jnp.ndarray) -> jnp.ndarray:
    """Dense (per-pixel) masked L1 over full maps, normalized by mask sum
    (ref trains/ctdet.py:69-74 dense_wh branch)."""
    m = mask.astype(output.dtype)
    return jnp.sum(jnp.abs(output * m - target * m)) / (jnp.sum(m) + 1e-4)


def _smooth_l1(x: jnp.ndarray) -> jnp.ndarray:
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


def bin_rot_loss(output: jnp.ndarray, mask: jnp.ndarray, ind: jnp.ndarray,
                 rotbin: jnp.ndarray, rotres: jnp.ndarray) -> jnp.ndarray:
    """Multi-bin rotation loss for ddd (ref losses.py:1130-1179).

    output head gathers to (B, K, 8) = [bin1_cls(2), bin1_sin, bin1_cos,
    bin2_cls(2), bin2_sin, bin2_cos]; rotbin (B, K, 2) int bin labels;
    rotres (B, K, 2) angle residuals; mask (B, K).

    Fixed-shape equivalent of the reference's index_select branches: the
    residual terms are masked means over rows whose bin label is nonzero.
    """
    pred = gather_feat_nhwc(output, ind).reshape(-1, 8)
    tb = rotbin.reshape(-1, 2)
    tr = rotres.reshape(-1, 2)
    m = mask.reshape(-1, 1).astype(pred.dtype)

    def bin_ce(logits, labels):
        # ref compute_bin_loss: logits zeroed outside the mask, CE averaged
        # over ALL rows (masked rows contribute CE of zero-logits)
        logits = logits * m
        logp = jax.nn.log_softmax(logits, axis=-1)
        picked = jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        return -jnp.mean(picked)

    loss_bin1 = bin_ce(pred[:, 0:2], tb[:, 0].astype(jnp.int32))
    loss_bin2 = bin_ce(pred[:, 4:6], tb[:, 1].astype(jnp.int32))

    def res_term(sel, sin_pred, cos_pred, res):
        sel = sel.astype(pred.dtype)
        n = jnp.sum(sel)
        ls = jnp.sum(_smooth_l1(sin_pred - jnp.sin(res)) * sel)
        lc = jnp.sum(_smooth_l1(cos_pred - jnp.cos(res)) * sel)
        return jnp.where(n > 0, (ls + lc) / jnp.maximum(n, 1.0), 0.0)

    loss_res = res_term(tb[:, 0] != 0, pred[:, 2], pred[:, 3], tr[:, 0])
    loss_res += res_term(tb[:, 1] != 0, pred[:, 6], pred[:, 7], tr[:, 1])
    return loss_bin1 + loss_bin2 + loss_res
