"""On-device detection decode: heatmap -> top-K detections, fully vectorized.

Replaces the reference decode path (reference: src/lib/models/decode.py:
_nms :13-19, _topk :117-133, polydet_decode :512-670, ctdet_decode :479+),
whose polar->cartesian conversion ran as a Python triple loop over GPU
tensors.  Here everything is fixed-shape jnp under jit: one fused graph of
maxpool-NMS, two-stage top-K, index gathers, and a vectorized polar decode.

Feature maps are NHWC.  Detection rows follow the reference layout:
  [x0, y0, x1, y1, score, class, poly_0..poly_{2N-1}, depth]   (6 + 2N + 1)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def pseudo_nms(heat: jnp.ndarray, kernel: int = 3) -> jnp.ndarray:
    """Keep only local maxima: 3x3 max-pool equality mask (ref decode.py:13-19)."""
    pad = (kernel - 1) // 2
    hmax = jax.lax.reduce_window(
        heat,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )
    return jnp.where(hmax == heat, heat, 0.0)


def topk_heatmap(scores: jnp.ndarray, k: int):
    """Two-stage top-K over an NHWC heatmap (ref decode.py:117-133).

    Per-class top-K over spatial positions, then global top-K over the
    (C * K) candidates — matches the reference's class-balanced candidate
    pool exactly.

    Returns (scores, flat_inds, classes, ys, xs), each (B, K).
    """
    b, h, w, c = scores.shape
    # (B, C, H*W)
    flat = scores.transpose(0, 3, 1, 2).reshape(b, c, h * w)
    cls_scores, cls_inds = jax.lax.top_k(flat, k)  # (B, C, K)
    cls_ys = (cls_inds // w).astype(jnp.float32)
    cls_xs = (cls_inds % w).astype(jnp.float32)

    all_scores = cls_scores.reshape(b, c * k)
    topk_score, topk_ind = jax.lax.top_k(all_scores, k)  # (B, K)
    topk_cls = (topk_ind // k).astype(jnp.float32)

    def pick(x):
        return jnp.take_along_axis(x.reshape(b, c * k), topk_ind, axis=1)

    return (
        topk_score,
        pick(cls_inds.astype(jnp.int32)),
        topk_cls,
        pick(cls_ys),
        pick(cls_xs),
    )


def polydet_decode(
    heat: jnp.ndarray,
    polys: jnp.ndarray,
    depth: jnp.ndarray,
    reg: jnp.ndarray | None = None,
    k: int = 128,
    rep: str = "cartesian",
) -> jnp.ndarray:
    """Decode polydet head maps into (B, K, 6 + 2N + 1) detections.

    Args:
      heat: (B, H, W, C) sigmoid heatmap.
      polys: (B, H, W, 2N) polygon head (cartesian offsets or (r, theta)).
      depth: (B, H, W, 1) pseudo-depth head.
      reg: optional (B, H, W, 2) sub-pixel center offset.
      k: number of detections.
      rep: 'cartesian' | 'polar' | 'polar_fixed'.

    Semantics match reference decode.py:512-670: peak NMS, two-stage top-K,
    gather at peaks, polar->cartesian (vectorized, including the
    polar_fixed angle table 2pi - 2pi*j/(2N)), add centers, bbox from vertex
    min/max.
    """
    from .gather import gather_feat_nhwc

    b = heat.shape[0]
    n2 = polys.shape[-1]

    heat = pseudo_nms(heat)
    scores, inds, clses, ys, xs = topk_heatmap(heat, k)

    if reg is not None:
        reg_k = gather_feat_nhwc(reg, inds)  # (B, K, 2)
        xs = xs[..., None] + reg_k[:, :, 0:1]
        ys = ys[..., None] + reg_k[:, :, 1:2]
    else:
        xs = xs[..., None] + 0.5
        ys = ys[..., None] + 0.5

    poly_k = gather_feat_nhwc(polys, inds)  # (B, K, 2N)
    depth_k = gather_feat_nhwc(depth, inds)  # (B, K, 1)

    if rep in ("polar", "polar_fixed"):
        r = poly_k[..., 0::2]
        theta = poly_k[..., 1::2]
        if rep == "polar_fixed":
            # Fixed angle table; the reference uses literal 2*3.14
            # (decode.py:605) — kept for output parity.
            j = jnp.arange(0, n2, 2, dtype=jnp.float32)
            theta = 2 * 3.14 - (2 * 3.14 / n2) * j
            theta = jnp.broadcast_to(theta, r.shape)
        px = r * jnp.cos(theta)
        py = r * jnp.sin(theta)
    else:
        px = poly_k[..., 0::2]
        py = poly_k[..., 1::2]

    px = px + xs
    py = py + ys

    bboxes = jnp.concatenate(
        [
            jnp.min(px, axis=2, keepdims=True),
            jnp.min(py, axis=2, keepdims=True),
            jnp.max(px, axis=2, keepdims=True),
            jnp.max(py, axis=2, keepdims=True),
        ],
        axis=2,
    )

    poly_out = jnp.stack([px, py], axis=-1).reshape(b, k, n2)
    return jnp.concatenate(
        [bboxes, scores[..., None], clses[..., None], poly_out, depth_k],
        axis=2,
    )


def topk_channel(scores: jnp.ndarray, k: int):
    """Per-channel top-K (ref decode.py:100-110 _topk_channel).

    scores: (B, H, W, C) -> (scores, inds, ys, xs) each (B, C, K)."""
    b, h, w, c = scores.shape
    flat = scores.transpose(0, 3, 1, 2).reshape(b, c, h * w)
    topk_scores, topk_inds = jax.lax.top_k(flat, k)
    ys = (topk_inds // w).astype(jnp.float32)
    xs = (topk_inds % w).astype(jnp.float32)
    return topk_scores, topk_inds, ys, xs


def ddd_decode(
    heat: jnp.ndarray,
    rot: jnp.ndarray,
    depth: jnp.ndarray,
    dim: jnp.ndarray,
    wh: jnp.ndarray | None = None,
    reg: jnp.ndarray | None = None,
    k: int = 40,
) -> jnp.ndarray:
    """3D box decode (ref decode.py:448-477): rows
    [x, y, score, rot(8), depth, dim(3), (wh), class]."""
    from .gather import gather_feat_nhwc

    heat = pseudo_nms(heat)
    scores, inds, clses, ys, xs = topk_heatmap(heat, k)
    if reg is not None:
        reg_k = gather_feat_nhwc(reg, inds)
        xs = xs[..., None] + reg_k[:, :, 0:1]
        ys = ys[..., None] + reg_k[:, :, 1:2]
    else:
        xs = xs[..., None] + 0.5
        ys = ys[..., None] + 0.5
    rot_k = gather_feat_nhwc(rot, inds)
    depth_k = gather_feat_nhwc(depth, inds)
    dim_k = gather_feat_nhwc(dim, inds)
    cols = [xs, ys, scores[..., None], rot_k, depth_k, dim_k]
    if wh is not None:
        cols.append(gather_feat_nhwc(wh, inds))
    cols.append(clses[..., None])
    return jnp.concatenate(cols, axis=2)


def multi_pose_decode(
    heat: jnp.ndarray,
    wh: jnp.ndarray,
    kps: jnp.ndarray,
    reg: jnp.ndarray | None = None,
    hm_hp: jnp.ndarray | None = None,
    hp_offset: jnp.ndarray | None = None,
    k: int = 100,
) -> jnp.ndarray:
    """Human-pose decode (ref decode.py:672-746): rows
    [x0, y0, x1, y1, score, kps(2J), class].

    When hm_hp is given, each regressed joint snaps to the nearest joint
    heatmap peak if that peak is inside the box and confident (the
    reference's grouping heuristic), fully vectorized over (B, J, K, K).
    """
    from .gather import gather_feat_nhwc, gather_feat

    b = heat.shape[0]
    num_joints = kps.shape[-1] // 2

    heat = pseudo_nms(heat)
    scores, inds, clses, ys, xs = topk_heatmap(heat, k)

    kps_k = gather_feat_nhwc(kps, inds)  # (B, K, 2J)
    kps_x = kps_k[..., 0::2] + xs[..., None]
    kps_y = kps_k[..., 1::2] + ys[..., None]

    if reg is not None:
        reg_k = gather_feat_nhwc(reg, inds)
        xs = xs[..., None] + reg_k[:, :, 0:1]
        ys = ys[..., None] + reg_k[:, :, 1:2]
    else:
        xs = xs[..., None] + 0.5
        ys = ys[..., None] + 0.5
    wh_k = gather_feat_nhwc(wh, inds)
    bboxes = jnp.concatenate(
        [xs - wh_k[..., 0:1] / 2, ys - wh_k[..., 1:2] / 2,
         xs + wh_k[..., 0:1] / 2, ys + wh_k[..., 1:2] / 2], axis=2)

    if hm_hp is not None:
        thresh = 0.1
        hm_hp = pseudo_nms(hm_hp)
        hm_score, hm_inds, hm_ys, hm_xs = topk_channel(hm_hp, k)  # (B,J,K)
        if hp_offset is not None:
            off = gather_feat_nhwc(hp_offset, hm_inds.reshape(b, -1))
            off = off.reshape(b, num_joints, k, 2)
            hm_xs = hm_xs + off[..., 0]
            hm_ys = hm_ys + off[..., 1]
        else:
            hm_xs = hm_xs + 0.5
            hm_ys = hm_ys + 0.5
        conf = hm_score > thresh
        hm_score = jnp.where(conf, hm_score, -1.0)
        hm_ys = jnp.where(conf, hm_ys, -10000.0)
        hm_xs = jnp.where(conf, hm_xs, -10000.0)

        # (B, J, K_det, K_peak) distances between regressed joints and peaks
        reg_x = kps_x.transpose(0, 2, 1)[..., None]     # (B, J, K, 1)
        reg_y = kps_y.transpose(0, 2, 1)[..., None]
        d2 = (reg_x - hm_xs[:, :, None, :]) ** 2 \
            + (reg_y - hm_ys[:, :, None, :]) ** 2
        dist = jnp.sqrt(d2)
        min_ind = jnp.argmin(dist, axis=3)              # (B, J, K)
        min_dist = jnp.take_along_axis(dist, min_ind[..., None],
                                       axis=3)[..., 0]
        sel_score = jnp.take_along_axis(hm_score, min_ind, axis=2)
        sel_x = jnp.take_along_axis(hm_xs, min_ind, axis=2)
        sel_y = jnp.take_along_axis(hm_ys, min_ind, axis=2)

        l = bboxes[:, None, :, 0]
        t = bboxes[:, None, :, 1]
        r = bboxes[:, None, :, 2]
        btm = bboxes[:, None, :, 3]
        bad = ((sel_x < l) | (sel_x > r) | (sel_y < t) | (sel_y > btm)
               | (sel_score < thresh)
               | (min_dist > jnp.maximum(btm - t, r - l) * 0.3))
        out_x = jnp.where(bad, kps_x.transpose(0, 2, 1), sel_x)
        out_y = jnp.where(bad, kps_y.transpose(0, 2, 1), sel_y)
        kps_x = out_x.transpose(0, 2, 1)
        kps_y = out_y.transpose(0, 2, 1)

    kps_out = jnp.stack([kps_x, kps_y], axis=-1).reshape(
        b, k, num_joints * 2)
    return jnp.concatenate(
        [bboxes, scores[..., None], kps_out, clses[..., None]], axis=2)


def _agg_scan(heat: jnp.ndarray, axis: int, reverse: bool) -> jnp.ndarray:
    """Directional monotone aggregation (ref decode.py:21-73):
    ret[i] = heat[i] + ret[i-1] * (heat[i] >= heat[i-1]) along an axis;
    returns the accumulated extra (ret - heat) like the reference helpers."""
    x = jnp.moveaxis(heat, axis, 0)

    def step(carry, row):
        prev_ret, prev_heat = carry
        ret = row + prev_ret * (row >= prev_heat)
        return (ret, row), ret

    init = (jnp.zeros_like(x[0]), jnp.full_like(x[0], jnp.inf))
    _, out = jax.lax.scan(step, init, x, reverse=reverse)
    return jnp.moveaxis(out, 0, axis) - heat


def exct_decode(
    t_heat: jnp.ndarray,
    l_heat: jnp.ndarray,
    b_heat: jnp.ndarray,
    r_heat: jnp.ndarray,
    ct_heat: jnp.ndarray,
    t_regr=None, l_regr=None, b_regr=None, r_regr=None,
    k: int = 40,
    scores_thresh: float = 0.1,
    center_thresh: float = 0.1,
    aggr_weight: float = 0.0,
    num_dets: int = 1000,
) -> jnp.ndarray:
    """ExtremeNet decode (ref decode.py:287-446): combine top/left/bottom/
    right extreme-point peaks whose geometry and center response agree.

    All heads NHWC; rows [x0, y0, x1, y1, score, t_x, t_y, l_x, l_y, b_x,
    b_y, r_x, r_y, class].  The (K, K, K, K) candidate lattice is built as
    broadcast arithmetic — fixed shape, no data-dependent control flow.
    """
    from .gather import gather_feat, gather_feat_nhwc

    batch, height, width, cat = t_heat.shape

    if aggr_weight > 0:
        t_heat = t_heat + aggr_weight * (
            _agg_scan(t_heat, 2, False) + _agg_scan(t_heat, 2, True))
        b_heat = b_heat + aggr_weight * (
            _agg_scan(b_heat, 2, False) + _agg_scan(b_heat, 2, True))
        l_heat = l_heat + aggr_weight * (
            _agg_scan(l_heat, 1, False) + _agg_scan(l_heat, 1, True))
        r_heat = r_heat + aggr_weight * (
            _agg_scan(r_heat, 1, False) + _agg_scan(r_heat, 1, True))

    t_heat = jnp.minimum(pseudo_nms(t_heat), 1.0)
    l_heat = jnp.minimum(pseudo_nms(l_heat), 1.0)
    b_heat = jnp.minimum(pseudo_nms(b_heat), 1.0)
    r_heat = jnp.minimum(pseudo_nms(r_heat), 1.0)

    t_sc, t_inds, t_cls, t_ys, t_xs = topk_heatmap(t_heat, k)
    l_sc, l_inds, l_cls, l_ys, l_xs = topk_heatmap(l_heat, k)
    b_sc, b_inds, b_cls, b_ys, b_xs = topk_heatmap(b_heat, k)
    r_sc, r_inds, r_cls, r_ys, r_xs = topk_heatmap(r_heat, k)

    if t_regr is not None:
        t_r = gather_feat_nhwc(t_regr, t_inds)
        l_r = gather_feat_nhwc(l_regr, l_inds)
        b_r = gather_feat_nhwc(b_regr, b_inds)
        r_r = gather_feat_nhwc(r_regr, r_inds)
        t_xs_f = t_xs + t_r[..., 0]
        t_ys_f = t_ys + t_r[..., 1]
        l_xs_f = l_xs + l_r[..., 0]
        l_ys_f = l_ys + l_r[..., 1]
        b_xs_f = b_xs + b_r[..., 0]
        b_ys_f = b_ys + b_r[..., 1]
        r_xs_f = r_xs + r_r[..., 0]
        r_ys_f = r_ys + r_r[..., 1]
    else:
        t_xs_f, t_ys_f = t_xs + 0.5, t_ys + 0.5
        l_xs_f, l_ys_f = l_xs + 0.5, l_ys + 0.5
        b_xs_f, b_ys_f = b_xs + 0.5, b_ys + 0.5
        r_xs_f, r_ys_f = r_xs + 0.5, r_ys + 0.5

    # broadcast to the (B, K, K, K, K) lattice: axes = (t, l, b, r)
    def ax(v, i):
        shape = [batch, 1, 1, 1, 1]
        shape[i + 1] = k
        return v.reshape(shape)

    T, L, B, R = 0, 1, 2, 3
    ty, tx = ax(t_ys, T), ax(t_xs, T)
    ly, lx = ax(l_ys, L), ax(l_xs, L)
    by, bx = ax(b_ys, B), ax(b_xs, B)
    ry, rx = ax(r_ys, R), ax(r_xs, R)

    # center response at the implied box center, indexed per t-class
    box_cx = ((lx + rx + 0.5) / 2).astype(jnp.int32)
    box_cy = ((ty + by + 0.5) / 2).astype(jnp.int32)
    tc = ax(t_cls, T).astype(jnp.int32)
    ct_flat = ct_heat.transpose(0, 3, 1, 2).reshape(batch, -1)  # (B, C*H*W)
    ct_inds = (tc * (height * width) + box_cy * width + box_cx).reshape(
        batch, -1)
    ct_scores = jnp.take_along_axis(ct_flat, ct_inds, axis=1).reshape(
        batch, k, k, k, k)

    scores = (ax(t_sc, T) + ax(l_sc, L) + ax(b_sc, B) + ax(r_sc, R)
              + 2 * ct_scores) / 6

    cls_bad = ((ax(t_cls, T) != ax(l_cls, L))
               | (ax(t_cls, T) != ax(b_cls, B))
               | (ax(t_cls, T) != ax(r_cls, R)))
    top_bad = (ty > ly) | (ty > by) | (ty > ry)
    left_bad = (lx > tx) | (lx > bx) | (lx > rx)
    bottom_bad = (by < ty) | (by < ly) | (by < ry)
    right_bad = (rx < tx) | (rx < lx) | (rx < bx)
    sc_bad = ((ax(t_sc, T) < scores_thresh) | (ax(l_sc, L) < scores_thresh)
              | (ax(b_sc, B) < scores_thresh)
              | (ax(r_sc, R) < scores_thresh)
              | (ct_scores < center_thresh))
    for bad in (sc_bad, cls_bad, top_bad, left_bad, bottom_bad, right_bad):
        scores = scores - bad.astype(scores.dtype)

    flat_scores = scores.reshape(batch, -1)
    top_scores, top_inds = jax.lax.top_k(flat_scores, num_dets)

    def lattice(v, i):
        return jnp.broadcast_to(ax(v, i), (batch, k, k, k, k)).reshape(
            batch, -1)

    def pick(v, i):
        return jnp.take_along_axis(lattice(v, i), top_inds, axis=1)

    x0 = pick(l_xs_f, L)
    y0 = pick(t_ys_f, T)
    x1 = pick(r_xs_f, R)
    y1 = pick(b_ys_f, B)
    cols = [x0, y0, x1, y1, top_scores,
            pick(t_xs_f, T), pick(t_ys_f, T),
            pick(l_xs_f, L), pick(l_ys_f, L),
            pick(b_xs_f, B), pick(b_ys_f, B),
            pick(r_xs_f, R), pick(r_ys_f, R),
            pick(t_cls, T)]
    return jnp.stack(cols, axis=2)


def ctdet_decode(
    heat: jnp.ndarray,
    wh: jnp.ndarray,
    reg: jnp.ndarray | None = None,
    k: int = 100,
    cat_spec_wh: bool = False,
) -> jnp.ndarray:
    """CenterNet box decode (ref decode.py:479-510): (B, K, 6) detections."""
    from .gather import gather_feat_nhwc

    heat = pseudo_nms(heat)
    scores, inds, clses, ys, xs = topk_heatmap(heat, k)

    if reg is not None:
        reg_k = gather_feat_nhwc(reg, inds)
        xs = xs[..., None] + reg_k[:, :, 0:1]
        ys = ys[..., None] + reg_k[:, :, 1:2]
    else:
        xs = xs[..., None] + 0.5
        ys = ys[..., None] + 0.5

    wh_k = gather_feat_nhwc(wh, inds)
    if cat_spec_wh:
        b, kk = scores.shape
        wh_k = wh_k.reshape(b, kk, -1, 2)
        cls_idx = clses.astype(jnp.int32)[..., None, None]
        wh_k = jnp.take_along_axis(wh_k, jnp.broadcast_to(
            cls_idx, (b, kk, 1, 2)), axis=2)[:, :, 0, :]

    bboxes = jnp.concatenate(
        [
            xs - wh_k[..., 0:1] / 2,
            ys - wh_k[..., 1:2] / 2,
            xs + wh_k[..., 0:1] / 2,
            ys + wh_k[..., 1:2] / 2,
        ],
        axis=2,
    )
    return jnp.concatenate(
        [bboxes, scores[..., None], clses[..., None]], axis=2
    )
