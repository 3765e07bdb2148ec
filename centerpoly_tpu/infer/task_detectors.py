"""Detectors for the secondary tasks: ddd, multi_pose, exdet.

Behavioral reference: src/lib/detectors/{ddd,multi_pose,exdet}.py — same
run() contract as BaseDetector (7-stage timers); each class provides its
jitted device program and host post-process.
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry.affine import get_affine_transform, transform_preds
from ..geometry.ddd import get_alpha, ddd2locrot
from ..ops.decode import ddd_decode, multi_pose_decode, exct_decode
from ..ops.nms import soft_nms_39
from .detector import BaseDetector

# KITTI camera intrinsics default (ref detectors/ddd.py:26-29)
DEFAULT_CALIB = np.array(
    [[707.0493, 0, 604.0814, 45.75831],
     [0, 707.0493, 180.5066, -0.3454157],
     [0, 0, 1.0, 0.004981016]], dtype=np.float32)


def ddd_post_process_2d(dets: np.ndarray, c, s, out_hw, num_classes: int
                        ) -> List[Dict[int, np.ndarray]]:
    """(ref post_process.py:25-49): transform centers, split per class,
    rows [x, y, score, alpha, depth, dim3, (wh2)]."""
    out_h, out_w = out_hw
    ret = []
    include_wh = dets.shape[2] > 16
    for i in range(dets.shape[0]):
        top = {}
        dets[i, :, :2] = transform_preds(
            dets[i, :, 0:2], c[i], s[i], (out_w, out_h))
        classes = dets[i, :, -1]
        for j in range(num_classes):
            inds = classes == j
            top[j + 1] = np.concatenate([
                dets[i, inds, :3].astype(np.float32),
                get_alpha(dets[i, inds, 3:11])[:, None].astype(np.float32),
                dets[i, inds, 11:12].astype(np.float32),
                dets[i, inds, 12:15].astype(np.float32)], axis=1)
            if include_wh:
                top[j + 1] = np.concatenate([
                    top[j + 1],
                    transform_preds(dets[i, inds, 15:17], c[i], s[i],
                                    (out_w, out_h)).astype(np.float32)],
                    axis=1)
        ret.append(top)
    return ret


def ddd_post_process_3d(dets, calibs) -> List[Dict[int, np.ndarray]]:
    """(ref post_process.py:51-77): lift to 3D via the calibration."""
    ret = []
    for i in range(len(dets)):
        preds = {}
        for cls_ind in dets[i].keys():
            rows = []
            for j in range(len(dets[i][cls_ind])):
                center = dets[i][cls_ind][j][:2]
                score = dets[i][cls_ind][j][2]
                alpha = dets[i][cls_ind][j][3]
                depth = dets[i][cls_ind][j][4]
                dimensions = dets[i][cls_ind][j][5:8]
                # reg_bbox=False rows have no wh columns (the reference
                # IndexErrors here, post_process.py:66); degrade to a
                # point bbox at the center instead of crashing
                row = dets[i][cls_ind][j]
                wh = row[8:10] if row.shape[0] >= 10 else \
                    np.zeros(2, np.float32)
                locations, rotation_y = ddd2locrot(
                    center, alpha, dimensions, depth, calibs[0])
                bbox = [center[0] - wh[0] / 2, center[1] - wh[1] / 2,
                        center[0] + wh[0] / 2, center[1] + wh[1] / 2]
                rows.append([alpha] + bbox + dimensions.tolist()
                            + locations.tolist() + [rotation_y, score])
            preds[cls_ind] = np.array(rows, dtype=np.float32)
        ret.append(preds)
    return ret


class DddDetector(BaseDetector):
    """3D box detector (ref detectors/ddd.py).

    flip_tta=False: the reference's ddd pre_process never applies the
    flip concat (detectors/ddd.py:31-56), so flip_test is a no-op for
    this task; doubling the batch would waste 2x device time for
    identical results."""

    flip_tta = False

    def __init__(self, cfg, variables=None, calib: np.ndarray | None = None,
                 **kw):
        super().__init__(cfg, variables=variables, **kw)
        self.calib = DEFAULT_CALIB if calib is None else np.asarray(
            calib, np.float32)

    def pre_process_meta(self, height: int, width: int, scale: float):
        """ddd overrides the crop: source frame mapped whole onto the input
        canvas, anisotropic (ref detectors/ddd.py:31-55)."""
        cfg = self.cfg
        inp_h, inp_w = cfg.input_h, cfg.input_w
        c = np.array([width / 2.0, height / 2.0], dtype=np.float32)
        s = np.array([width, height], dtype=np.float32)
        trans = get_affine_transform(c, s, 0, (inp_w, inp_h))
        meta = {"c": c, "s": s,
                "inp_h": inp_h, "inp_w": inp_w,
                "out_height": inp_h // cfg.down_ratio,
                "out_width": inp_w // cfg.down_ratio}
        return trans, meta

    def _process_device(self, variables, images):
        cfg = self.cfg
        out = self._heads(variables, images)
        hm = jax.nn.sigmoid(out["hm"].astype(jnp.float32))
        dep = 1.0 / (jax.nn.sigmoid(out["dep"].astype(jnp.float32))
                     + 1e-6) - 1.0
        wh = out["wh"].astype(jnp.float32) if cfg.reg_bbox else None
        reg = out["reg"].astype(jnp.float32) if cfg.reg_offset else None
        dets = ddd_decode(hm, out["rot"].astype(jnp.float32), dep,
                          out["dim"].astype(jnp.float32), wh=wh, reg=reg,
                          k=cfg.K)
        return out, dets

    def _post(self, dets_host, meta, scale):
        d2 = ddd_post_process_2d(
            dets_host[:1].copy(), [meta["c"]], [meta["s"]],
            (meta["out_height"], meta["out_width"]), self.num_classes)
        return ddd_post_process_3d(d2, [self.calib])[0]

    def merge_outputs(self, detections):
        """Peak-threshold cut only (ref detectors/ddd.py:84-90)."""
        results = detections[0]
        for j in range(1, self.num_classes + 1):
            if len(results[j]) > 0:
                keep = results[j][:, -1] > self.cfg.peak_thresh
                results[j] = results[j][keep]
        return results


def multi_pose_post_process(dets: np.ndarray, c, s, out_h: int, out_w: int
                            ) -> List[Dict[int, list]]:
    """(ref post_process.py:123-135): rows [bbox4, score, kps34]."""
    ret = []
    for i in range(dets.shape[0]):
        bbox = transform_preds(dets[i, :, :4].reshape(-1, 2), c[i], s[i],
                               (out_w, out_h))
        pts = transform_preds(dets[i, :, 5:39].reshape(-1, 2), c[i], s[i],
                              (out_w, out_h))
        top = np.concatenate(
            [bbox.reshape(-1, 4), dets[i, :, 4:5],
             pts.reshape(-1, 34)], axis=1).astype(np.float32).tolist()
        ret.append({1: top})
    return ret


def _flip_joint_perm(num_joints: int = 17) -> np.ndarray:
    """COCO left/right joint swap permutation (ref opts flip_idx)."""
    from ..data.multi_pose_sampler import FLIP_IDX
    perm = np.arange(num_joints)
    for a, b in FLIP_IDX:
        perm[a], perm[b] = perm[b], perm[a]
    return perm


class MultiPoseDetector(BaseDetector):
    """Human-pose detector (ref detectors/multi_pose.py)."""

    def _process_device(self, variables, images):
        cfg = self.cfg
        out = self._heads(variables, images)
        hm = jax.nn.sigmoid(out["hm"].astype(jnp.float32))
        wh = out["wh"].astype(jnp.float32)
        hps = out["hps"].astype(jnp.float32)
        reg = out["reg"].astype(jnp.float32) if cfg.reg_offset else None
        hm_hp = jax.nn.sigmoid(out["hm_hp"].astype(jnp.float32)) \
            if cfg.hm_hp else None
        hp_offset = out["hp_offset"].astype(jnp.float32) \
            if cfg.reg_hp_offset else None
        if cfg.flip_test:
            # batch layout [originals(B); flipped(B)] — B=1 in run(),
            # B=n in run_batch
            perm = jnp.asarray(_flip_joint_perm(hps.shape[-1] // 2))
            nb = hm.shape[0] // 2
            hm = (hm[:nb] + hm[nb:, :, ::-1, :]) / 2
            wh = (wh[:nb] + wh[nb:, :, ::-1, :]) / 2
            # flip_lr_off (ref models/utils.py:39-50): mirror spatially,
            # negate x offsets, swap left/right joint channels
            hf = hps[nb:, :, ::-1, :].reshape(
                nb, hps.shape[1], hps.shape[2], -1, 2)
            hf = hf.at[..., 0].multiply(-1.0)
            hf = hf[:, :, :, perm, :].reshape(nb, hps.shape[1],
                                              hps.shape[2], -1)
            hps = (hps[:nb] + hf) / 2
            if hm_hp is not None:
                # flip_lr (ref models/utils.py:28-37)
                hm_hp = (hm_hp[:nb]
                         + hm_hp[nb:, :, ::-1, :][..., perm]) / 2
            reg = reg[:nb] if reg is not None else None
            hp_offset = hp_offset[:nb] if hp_offset is not None else None
        dets = multi_pose_decode(hm, wh, hps, reg=reg, hm_hp=hm_hp,
                                 hp_offset=hp_offset, k=cfg.K)
        return out, dets

    def _post(self, dets_host, meta, scale):
        pp = multi_pose_post_process(
            dets_host[:1], [meta["c"]], [meta["s"]],
            meta["out_height"], meta["out_width"])[0]
        pp[1] = np.array(pp[1], np.float32).reshape(-1, 39)
        pp[1][:, :4] /= scale
        pp[1][:, 5:] /= scale
        return pp

    def merge_outputs(self, detections):
        """(ref detectors/multi_pose.py:76-83)."""
        results = {1: np.concatenate([d[1] for d in detections],
                                     axis=0).astype(np.float32)}
        if self.cfg.nms or len(self.scales) > 1:
            soft_nms_39(results[1], nt=0.5, method=2)
        return results


class ExdetDetector(BaseDetector):
    """ExtremeNet detector (ref detectors/exdet.py).

    flip_tta=False: the reference doubles the batch under flip_test but
    its post-process reads only the unflipped rows, so skipping the
    flip half halves device time with bit-identical results."""

    flip_tta = False

    def _process_device(self, variables, images):
        cfg = self.cfg
        out = self._heads(variables, images)
        heats = {p: jax.nn.sigmoid(out[f"hm_{p}"].astype(jnp.float32))
                 for p in ("t", "l", "b", "r", "c")}
        regs = {p: out.get(f"reg_{p}") for p in ("t", "l", "b", "r")}
        regs = {p: (v.astype(jnp.float32) if v is not None else None)
                for p, v in regs.items()}
        dets = exct_decode(
            heats["t"], heats["l"], heats["b"], heats["r"], heats["c"],
            t_regr=regs["t"], l_regr=regs["l"], b_regr=regs["b"],
            r_regr=regs["r"], k=min(cfg.K, 40), num_dets=cfg.K)
        return out, dets

    def _post(self, dets_host, meta, scale):
        d = dets_host[0].copy()
        trans = get_affine_transform(
            meta["c"], meta["s"], 0,
            (meta["out_width"], meta["out_height"]), inv=True)
        # bbox corners + 4 extreme points
        for sl in (slice(0, 4), slice(5, 13)):
            pts = d[:, sl].reshape(-1, 2)
            d[:, sl] = (pts @ trans[:, :2].T + trans[:, 2]).reshape(
                d.shape[0], -1)
        classes = d[:, -1]
        top = {}
        for j in range(self.num_classes):
            inds = classes == j
            top[j + 1] = np.concatenate(
                [d[inds, :5], d[inds, 5:13]], axis=1).astype(np.float32)
            top[j + 1][:, :4] /= scale
            top[j + 1][:, 5:] /= scale
        return top

    def merge_outputs(self, detections):
        """(ref detectors/exdet.py:97-122): drop penalized lattice
        combos (score <= 0 — exct_decode subtracts 1 per violated
        t/l/b/r constraint), ALWAYS soft-NMS, truncate to 5-col bboxes
        like the reference, then the global top-K score cut."""
        from ..ops.nms import soft_nms

        results = {}
        for j in range(1, self.num_classes + 1):
            rows = np.concatenate(
                [d[j] for d in detections], axis=0).astype(np.float32)
            rows = rows[rows[:, 4] > 0]
            soft_nms(rows, nt=0.5, method=2)
            results[j] = rows[:, :5]
        scores = np.hstack(
            [results[j][:, 4] for j in range(1, self.num_classes + 1)])
        if len(scores) > self.max_per_image:
            kth = len(scores) - self.max_per_image
            thresh = np.partition(scores, kth)[kth]
            for j in range(1, self.num_classes + 1):
                results[j] = results[j][results[j][:, 4] >= thresh]
        return results
