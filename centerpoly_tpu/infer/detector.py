"""Inference detector API.

Behavioral reference: src/lib/detectors/base_detector.py:18-191 plus the
task detectors (detectors/polydet.py:21-101, detectors/ctdet.py:24-101).
Same contract: `run(image)` returns {'results': {class_id: (n, D) arrays},
'tot'/'load'/'pre'/'net'/'dec'/'post'/'merge': seconds}; polydet rows are
[x0, y0, x1, y1, score, poly..., depth] in source-image coordinates,
ctdet rows are [x0, y0, x1, y1, score].

TPU-native differences:
  * preprocessing (resize + affine warp + normalize) runs on-device as one
    jitted program — no host OpenCV in the hot path;
  * model forward + sigmoid + (flip-average) + decode is a single jitted
    graph;
  * post-process (inverse affine back to source coords) is one matmul over
    all vertices of all detections (ref post_process.py:105-122 looped per
    point).
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..configs import Config
from ..geometry.affine import get_affine_transform, warp_axis_aligned
from ..models import create_model
from ..ops.decode import polydet_decode, ctdet_decode
from ..ops.nms import soft_nms
from ..utils.timers import StageTimer


def polydet_post_process(dets: np.ndarray, c, s, out_h: int, out_w: int,
                         num_classes: int) -> List[Dict[int, list]]:
    """Map decoded detections back to source-image coords, split per class.

    dets: (B, K, 6+2N+1) from polydet_decode.  Vectorized equivalent of
    reference post_process.py:105-122 (per-point transform loop).
    """
    ret = []
    for i in range(dets.shape[0]):
        trans = get_affine_transform(c[i], s[i], 0, (out_w, out_h), inv=True)
        d = dets[i].copy()
        # bbox corners
        pts = d[:, :4].reshape(-1, 2)
        d[:, :4] = (pts @ trans[:, :2].T + trans[:, 2]).reshape(-1, 4)
        # every polygon vertex
        poly = d[:, 6:-1].reshape(-1, 2)
        d[:, 6:-1] = (poly @ trans[:, :2].T + trans[:, 2]).reshape(
            d.shape[0], -1)
        classes = d[:, 5]
        top: Dict[int, list] = {}
        for j in range(num_classes):
            inds = classes == j
            top[j + 1] = np.concatenate(
                [d[inds, :4], d[inds, 4:5], d[inds, 6:]], axis=1
            ).astype(np.float32).tolist()
        ret.append(top)
    return ret


def ctdet_post_process(dets: np.ndarray, c, s, out_h: int, out_w: int,
                       num_classes: int) -> List[Dict[int, list]]:
    """ctdet variant (ref post_process.py:86-104): bbox-only rows."""
    ret = []
    for i in range(dets.shape[0]):
        trans = get_affine_transform(c[i], s[i], 0, (out_w, out_h), inv=True)
        d = dets[i].copy()
        pts = d[:, :4].reshape(-1, 2)
        d[:, :4] = (pts @ trans[:, :2].T + trans[:, 2]).reshape(-1, 4)
        classes = d[:, 5]
        top: Dict[int, list] = {}
        for j in range(num_classes):
            inds = classes == j
            top[j + 1] = d[inds, :5].astype(np.float32).tolist()
        ret.append(top)
    return ret


class BaseDetector:
    """Shared run-loop: pre-process -> device program -> post -> merge,
    with the reference's 7-stage timing (base_detector.py:105-191)."""

    # subclasses set: row length of a post-processed detection
    det_len: int = 5

    def __init__(self, cfg: Config, variables=None, rng_seed: int = 0,
                 mesh=None):
        self.cfg = cfg
        # optional 1-D 'data' mesh for data-parallel batched serving:
        # run_batch shards the frame stack over it (params replicated)
        self.mesh = mesh
        self.model = create_model(
            cfg.arch, cfg.heads, cfg.head_conv,
            dtype=jnp.bfloat16 if cfg.mixed_precision else jnp.float32)
        # NOTE: mean/std are jit *arguments*, never closed over — on this
        # TPU stack a jitted program that embeds captured device arrays as
        # constants compiles pathologically and degrades every subsequent
        # dispatch in the process by ~100x (measured: 0.5ms -> 40ms).
        self.mean = jnp.asarray(cfg.mean, dtype=jnp.float32)
        self.std = jnp.asarray(cfg.std, dtype=jnp.float32)
        if variables is None and cfg.load_model:
            variables = self._load_variables(cfg.load_model)
        if variables is None:
            variables = self.model.init(
                jax.random.PRNGKey(rng_seed),
                jnp.zeros((1, cfg.input_h, cfg.input_w, 3)),
                train=False,
            )
        self.variables = variables
        self.num_classes = cfg.num_classes
        self.max_per_image = cfg.K
        self.scales = cfg.test_scales
        # NOTE: variables are passed as jit *arguments*, never closed over:
        # XLA:TPU rewrites dot/einsum ops with large constant operands into
        # a pathological convolution form (~200x slower DCN contraction).
        self._pre_jit = jax.jit(self._pre_device, static_argnums=(4,))
        self._proc_jit = jax.jit(self._process_device)

    def _load_variables(self, path: str):
        """--load_model: orbax checkpoint dir or reference .pth file
        (ref model.py:31-130 tolerant load)."""
        init_vars = self.model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, self.cfg.input_h, self.cfg.input_w, 3)),
            train=False)
        if path.endswith(".pth") or path.endswith(".pt"):
            from ..train.torch_import import load_reference_checkpoint
            variables, report = load_reference_checkpoint(
                path, init_vars, self.cfg.arch)
            print(f"loaded torch checkpoint {path}: "
                  f"{report['loaded']} loaded, "
                  f"{len(report['skipped'])} skipped")
            return variables
        from ..train.checkpoint import restore_variables
        return restore_variables(path, init_vars)

    # -- device programs -------------------------------------------------

    # tasks whose _process_device merges the [originals; flipped] halves
    # set this True; ddd/exdet don't (the reference either never doubles
    # the batch for them — ddd overrides pre_process without the flip
    # concat — or doubles it and discards the flip half: exdet's post
    # reads only the unflipped rows), so doubling would only burn 2x
    # device time for bit-identical results
    flip_tta: bool = True

    def _pre_device(self, image_u8, trans, mean, std, size):
        """uint8 HWC source image -> normalized (1, in_h, in_w, 3).

        `size` is the STATIC (inp_h, inp_w) warp canvas: cfg.input_* when
        fix_res, the per-image |pad+1 padded size in keep-res mode
        (one retrace per distinct padded size — the reference
        re-allocates per image the same way, base_detector.py:41-88).
        """
        cfg = self.cfg
        img = image_u8.astype(jnp.float32)
        # inference transforms are rot=0 -> axis-aligned matmul warp
        warped = warp_axis_aligned(img, trans, size)
        out = (warped / 255.0 - mean) / std
        imgs = out[None]
        if cfg.flip_test and self.flip_tta:
            imgs = jnp.concatenate([imgs, imgs[:, :, ::-1, :]], axis=0)
        return imgs

    def _heads(self, variables, images):
        outs = self.model.apply(variables, images, train=False)
        return outs[-1]

    def _process_device(self, variables, images):
        raise NotImplementedError

    # -- host orchestration ---------------------------------------------

    def pre_process_meta(self, height: int, width: int, scale: float):
        """Compute the affine + meta exactly like ref base_detector:41-88."""
        cfg = self.cfg
        new_h, new_w = int(height * scale), int(width * scale)
        if cfg.fix_res:
            inp_h, inp_w = cfg.input_h, cfg.input_w
            c = np.array([new_w / 2.0, new_h / 2.0], dtype=np.float32)
            s = max(height, width) * 1.0
        else:
            inp_h = (new_h | cfg.pad) + 1
            inp_w = (new_w | cfg.pad) + 1
            c = np.array([new_w // 2, new_h // 2], dtype=np.float32)
            s = np.array([inp_w, inp_h], dtype=np.float32)
        trans = get_affine_transform(c, s, 0, (inp_w, inp_h))
        meta = {"c": c, "s": s,
                "inp_h": inp_h, "inp_w": inp_w,
                "out_height": inp_h // cfg.down_ratio,
                "out_width": inp_w // cfg.down_ratio}
        return trans, meta

    def _post(self, dets_host: np.ndarray, meta, scale: float):
        raise NotImplementedError

    def _shrink_for_send(self, image, trans, h, w):
        """Shrink on host before crossing the host->device link: when
        the warp downsamples (f < 0.9), a cv2 resize first cuts
        transferred bytes by 1/f^2 and the device warp becomes
        ~identity-scale.  Returns (send_image, adjusted_trans)."""
        f = float(np.sqrt(np.abs(
            trans[0, 0] * trans[1, 1] - trans[0, 1] * trans[1, 0])))
        if f >= 0.9:
            return image, trans
        try:
            import cv2
        except ImportError:
            return image, trans
        new_w = max(1, int(round(w * f)))
        new_h = max(1, int(round(h * f)))
        send = cv2.resize(image, (new_w, new_h),
                          interpolation=cv2.INTER_LINEAR)
        trans = trans.copy()
        trans[:, :2] = trans[:, :2] * (w / new_w, h / new_h)
        return send, trans

    def _dispatch_scale(self, image: np.ndarray, scale: float):
        """Dispatch pre+net+decode for one frame at one scale WITHOUT
        fetching: returns (device_dets, meta).  jax dispatch is async,
        so the caller can keep several frames in flight and only block
        when it np.asarray()s the result."""
        h, w = image.shape[:2]
        trans, meta = self.pre_process_meta(h, w, scale)
        # pre_process_meta's transform is defined on SCALED-image coords
        # (see run()); fold the scale into the matrix
        if scale != 1.0:
            trans = trans.copy()
            trans[:, :2] *= scale
        send, trans = self._shrink_for_send(image, trans, h, w)
        images = self._pre_jit(jnp.asarray(send), jnp.asarray(trans),
                               self.mean, self.std,
                               (meta["inp_h"], meta["inp_w"]))
        _, dets = self._proc_jit(self.variables, images)
        return dets, meta

    def run_stream(self, frames, depth: int = 2):
        """Pipelined single-stream serving: a generator that keeps up to
        `depth` frames in flight on the device while the host
        post-processes earlier ones.

        Same results as run() per frame (all scales + merge), but
        dispatch of frame i+1 overlaps device execution of frame i and
        host post-processing of frame i-1 — the serial load->pre->net->
        fetch->post chain of the reference's demo loop
        (src/lib/detectors/base_detector.py:105-191) only pipelines here
        because jax dispatch is asynchronous.  Debug views are not
        rendered in stream mode.
        """
        from collections import deque

        inflight: deque = deque()

        def _finish(entry):
            detections = []
            for dets, meta, scale in entry:
                dets_host = np.asarray(dets)   # the only blocking point
                detections.append(self._post(dets_host, meta, scale))
            return self.merge_outputs(detections)

        for image in frames:
            if len(inflight) >= max(1, depth):
                yield _finish(inflight.popleft())
            image = np.asarray(image)
            inflight.append([
                (*self._dispatch_scale(image, s), s) for s in self.scales])
        while inflight:
            yield _finish(inflight.popleft())

    def run(self, image: np.ndarray) -> Dict:
        """Full pipeline on one HWC uint8/float image. Returns results +
        the reference's 7-stage timing dict."""
        timer = StageTimer().start()
        image = np.asarray(image)
        timer.stage("load")

        detections = []
        for scale in self.scales:
            h, w = image.shape[:2]
            trans, meta = self.pre_process_meta(h, w, scale)
            # pre_process_meta's transform is defined on SCALED-image
            # coords (the reference cv2-resizes by `scale` first,
            # base_detector.py:41-60, then warps); fold the scale into
            # the matrix so ONE device warp of the original frame is
            # geometrically identical to the reference's resize+warp
            if scale != 1.0:
                trans = trans.copy()
                trans[:, :2] *= scale
            send, trans = self._shrink_for_send(image, trans, h, w)
            img_dev = jnp.asarray(send)
            images = self._pre_jit(img_dev, jnp.asarray(trans),
                                   self.mean, self.std,
                                   (meta["inp_h"], meta["inp_w"]))
            timer.stage("pre", fence=images)

            out, dets = self._proc_jit(self.variables, images)
            timer.stage("net", fence=dets)
            dets_host = np.asarray(dets)
            timer.stage("dec")

            detections.append(self._post(dets_host, meta, scale))
            timer.stage("post")

        results = self.merge_outputs(detections)
        timer.stage("merge")
        if self.cfg.debug > 0:
            self._debug_views(image, np.asarray(images), out, results)
        times = timer.times
        tot = sum(times.values())
        return {"results": results, "tot": tot, **{k: times.get(k, 0.0) for k
                in ("load", "pre", "net", "dec", "post", "merge")}}

    def run_batch(self, images) -> list:
        """Batched pipeline: ONE compiled program per scale processes the
        whole same-shaped frame stack (how a production server feeds a
        TPU).  Test-time augmentation is applied batched: flip_test runs
        the [originals(B); flipped(B)] stack through the same program
        (the flip-average splits at the half), and multi-scale loops
        scales with the full batch per scale, merging per image.
        Returns a list of {"results": ...} dicts (no stage timers).
        """
        imgs = np.stack([np.asarray(im) for im in images])
        h, w = imgs.shape[1:3]
        if self.mesh is not None:
            # sharded batch axis must divide the mesh: pad with copies of
            # the last frame, whose outputs are simply not read back
            pad = (-len(images)) % self.mesh.devices.size
            if pad:
                imgs = np.concatenate(
                    [imgs, np.repeat(imgs[-1:], pad, axis=0)])

        if getattr(self, "_batch_jits", None) is None:
            self._batch_jits = {}

        def _batch_jit_for(size):
            if size in self._batch_jits:
                return self._batch_jits[size]
            cfg = self.cfg

            def prog(variables, frames, trans, mean, std):
                warped = jax.vmap(lambda f: warp_axis_aligned(
                    f.astype(jnp.float32), trans, size))(frames)
                x = (warped / 255.0 - mean) / std
                if cfg.flip_test and self.flip_tta:
                    x = jnp.concatenate([x, x[:, :, ::-1, :]], axis=0)
                _, dets = self._process_device(variables, x)
                return dets

            if self.mesh is not None:
                # data-parallel serving: frames sharded on batch over the
                # mesh, params replicated — GSPMD splits the whole
                # warp+forward+decode program across chips (the flip
                # concat doubles the sharded batch axis, which keeps the
                # per-device layout)
                from jax.sharding import NamedSharding, PartitionSpec as P
                shard = NamedSharding(self.mesh, P("data"))
                repl = NamedSharding(self.mesh, P())
                fn = jax.jit(
                    prog,
                    in_shardings=(repl, shard, repl, repl, repl),
                    out_shardings=shard)
            else:
                fn = jax.jit(prog)
            self._batch_jits[size] = fn
            return fn

        frames_dev = jnp.asarray(imgs)
        per_scale = []
        for scale in self.scales:
            trans, meta = self.pre_process_meta(h, w, scale)
            if scale != 1.0:
                # scaled-coords -> original-coords warp (see run())
                trans = trans.copy()
                trans[:, :2] *= scale
            batch_jit = _batch_jit_for((meta["inp_h"], meta["inp_w"]))
            dets = batch_jit(self.variables, frames_dev,
                             jnp.asarray(trans, dtype=jnp.float32),
                             self.mean, self.std)
            dets_host = np.asarray(dets)
            per_scale.append([self._post(dets_host[i:i + 1], meta, scale)
                              for i in range(len(images))])
        return [{"results": self.merge_outputs(
                    [dets_i[i] for dets_i in per_scale])}
                for i in range(len(images))]

    def _debug_views(self, image, images, out, results):
        """Compose debug overlays (ref base_detector debug flow +
        detectors/polydet.py:78-100): heatmap blend + detections; level 4
        saves all views to cfg.debug_dir."""
        from ..utils.debugger import Debugger

        cfg = self.cfg
        dbg = Debugger(num_classes=self.num_classes,
                       class_names=None, down_ratio=cfg.down_ratio)
        img = ((images[0] * np.asarray(cfg.std) + np.asarray(cfg.mean))
               * 255.0)
        img = np.clip(img, 0, 255).astype(np.uint8)
        # exdet's device program has no fused "hm" head — its centre
        # heatmap is "hm_c" (ref debuggers show hm_t/l/b/r separately).
        hm_key = "hm" if "hm" in out else ("hm_c" if "hm_c" in out else None)
        if hm_key is not None:
            hm = np.asarray(
                jax.nn.sigmoid(out[hm_key].astype(jnp.float32))[0])
            dbg.add_blend_img(img, dbg.gen_colormap(hm), "pred_hm")
        dbg.add_img(image.astype(np.uint8), img_id="detections")
        for j, rows in results.items():
            for row in np.asarray(rows):
                if row[4] > cfg.vis_thresh:
                    if len(row) > 6:
                        dbg.add_polydet(row[5:-1], int(j) - 1, row[4],
                                        img_id="detections")
                    else:
                        dbg.add_coco_bbox(row[:4], int(j) - 1, row[4],
                                          img_id="detections")
        if cfg.debug >= 4:
            dbg.save_all_imgs(cfg.debug_dir)
        self.debugger = dbg

    def merge_outputs(self, detections):
        """Concat scales + optional soft-NMS + global top-K score cut
        (ref detectors/polydet.py:62-76, ctdet.py:64-79)."""
        results = {}
        for j in range(1, self.num_classes + 1):
            results[j] = np.concatenate(
                [d[j] for d in detections], axis=0).astype(np.float32)
            if len(self.scales) > 1 or self.cfg.nms:
                soft_nms(results[j], nt=0.5, method=2)
        scores = np.hstack(
            [results[j][:, 4] for j in range(1, self.num_classes + 1)])
        if len(scores) > self.max_per_image:
            kth = len(scores) - self.max_per_image
            thresh = np.partition(scores, kth)[kth]
            for j in range(1, self.num_classes + 1):
                keep = results[j][:, 4] >= thresh
                results[j] = results[j][keep]
        return results


class PolydetDetector(BaseDetector):
    """Polygon instance detector (ref detectors/polydet.py)."""

    def _process_device(self, variables, images):
        cfg = self.cfg
        out = self._heads(variables, images)
        hm = jax.nn.sigmoid(out["hm"].astype(jnp.float32))
        poly = out["poly"].astype(jnp.float32)
        depth = out["pseudo_depth"].astype(jnp.float32)
        reg = out["reg"].astype(jnp.float32) if cfg.reg_offset else None
        if cfg.flip_test:
            # average original + x-flipped heatmap/depth; polygons are not
            # flip-symmetric per-channel, keep the unflipped branch.
            # Batch layout is [originals(B); flipped(B)] (B=1 in run(),
            # B=n in run_batch), so split at the half
            nb = hm.shape[0] // 2
            hm = (hm[:nb] + hm[nb:, :, ::-1, :]) / 2
            depth = (depth[:nb] + depth[nb:, :, ::-1, :]) / 2
            poly = poly[:nb]
            reg = reg[:nb] if reg is not None else None
        dets = polydet_decode(
            hm, poly, depth, reg=reg, k=cfg.K, rep=cfg.rep)
        return out, dets

    def _post(self, dets_host, meta, scale):
        dets_pp = polydet_post_process(
            dets_host[:1], [meta["c"]], [meta["s"]],
            meta["out_height"], meta["out_width"], self.num_classes)
        d0 = dets_pp[0]
        length = 5 + 2 * self.cfg.nbr_points + 1
        for j in range(1, self.num_classes + 1):
            d0[j] = np.array(d0[j], dtype=np.float32).reshape(-1, length)
            d0[j][:, :4] /= scale
            d0[j][:, 5:-1] /= scale
        return d0


class CtdetDetector(BaseDetector):
    """Box detector for the ctdet task (ref detectors/ctdet.py)."""

    def _process_device(self, variables, images):
        cfg = self.cfg
        out = self._heads(variables, images)
        hm = jax.nn.sigmoid(out["hm"].astype(jnp.float32))
        wh = out["wh"].astype(jnp.float32)
        reg = out["reg"].astype(jnp.float32) if cfg.reg_offset else None
        if cfg.flip_test:
            nb = hm.shape[0] // 2
            hm = (hm[:nb] + hm[nb:, :, ::-1, :]) / 2
            wh = (wh[:nb] + wh[nb:, :, ::-1, :]) / 2
            reg = reg[:nb] if reg is not None else None
        dets = ctdet_decode(hm, wh, reg=reg, k=cfg.K,
                            cat_spec_wh=cfg.cat_spec_wh)
        return out, dets

    def _post(self, dets_host, meta, scale):
        dets_pp = ctdet_post_process(
            dets_host[:1], [meta["c"]], [meta["s"]],
            meta["out_height"], meta["out_width"], self.num_classes)
        d0 = dets_pp[0]
        for j in range(1, self.num_classes + 1):
            d0[j] = np.array(d0[j], dtype=np.float32).reshape(-1, 5)
            d0[j][:, :4] /= scale
        return d0


def _task_detectors():
    from .task_detectors import DddDetector, MultiPoseDetector, \
        ExdetDetector
    return {"ddd": DddDetector, "multi_pose": MultiPoseDetector,
            "exdet": ExdetDetector}


DETECTORS = {
    "polydet": PolydetDetector,
    "ctdet": CtdetDetector,
}


def create_detector(cfg: Config, variables=None, mesh=None) -> BaseDetector:
    """detector_factory equivalent (ref detectors/detector_factory.py).

    mesh: optional 1-D 'data' jax.sharding.Mesh; run_batch then serves
    the frame stack data-parallel across its devices.
    """
    cls = DETECTORS.get(cfg.task) or _task_detectors().get(cfg.task)
    if cls is None:
        raise ValueError(f"no detector for task '{cfg.task}'")
    return cls(cfg, variables=variables, mesh=mesh)
