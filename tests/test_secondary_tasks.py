"""ddd / exdet / multi_pose task stacks: sampler contracts, losses,
decodes, detectors."""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from centerpoly_tpu.configs import Config
from centerpoly_tpu.data import (
    CocoPolyAnnotations, DddSampler, ExdetSampler, MultiPoseSampler)
from centerpoly_tpu.data.datasets import DatasetMeta


class KittiLikeMeta(DatasetMeta):
    num_classes = 3

    def __init__(self):
        super().__init__()


def _coco_kitti(tmp_path, n_images=2):
    rng = np.random.RandomState(0)
    images, annotations = [], []
    for i in range(n_images):
        images.append({"id": i, "file_name": f"k{i}.png",
                       "height": 96, "width": 320})
        for k in range(3):
            x0, y0 = rng.randint(5, 250), rng.randint(5, 50)
            w, h = rng.randint(15, 60), rng.randint(15, 40)
            annotations.append({
                "id": len(annotations), "image_id": i,
                "category_id": 1 + (k % 3),
                "bbox": [float(x0), float(y0), float(w), float(h)],
                "alpha": float(rng.uniform(-np.pi, np.pi)),
                "depth": float(rng.uniform(5, 60)),
                "dim": [1.5, 1.7, 4.0],
                "area": float(w * h),
            })
    path = os.path.join(tmp_path, "kitti.json")
    json.dump({"images": images, "annotations": annotations,
               "categories": [{"id": c, "name": str(c)}
                              for c in (1, 2, 3)]}, open(path, "w"))
    return path


def _coco_pose(tmp_path, n_images=2):
    rng = np.random.RandomState(0)
    images, annotations = [], []
    for i in range(n_images):
        images.append({"id": i, "file_name": f"p{i}.png",
                       "height": 128, "width": 128})
        for k in range(2):
            x0, y0 = rng.randint(5, 60), rng.randint(5, 60)
            w, h = rng.randint(20, 50), rng.randint(30, 60)
            kps = []
            for j in range(17):
                kps += [float(x0 + rng.rand() * w),
                        float(y0 + rng.rand() * h), 2]
            annotations.append({
                "id": len(annotations), "image_id": i, "category_id": 1,
                "bbox": [float(x0), float(y0), float(w), float(h)],
                "keypoints": kps, "area": float(w * h),
            })
    path = os.path.join(tmp_path, "pose.json")
    json.dump({"images": images, "annotations": annotations,
               "categories": [{"id": 1, "name": "person"}]},
              open(path, "w"))
    return path


class TestDdd:
    def test_sampler_and_loss(self, tmp_path):
        cfg = Config(task="ddd", dataset="kitti", input_h=96, input_w=320)
        meta = KittiLikeMeta()
        s = DddSampler(cfg, meta, CocoPolyAnnotations(
            _coco_kitti(tmp_path)), split="train")(0)
        oh, ow = cfg.output_h, cfg.output_w
        assert s["hm"].shape == (oh, ow, 3)
        assert s["rotbin"].shape == (cfg.max_objs, 2)
        assert s["rot_mask"].sum() > 0
        # bins encode the alpha ranges
        k = int(np.argmax(s["rot_mask"]))
        assert s["rotbin"][k].sum() >= 1

        from centerpoly_tpu.losses.ddd import DddLossConfig, ddd_loss
        rng = np.random.RandomState(1)
        out = {
            "hm": jnp.asarray(rng.randn(1, oh, ow, 3), jnp.float32),
            "dep": jnp.asarray(rng.randn(1, oh, ow, 1), jnp.float32),
            "rot": jnp.asarray(rng.randn(1, oh, ow, 8), jnp.float32),
            "dim": jnp.asarray(rng.randn(1, oh, ow, 3), jnp.float32),
            "wh": jnp.asarray(rng.randn(1, oh, ow, 2), jnp.float32),
            "reg": jnp.asarray(rng.randn(1, oh, ow, 2), jnp.float32),
        }
        batch = {k2: jnp.asarray(v[None]) for k2, v in s.items()
                 if k2 not in ("input", "meta")}
        loss, stats = ddd_loss([out], batch, DddLossConfig())
        assert np.isfinite(float(loss))
        assert set(stats) >= {"hm_l", "dep_l", "rot_l", "dim_l"}

    def test_detector(self, tmp_path):
        from centerpoly_tpu.infer.task_detectors import DddDetector
        cfg = Config(task="ddd", dataset="kitti", arch="res_18",
                     input_h=64, input_w=128, K=8)
        det = DddDetector(cfg)
        img = (np.random.RandomState(0).rand(96, 320, 3) * 255).astype(
            np.uint8)
        ret = det.run(img)
        # rows: [alpha, bbox4, dim3, loc3, rot_y, score] = 13
        for j, rows in ret["results"].items():
            if len(rows):
                assert rows.shape[1] == 13

    def test_detector_no_reg_bbox(self):
        """reg_bbox=False rows carry no wh; _post degrades to point
        bboxes instead of the reference's IndexError
        (post_process.py:66)."""
        from centerpoly_tpu.infer.task_detectors import DddDetector
        cfg = Config(task="ddd", dataset="kitti", arch="res_18",
                     input_h=64, input_w=128, K=8, reg_bbox=False)
        det = DddDetector(cfg)
        img = (np.random.RandomState(0).rand(96, 320, 3) * 255).astype(
            np.uint8)
        ret = det.run(img)
        for j, rows in ret["results"].items():
            if len(rows):
                assert rows.shape[1] == 13
                # degenerate point bbox: x0 == x1, y0 == y1
                np.testing.assert_array_equal(rows[:, 1], rows[:, 3])
                np.testing.assert_array_equal(rows[:, 2], rows[:, 4])


class TestExdet:
    def test_sampler_and_loss(self, tmp_path):
        cfg = Config(task="exdet", dataset="kitti", input_h=96,
                     input_w=320)
        meta = KittiLikeMeta()
        s = ExdetSampler(cfg, meta, CocoPolyAnnotations(
            _coco_kitti(tmp_path)), split="train")(0)
        for p in ("t", "l", "b", "r", "c"):
            assert f"hm_{p}" in s
        assert s["reg_mask"].sum() > 0

        from centerpoly_tpu.losses.exdet import ExdetLossConfig, exdet_loss
        oh, ow = cfg.output_h, cfg.output_w
        rng = np.random.RandomState(2)
        out = {f"hm_{p}": jnp.asarray(rng.randn(1, oh, ow, 3), jnp.float32)
               for p in ("t", "l", "b", "r", "c")}
        out.update({f"reg_{p}": jnp.asarray(
            rng.randn(1, oh, ow, 2), jnp.float32)
            for p in ("t", "l", "b", "r")})
        batch = {k2: jnp.asarray(np.asarray(v)[None]) for k2, v in s.items()
                 if k2 not in ("input", "meta")}
        loss, stats = exdet_loss([out], batch, ExdetLossConfig())
        assert np.isfinite(float(loss))

    def test_detector(self):
        from centerpoly_tpu.infer.task_detectors import ExdetDetector
        cfg = Config(task="exdet", dataset="kitti", arch="res_18",
                     input_h=64, input_w=64, K=16)
        det = ExdetDetector(cfg)
        img = (np.random.RandomState(0).rand(96, 96, 3) * 255).astype(
            np.uint8)
        ret = det.run(img)
        for j, rows in ret["results"].items():
            # merge_outputs truncates to 5-col bboxes like the reference
            # (exdet.py:110) and drops penalized lattice combos
            if len(rows):
                assert rows.shape[1] == 5
                assert (rows[:, 4] > 0).all(), \
                    "penalized (score<=0) combos must be filtered"

    def test_merge_outputs_filters_and_nms(self):
        """score<=0 rows (constraint-penalized combos) are dropped and
        near-duplicates are soft-NMS-decayed even single-scale/no-nms
        (ref exdet.py:97-122; base merge skips NMS in that config)."""
        from centerpoly_tpu.infer.task_detectors import ExdetDetector
        cfg = Config(task="exdet", dataset="kitti", arch="res_18",
                     input_h=64, input_w=64, K=16)
        det = ExdetDetector.__new__(ExdetDetector)
        det.cfg = cfg
        det.num_classes = cfg.num_classes
        det.max_per_image = cfg.K
        det.scales = [1.0]
        rows = np.zeros((4, 13), np.float32)
        rows[:, :4] = [10, 10, 50, 50]
        rows[:, 4] = [0.9, 0.88, -2.0, 0.0]  # dup + 2 penalized
        dets = {j: (rows.copy() if j == 1
                    else np.zeros((0, 13), np.float32))
                for j in range(1, cfg.num_classes + 1)}
        out = det.merge_outputs([dets])
        assert out[1].shape[1] == 5
        assert len(out[1]) == 2 and (out[1][:, 4] > 0).all()
        # identical boxes: gaussian soft-NMS must decay the 2nd score
        assert out[1][1, 4] < 0.88


class TestMultiPose:
    def test_sampler_and_loss(self, tmp_path):
        cfg = Config(task="multi_pose", dataset="coco_hp", input_h=128,
                     input_w=128)
        meta = DatasetMeta()
        meta.num_classes = 1

        class M(DatasetMeta):
            num_classes = 1
        s = MultiPoseSampler(cfg, M(), CocoPolyAnnotations(
            _coco_pose(tmp_path)), split="train")(0)
        oh, ow = cfg.output_h, cfg.output_w
        assert s["hm"].shape == (oh, ow, 1)
        assert s["hm_hp"].shape == (oh, ow, 17)
        assert s["hps"].shape == (cfg.max_objs, 34)
        assert s["hps_mask"].sum() > 0
        assert s["hp_mask"].sum() > 0

        from centerpoly_tpu.losses.multi_pose import (
            MultiPoseLossConfig, multi_pose_loss)
        rng = np.random.RandomState(3)
        out = {
            "hm": jnp.asarray(rng.randn(1, oh, ow, 1), jnp.float32),
            "wh": jnp.asarray(rng.randn(1, oh, ow, 2), jnp.float32),
            "hps": jnp.asarray(rng.randn(1, oh, ow, 34), jnp.float32),
            "hm_hp": jnp.asarray(rng.randn(1, oh, ow, 17), jnp.float32),
            "hp_offset": jnp.asarray(rng.randn(1, oh, ow, 2), jnp.float32),
            "reg": jnp.asarray(rng.randn(1, oh, ow, 2), jnp.float32),
        }
        batch = {k2: jnp.asarray(np.asarray(v)[None]) for k2, v in s.items()
                 if k2 not in ("input", "meta")}
        loss, stats = multi_pose_loss([out], batch, MultiPoseLossConfig())
        assert np.isfinite(float(loss))
        assert set(stats) >= {"hm_l", "hp_l", "hm_hp_l", "hp_off_l"}

    def test_decode_snap(self):
        # a regressed joint within the box snaps to the nearest confident
        # peak from hm_hp
        from centerpoly_tpu.ops.decode import multi_pose_decode
        b, h, w = 1, 32, 32
        hm = np.zeros((b, h, w, 1), np.float32)
        hm[0, 16, 16, 0] = 0.9
        wh = np.zeros((b, h, w, 2), np.float32)
        wh[0, 16, 16] = (20.0, 20.0)
        kps = np.zeros((b, h, w, 34), np.float32)
        kps[0, 16, 16, 0] = -3.0   # joint 0 regressed to (13, 16)
        hm_hp = np.zeros((b, h, w, 17), np.float32)
        hm_hp[0, 16, 12, 0] = 0.8  # peak at (12, 16) — 1 px away
        dets = np.asarray(multi_pose_decode(
            jnp.asarray(hm), jnp.asarray(wh), jnp.asarray(kps),
            hm_hp=jnp.asarray(hm_hp), k=4))
        # joint 0 of the top detection snapped to the peak
        assert dets[0, 0, 5] == pytest.approx(12.5, abs=1e-4)
        assert dets[0, 0, 6] == pytest.approx(16.5, abs=1e-4)

    @pytest.mark.slow
    def test_detector(self):
        from centerpoly_tpu.infer.task_detectors import MultiPoseDetector
        cfg = Config(task="multi_pose", dataset="coco_hp", arch="res_18",
                     input_h=64, input_w=64, K=8)
        det = MultiPoseDetector(cfg)
        img = (np.random.RandomState(0).rand(96, 96, 3) * 255).astype(
            np.uint8)
        ret = det.run(img)
        assert ret["results"][1].shape[1] == 39
