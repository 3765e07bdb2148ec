"""End-to-end val-AP wiring: synthetic GT -> eval step with oracle heads
-> decode -> rasterize -> instance AP -> model_best gating.

Covers the chain the reference runs every --val_intervals epochs
(src/main.py:162-186 + trains/polydet.py:220-237): with every head
replaced by its oracle (GT) map, the pipeline must reconstruct the GT
instances and score a high AP without any training.
"""
import json
import os

import numpy as np
import pytest

from centerpoly_tpu.configs import Config
from centerpoly_tpu.data import (
    CocoPolyAnnotations, PolydetSampler, CityscapesMeta, Loader)
from centerpoly_tpu.train.trainer import Trainer


def _rect_poly(x0, y0, w, h, n=16):
    """n vertices spaced along a rectangle's perimeter."""
    pts = []
    per = 2 * (w + h)
    d = 0.0
    for _ in range(n):
        t = d % per
        if t < w:
            pts.append((x0 + t, y0))
        elif t < w + h:
            pts.append((x0 + w, y0 + (t - w)))
        elif t < 2 * w + h:
            pts.append((x0 + w - (t - w - h), y0 + h))
        else:
            pts.append((x0, y0 + h - (t - 2 * w - h)))
        d += per / n
    return np.array(pts, np.float32)


class TinyCityMeta(CityscapesMeta):
    """Cityscapes protocol at a 128x256 source resolution with in-memory
    GT instance images."""
    eval_image_size = (128, 256)

    def __init__(self, tmp, gt_images):
        super().__init__(str(tmp))
        self._gt_images = gt_images

    def run_eval(self, results, save_dir):
        from centerpoly_tpu.eval.harness import run_instance_eval
        return run_instance_eval(self, results, save_dir,
                                 gt_images=self._gt_images)


@pytest.fixture
def fixture_setup(tmp_path):
    rng = np.random.RandomState(0)
    images, annotations = [], []
    gt_images = {}
    for i in range(2):
        images.append({"id": i, "file_name": f"img_{i}.png",
                       "height": 128, "width": 256})
        gt = np.zeros((128, 256), np.int32)
        boxes = [(30 + 120 * i, 30, 60, 50), (150, 70, 70, 40)]
        for k, (x0, y0, w, h) in enumerate(boxes):
            poly = _rect_poly(x0, y0, w, h)
            annotations.append({
                "id": len(annotations), "image_id": i, "category_id": 3,
                "bbox": [float(x0), float(y0), float(w), float(h)],
                "poly": poly.reshape(-1).tolist(), "pseudo_depth": k,
                "area": float(w * h),
            })
            gt[y0:y0 + h + 1, x0:x0 + w + 1] = 26000 + k  # car instances
        # keys must match the mask-manifest stems the harness derives from
        # img ids when no annotation table is passed (harness.py id_to_file)
        gt_images[str(i)] = gt
    path = os.path.join(tmp_path, "ann.json")
    json.dump({"images": images, "annotations": annotations,
               "categories": [{"id": c, "name": n} for c, n in
                              enumerate(CityscapesMeta.class_name[1:9], 1)]},
              open(path, "w"))
    return path, gt_images


@pytest.mark.parametrize("rep", ["cartesian", "polar"])
@pytest.mark.slow
def test_oracle_val_ap(tmp_path, fixture_setup, rep):
    path, gt_images = fixture_setup
    cfg = Config(task="polydet", dataset="cityscapes", arch="res_18",
                 input_h=128, input_w=256, batch_size=2, K=16,
                 val_intervals=1, num_epochs=1, rep=rep,
                 eval_oracle_hm=True, eval_oracle_poly=True,
                 eval_oracle_offset=True, eval_oracle_pseudo_depth=True)
    meta = TinyCityMeta(tmp_path, gt_images)
    ann = CocoPolyAnnotations(path)
    val_sampler = PolydetSampler(cfg, meta, ann, split="val")
    val_loader = Loader(val_sampler, len(val_sampler), 2, shuffle=False,
                        drop_last=False)
    trainer = Trainer(cfg, train_loader=[], val_loader=val_loader,
                      dataset_meta=meta, use_mesh=False)

    save_dir = str(tmp_path / "out")
    os.makedirs(save_dir, exist_ok=True)
    val_loss, ap = trainer.validate(1, save_dir)
    assert ap is not None, "AP evaluation did not run"
    # oracle heads must reconstruct the rectangles near-perfectly
    assert ap > 0.5, f"oracle AP too low: {ap}"
    # artifacts written
    assert os.path.exists(os.path.join(save_dir, "results.json"))
    assert os.path.exists(os.path.join(save_dir, "gtInstances.json"))
    assert os.path.exists(os.path.join(save_dir, "instance_ap.json"))


class TinyIDDMeta(TinyCityMeta):
    """IDD anue label space at the tiny source resolution."""
    from centerpoly_tpu.data.datasets import IDDMeta as _IDD
    num_classes = _IDD.num_classes
    class_name = _IDD.class_name
    label_to_id = _IDD.label_to_id
    class_frequencies = _IDD.class_frequencies
    instance_labels = _IDD.instance_labels
    void_ids = _IDD.void_ids
    eval_drop_classes = ()


def test_oracle_val_ap_idd_labels(tmp_path):
    """The per-dataset instance-label plumbing: IDD's anue ids (car=12)
    must round-trip through rasterize + eval."""
    rng = np.random.RandomState(0)
    images, annotations = [], []
    gt_images = {}
    for i in range(2):
        images.append({"id": i, "file_name": f"img_{i}.png",
                       "height": 128, "width": 256})
        gt = np.zeros((128, 256), np.int32)
        x0, y0, w, h = 40 + 60 * i, 30, 70, 60
        poly = _rect_poly(x0, y0, w, h)
        # category 6 = 'car' in the IDD class table
        annotations.append({
            "id": i, "image_id": i, "category_id": 6,
            "bbox": [float(x0), float(y0), float(w), float(h)],
            "poly": poly.reshape(-1).tolist(), "pseudo_depth": 0,
            "area": float(w * h)})
        gt[y0:y0 + h + 1, x0:x0 + w + 1] = 12000 + i  # anue car id 12
        gt_images[str(i)] = gt
    path = os.path.join(tmp_path, "ann.json")
    json.dump({"images": images, "annotations": annotations,
               "categories": [{"id": c, "name": n} for c, n in
                              enumerate(TinyIDDMeta.class_name[1:], 1)]},
              open(path, "w"))

    cfg = Config(task="polydet", dataset="IDD", arch="res_18",
                 input_h=128, input_w=256, batch_size=2, K=16,
                 val_intervals=1,
                 eval_oracle_hm=True, eval_oracle_poly=True,
                 eval_oracle_offset=True, eval_oracle_pseudo_depth=True)
    meta = TinyIDDMeta(tmp_path, gt_images)
    ann = CocoPolyAnnotations(path)
    val_sampler = PolydetSampler(cfg, meta, ann, split="val")
    val_loader = Loader(val_sampler, len(val_sampler), 2, shuffle=False,
                        drop_last=False)
    trainer = Trainer(cfg, train_loader=[], val_loader=val_loader,
                      dataset_meta=meta, use_mesh=False)
    _, ap = trainer.validate(1, str(tmp_path / "out"))
    assert ap is not None and ap > 0.5, f"IDD oracle AP: {ap}"


@pytest.mark.slow
def test_default_run_eval_finds_gt_via_annotations(tmp_path):
    """DatasetMeta.run_eval with NO explicit annotations/gt_images must
    load the val annotation table itself so image ids map to real
    cityscapes file names — the '<id>.png' fallback can never match the
    gtFine *_instanceIds.png glob (regression: val-AP gating silently
    degraded to -loss, test.py printed 'no GT' despite real gtFine)."""
    from PIL import Image
    from centerpoly_tpu.data.datasets import CityscapesMeta

    rng = np.random.RandomState(0)
    meta = CityscapesMeta(str(tmp_path))
    meta.eval_image_size = (128, 256)

    # val annotations at the meta's expected path, cityscapes naming
    images, annotations = [], []
    results = {}
    gt_dir = os.path.join(tmp_path, "gtFine", "val", "tinycity")
    os.makedirs(gt_dir, exist_ok=True)
    for i in range(2):
        stem = f"tinycity_0000{i}_000019"
        images.append({"id": i, "file_name": f"{stem}_leftImg8bit.png",
                       "height": 128, "width": 256})
        gt = np.zeros((128, 256), np.int32)
        x0, y0, w, h = 30 + 100 * i, 30, 60, 50
        gt[y0:y0 + h + 1, x0:x0 + w + 1] = 26000  # one car instance
        Image.fromarray(gt, mode="I").save(
            os.path.join(gt_dir, f"{stem}_gtFine_instanceIds.png"))
        poly = _rect_poly(x0, y0, w, h).reshape(-1)
        annotations.append({
            "id": i, "image_id": i, "category_id": 3,
            "bbox": [float(x0), float(y0), float(w), float(h)],
            "poly": poly.tolist(), "pseudo_depth": 0,
            "area": float(w * h)})
        # perfect-detection result rows [x0,y0,x1,y1,score,poly...,depth]
        row = np.concatenate([[x0, y0, x0 + w, y0 + h, 0.95],
                              poly, [0.0]]).astype(np.float32)
        results[i] = {3: row[None]}
    ann_path = meta.annot_path("val")
    os.makedirs(os.path.dirname(ann_path), exist_ok=True)
    json.dump({"images": images, "annotations": annotations,
               "categories": [{"id": c, "name": n} for c, n in
                              enumerate(CityscapesMeta.class_name[1:9], 1)]},
              open(ann_path, "w"))

    res = meta.run_eval(results, str(tmp_path / "out"))
    assert res is not None, "GT instance images were not found"
    assert res["allAp50%"] > 0.9
