"""COCO-protocol mAP evaluator + new dataset adapters."""
import json
import os

import numpy as np
import pytest

from centerpoly_tpu.data import CocoPolyAnnotations, DATASETS
from centerpoly_tpu.eval.coco_eval import evaluate_coco_map


def _make_gt(tmp_path, n_images=3, n_objs=4):
    rng = np.random.RandomState(0)
    images, annotations = [], []
    for i in range(n_images):
        images.append({"id": i, "file_name": f"im{i}.jpg",
                       "height": 256, "width": 256})
        for k in range(n_objs):
            x0, y0 = rng.randint(5, 150), rng.randint(5, 150)
            w, h = rng.randint(20, 80), rng.randint(20, 80)
            annotations.append({
                "id": len(annotations), "image_id": i,
                "category_id": 1 + (k % 2),
                "bbox": [float(x0), float(y0), float(w), float(h)],
                "area": float(w * h), "iscrowd": 0,
            })
    path = os.path.join(tmp_path, "gt.json")
    json.dump({"images": images, "annotations": annotations,
               "categories": [{"id": 1, "name": "a"},
                              {"id": 2, "name": "b"}]}, open(path, "w"))
    return path


def _as_results(ann, jitter=0.0, drop_frac=0.0, score_fn=None):
    rng = np.random.RandomState(1)
    results = {}
    for img_id in ann.get_img_ids():
        per = {}
        for a in ann.load_anns(img_id):
            if rng.rand() < drop_frac:
                continue
            x0, y0, w, h = a["bbox"]
            box = np.array([x0, y0, x0 + w, y0 + h], np.float32)
            box += rng.randn(4) * jitter
            score = 0.9 if score_fn is None else score_fn(a)
            per.setdefault(a["category_id"], []).append(
                list(box) + [score])
        results[img_id] = {c: np.array(v, np.float32)
                           for c, v in per.items()}
    return results


class TestCocoMap:
    def test_perfect_ap1(self, tmp_path):
        ann = CocoPolyAnnotations(_make_gt(tmp_path))
        res = evaluate_coco_map(ann, _as_results(ann))
        assert res["AP"] == pytest.approx(1.0, abs=1e-6)
        assert res["AP50"] == pytest.approx(1.0, abs=1e-6)
        assert res["AR100"] == pytest.approx(1.0, abs=1e-6)

    def test_half_detected(self, tmp_path):
        ann = CocoPolyAnnotations(_make_gt(tmp_path, n_images=4, n_objs=6))
        res = evaluate_coco_map(ann, _as_results(ann, drop_frac=0.5))
        assert 0.2 < res["AP"] < 0.9
        assert res["AP50"] >= res["AP"]

    def test_jitter_hurts_high_iou_more(self, tmp_path):
        ann = CocoPolyAnnotations(_make_gt(tmp_path))
        res = evaluate_coco_map(ann, _as_results(ann, jitter=3.0))
        assert res["AP50"] > res["AP75"] - 1e-9
        assert res["AP"] < 1.0

    def test_crowd_gt_ignored(self, tmp_path):
        # a crowd GT that is never detected must not count as FN
        path = _make_gt(tmp_path)
        data = json.load(open(path))
        data["annotations"].append({
            "id": 999, "image_id": 0, "category_id": 1,
            "bbox": [200.0, 200.0, 30.0, 30.0], "area": 900.0,
            "iscrowd": 1})
        json.dump(data, open(path, "w"))
        ann = CocoPolyAnnotations(path)
        results = _as_results(ann)
        # drop any detection overlapping the crowd box
        res = evaluate_coco_map(ann, results)
        assert res["AP"] == pytest.approx(1.0, abs=1e-6)


class TestNewAdapters:
    def test_registry_complete(self):
        for name in ("coco", "coco_hp", "pascal", "kitti", "kitti2d",
                     "uadetrac", "uav"):
            assert name in DATASETS
            meta = DATASETS[name]("")
            assert meta.num_classes >= 1
            assert len(meta.class_name) == meta.num_classes + 1
            assert meta.annot_path("val")

    def test_coco_cat_ids(self):
        meta = DATASETS["coco"]("")
        assert meta.cat_ids[1] == 0
        assert meta.cat_ids[90] == 79
        assert len(meta.cat_ids) == 80

    def test_kitti_ignore_classes(self):
        meta = DATASETS["kitti"]("")
        assert meta.cat_ids[4] == -3   # Van -> neighbor-ignore
        assert meta.cat_ids[9] == -1   # DontCare

    def test_kitti_writes_results(self, tmp_path):
        meta = DATASETS["kitti"](str(tmp_path))
        rows = np.array([[0.5, 100, 100, 200, 180, 1.5, 1.7, 4.0,
                          1.0, 1.6, 10.0, 0.3, 0.9]], np.float32)
        meta.write_kitti_results({0: {2: rows}}, str(tmp_path / "out"))
        txt = (tmp_path / "out" / "000000.txt").read_text()
        assert txt.startswith("Car 0.0 0 0.50 100.00")


def test_kitti2d_writer_and_native_eval(tmp_path):
    """kitti2d 2D rows round-trip through the native evaluator."""
    from centerpoly_tpu.eval.native import run_kitti_eval, ensure_built
    if not ensure_built():
        pytest.skip("native toolchain unavailable")
    meta = DATASETS["kitti2d"](str(tmp_path))
    gt_dir = tmp_path / "gt"
    gt_dir.mkdir()
    results = {}
    for i in range(45):
        with open(gt_dir / f"{i:06d}.txt", "w") as f:
            f.write("Car 0.0 0 0.5 100 100 200 180 "
                    "1.5 1.7 4.0 1.0 1.6 10.0 0.3\n")
        results[i] = {2: np.array([[100, 100, 200, 180, 0.9]],
                                  np.float32)}
    res_dir = tmp_path / "out" / "results"
    meta.write_kitti_results(results, str(res_dir))
    txt = (res_dir / "000000.txt").read_text()
    assert txt.startswith("Car 0.0 0.0 0.0 100.00 100.00 200.00 180.00")
    res = run_kitti_eval(str(gt_dir), str(res_dir))
    assert res["car"]["detection"][0] == pytest.approx(100.0, abs=1e-4)
