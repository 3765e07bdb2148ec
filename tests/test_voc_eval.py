"""VOC-protocol AP (reference voc_eval_lib/datasets/voc_eval.py parity).

Hand-computed PR fixtures exercise the protocol edges: 11-point vs AUC,
difficult-GT absorption, duplicate-match FP, and the PascalMeta wiring.
"""
import json
import os

import numpy as np
import pytest

from centerpoly_tpu.data import CocoPolyAnnotations, DATASETS
from centerpoly_tpu.eval.voc_eval import (evaluate_voc_map, voc_ap,
                                          voc_eval_class)


def test_voc_ap_11point_vs_auc_hand_computed():
    # 3 GT, dets (score desc): TP, FP, TP -> rec [1/3,1/3,2/3],
    # prec [1, .5, 2/3]
    rec = np.array([1 / 3, 1 / 3, 2 / 3])
    prec = np.array([1.0, 0.5, 2 / 3])
    # 11-point: t in {0,.1,.2,.3} -> 1; {.4,.5,.6} -> 2/3; rest 0
    assert voc_ap(rec, prec, use_07_metric=True) == pytest.approx(6 / 11)
    # AUC: (1/3)*1 + (1/3)*(2/3) + (1/3)*0
    assert voc_ap(rec, prec, use_07_metric=False) == pytest.approx(5 / 9)


def test_voc_eval_class_difficult_absorbs_and_duplicate_fp():
    gts = {0: np.array([[0.0, 0.0, 10.0, 10.0],
                        [50.0, 50.0, 60.0, 60.0]])}
    difficult = {0: np.array([False, True])}
    dets = {0: np.array([
        [0.0, 0.0, 10.0, 10.0, 0.9],    # TP on GT0
        [50.0, 50.0, 60.0, 60.0, 0.8],  # hits difficult GT -> neither
        [0.0, 0.0, 10.0, 10.0, 0.7],    # duplicate on claimed GT0 -> FP
        [200.0, 200.0, 210.0, 210.0, 0.6],  # no overlap -> FP
    ])}
    rec, prec, ap = voc_eval_class(dets, gts, difficult,
                                   use_07_metric=True)
    # npos=1 (difficult excluded); tp=[1,1,1,1] cum, fp=[0,0,1,2] cum
    assert rec[-1] == pytest.approx(1.0)
    assert prec[0] == pytest.approx(1.0)
    assert prec[-1] == pytest.approx(1 / 3)
    assert ap == pytest.approx(1.0)  # full recall reached at prec 1


def _write_voc_gt(tmp_path):
    images = [{"id": i, "file_name": f"im{i}.jpg",
               "height": 300, "width": 300} for i in range(2)]
    annotations = [
        {"id": 0, "image_id": 0, "category_id": 1,
         "bbox": [10.0, 10.0, 40.0, 40.0], "area": 1600.0, "iscrowd": 0},
        {"id": 1, "image_id": 0, "category_id": 2,
         "bbox": [100.0, 100.0, 50.0, 30.0], "area": 1500.0, "iscrowd": 0},
        {"id": 2, "image_id": 1, "category_id": 1,
         "bbox": [20.0, 30.0, 60.0, 60.0], "area": 3600.0, "iscrowd": 0,
         "difficult": 1},
    ]
    path = os.path.join(tmp_path, "gt.json")
    json.dump({"images": images, "annotations": annotations,
               "categories": [{"id": 1, "name": "a"},
                              {"id": 2, "name": "b"}]}, open(path, "w"))
    return path


def test_evaluate_voc_map_perfect(tmp_path):
    ann = CocoPolyAnnotations(_write_voc_gt(tmp_path))
    results = {
        0: {1: np.array([[10, 10, 50, 50, 0.9]], np.float32),
            2: np.array([[100, 100, 150, 130, 0.8]], np.float32)},
        1: {},
    }
    res = evaluate_voc_map(ann, results, use_07_metric=True)
    # the only cat-1 visible GT and the cat-2 GT are both hit exactly;
    # the difficult cat-1 GT in image 1 must not count as a miss
    assert res["AP"] == pytest.approx(1.0)
    assert res["protocol"] == "voc07_11point"


def test_pascal_run_eval_reports_voc_protocol(tmp_path):
    meta = DATASETS["pascal"](str(tmp_path))
    ann_dir = tmp_path / "voc" / "annotations"
    ann_dir.mkdir(parents=True)
    gt = _write_voc_gt(str(tmp_path))
    os.replace(gt, ann_dir / "pascal_test2007.json")
    results = {
        0: {1: np.array([[10, 10, 50, 50, 0.9]], np.float32),
            2: np.array([[100, 100, 150, 130, 0.8]], np.float32)},
        1: {},
    }
    out = tmp_path / "save"
    res = meta.run_eval(results, str(out))
    assert res["AP"] == pytest.approx(1.0)
    assert res["protocol"] == "voc07_11point"
    voc = json.load(open(out / "voc_eval.json"))
    assert voc["protocol"] == "voc07_11point"
    coco = json.load(open(out / "coco_protocol_eval.json"))
    assert "AP50" in coco and "APs" in coco
