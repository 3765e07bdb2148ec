"""Offline analysis tools (ref src/tools/{eval_coco,calc_coco_overlap,
postprocessing_disks,vis_pred}.py)."""
import json
import os

import numpy as np
import pytest

from centerpoly_tpu.tools.analysis import (
    eval_coco_results, polygon_coverage, simplify_masks, visualize_results)

from test_coco_eval import _make_gt


def test_eval_coco_results(tmp_path):
    gt = _make_gt(tmp_path)
    data = json.load(open(gt))
    rows = [{"image_id": a["image_id"], "category_id": a["category_id"],
             "bbox": a["bbox"], "score": 0.9}
            for a in data["annotations"]]
    rj = tmp_path / "res.json"
    json.dump(rows, open(rj, "w"))
    res = eval_coco_results(gt, str(rj))
    assert res["AP"] == pytest.approx(1.0, abs=1e-6)


def test_polygon_coverage(tmp_path):
    rng = np.random.RandomState(0)
    images, anns = [], []
    images.append({"id": 0, "file_name": "x.png",
                   "height": 128, "width": 128})
    ang = np.linspace(0, 2 * np.pi, 24, endpoint=False)
    poly = np.stack([64 + 30 * np.cos(ang), 64 + 30 * np.sin(ang)],
                    -1).reshape(-1).tolist()
    anns.append({"id": 0, "image_id": 0, "category_id": 1,
                 "bbox": [34.0, 34.0, 60.0, 60.0],
                 "segmentation": [poly], "area": 2800.0})
    path = os.path.join(tmp_path, "gt.json")
    json.dump({"images": images, "annotations": anns,
               "categories": [{"id": 1, "name": "a"}]}, open(path, "w"))
    res = polygon_coverage(path, n_points=16)
    assert res["n"] == 1
    # a 16-gon approximation of a 24-gon circle covers it well
    assert res["mean_iou"] > 0.8


def test_simplify_masks(tmp_path):
    cv2 = pytest.importorskip("cv2")
    mask_dir = tmp_path / "masks"
    mask_dir.mkdir()
    m = np.zeros((64, 64), np.uint8)
    cv2.circle(m, (32, 32), 20, 255, -1)
    cv2.imwrite(str(mask_dir / "m.png"), m)
    out_dir = tmp_path / "out"
    simplify_masks(str(mask_dir), str(out_dir))
    out = cv2.imread(str(out_dir / "m.png"), cv2.IMREAD_GRAYSCALE)
    inter = np.logical_and(out > 0, m > 0).sum()
    union = np.logical_or(out > 0, m > 0).sum()
    assert inter / union > 0.9


def test_visualize_results(tmp_path):
    cv2 = pytest.importorskip("cv2")
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    cv2.imwrite(str(img_dir / "0.png"), np.zeros((64, 96, 3), np.uint8))
    rows = [{"image_id": 0, "category_id": 1, "score": 0.9,
             "polygon": [10, 10, 40, 10, 40, 40, 10, 40], "depth": 1.0}]
    rj = tmp_path / "res.json"
    json.dump(rows, open(rj, "w"))
    written = visualize_results(str(rj), str(img_dir),
                                str(tmp_path / "vis"))
    assert len(written) == 1
    out = cv2.imread(written[0])
    assert out.sum() > 0


class TestLogPlotAndMerge:
    def test_parse_and_plot_training_log(self, tmp_path):
        from centerpoly_tpu.tools import parse_training_log, \
            plot_training_log
        log = tmp_path / "log.txt"
        log.write_text(
            "2026-08-18-21-00: model dla_34: 18.54M parameters\n"
            "2026-08-18-21-01: epoch 1 | 10 iters | 5.0s | "
            "loss 10.5000 hm_loss 4.2000 poly_loss 6.3000\n"
            "2026-08-18-21-02: val   1 | loss 11.0000 hm_loss 4.5000\n"
            "2026-08-18-21-03: epoch 2 | 10 iters | 4.0s | "
            "loss 9.0000 hm_loss 3.9000 poly_loss 5.1000\n"
            "2026-08-18-21-04: val   2 | AP eval skipped: no gt\n")
        train, val = parse_training_log(str(log))
        assert [v for _, v in train["loss"]] == [10.5, 9.0]
        assert [e for e, _ in train["loss"]] == [1, 2]
        assert train["poly_loss"][1] == (2, 5.1)
        assert val["loss"] == [(1, 11.0)]
        import os
        cwd = os.getcwd()
        os.chdir(tmp_path)
        try:
            written = plot_training_log(str(log))
        finally:
            os.chdir(cwd)
        assert sorted(os.path.basename(w) for w in written) == [
            "loss_train.png", "loss_valid.png"]
        for w in written:
            assert (tmp_path / w).exists()

    def test_merge_coco_json(self, tmp_path):
        """Colliding image ids and non-contiguous annotation ids (the
        cases the reference's count-based offset breaks on) must merge
        collision-free: ids reassigned, image_id refs remapped."""
        import json
        from centerpoly_tpu.tools import merge_coco_json
        a = {"images": [{"id": 1, "file_name": "a.png"}],
             "type": "instances",
             "annotations": [{"id": 10, "image_id": 1}],
             "categories": [{"id": 1, "name": "car"}]}
        b = {"images": [{"id": 1, "file_name": "b.png"}],
             "annotations": [{"id": 9, "image_id": 1},
                             {"id": 11, "image_id": 1}]}
        pa, pb = tmp_path / "a.json", tmp_path / "b.json"
        pa.write_text(json.dumps(a))
        pb.write_text(json.dumps(b))
        out = tmp_path / "merged.json"
        counts = merge_coco_json([str(pa), str(pb)], str(out))
        assert counts == {"images": 2, "annotations": 3}
        merged = json.loads(out.read_text())
        assert sorted(x["id"] for x in merged["annotations"]) == [1, 2, 3]
        assert sorted(x["id"] for x in merged["images"]) == [1, 2]
        # b's annotations must point at b's (renumbered) image, not a's
        by_name = {im["file_name"]: im["id"] for im in merged["images"]}
        b_anns = [x for x in merged["annotations"]
                  if x["image_id"] == by_name["b.png"]]
        assert len(b_anns) == 2
        assert merged["categories"] == a["categories"]
