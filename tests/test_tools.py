"""Offline GT-tool tests: polygon sampling, CSV<->COCO, polar conversion.

Round-trips a synthetic Cityscapes-style ground-truth json through
tools/gt_polygons -> tools/csv_coco -> the PolydetSampler, mirroring the
reference's create_bouding_box_annotations.py -> convert_csv_to_coco.py ->
training pipeline.
"""
import csv
import json
import math
import os

import numpy as np
import pytest

from centerpoly_tpu.tools import (
    polygon_to_box, perimeter_points, sample_polygon, generate_annotations,
    csv_to_coco, cartesian_to_polar_flat, coco_poly_to_polar,
)
from centerpoly_tpu.tools.gt_polygons import rasterize_polygon
from centerpoly_tpu.tools.hourglass_weights import remap_extremenet_keys

DIAMOND = [(64, 20), (100, 60), (64, 100), (28, 60)]  # convex, centered


class TestPerimeterPoints:
    def test_counts_and_corners(self):
        pts = perimeter_points((0, 0, 100, 40), 16)
        assert pts.shape == (16, 2)
        # first point of each edge chunk is a bbox corner
        np.testing.assert_allclose(pts[0], [0, 0])
        np.testing.assert_allclose(pts[4], [100, 0])
        np.testing.assert_allclose(pts[8], [100, 40])
        np.testing.assert_allclose(pts[12], [0, 40])

    def test_rejects_non_multiple_of_4(self):
        with pytest.raises(AssertionError):
            perimeter_points((0, 0, 10, 10), 6)


class TestSamplePolygon:
    def test_regular_interval_hits_polygon(self):
        pts = sample_polygon(DIAMOND, 16, "regular_interval", 128, 128)
        assert pts.shape == (16, 2)
        mask = rasterize_polygon(DIAMOND, 128, 128)
        xs = pts[:, 0].astype(int)
        ys = pts[:, 1].astype(int)
        assert np.all(mask[ys, xs] > 0), "sampled vertices must land inside"

    def test_regular_interval_on_boundary(self):
        """First-hit pixels sit on the mask border (an 8-neighbour is 0)."""
        pts = sample_polygon(DIAMOND, 16, "regular_interval", 128, 128)
        mask = np.pad(rasterize_polygon(DIAMOND, 128, 128), 1)
        for x, y in pts.astype(int):
            nbh = mask[y:y + 3, x:x + 3]  # 3x3 window in padded coords
            assert (nbh == 0).any(), f"vertex ({x},{y}) is interior"

    def test_grid_based(self):
        pts = sample_polygon(DIAMOND, 16, "grid_based", 128, 128)
        assert pts.shape == (16, 2)
        mask = rasterize_polygon(DIAMOND, 128, 128)
        hit = mask[pts[:, 1].astype(int), pts[:, 0].astype(int)] > 0
        assert hit.mean() > 0.7  # edge lines may fall just outside

    def test_real_points_exact_count(self):
        hexagon = [(50 + 30 * math.cos(a), 50 + 30 * math.sin(a))
                   for a in np.linspace(0, 2 * math.pi, 7)[:-1]]
        for n in (4, 8, 12):
            pts = sample_polygon(hexagon, n, "real_points")
            assert pts.shape == (n, 2)

    def test_polygon_to_box(self):
        assert polygon_to_box(DIAMOND) == (28.0, 20.0, 100.0, 100.0)


def _synthetic_gt(tmp_path):
    """Cityscapes-style *_polygons.json with two instances + one ignored."""
    gt = {
        "imgHeight": 128, "imgWidth": 256,
        "objects": [
            {"label": "car", "polygon": [[30, 40], [90, 40], [90, 90],
                                         [30, 90]]},
            {"label": "sky", "polygon": [[0, 0], [255, 0], [255, 10],
                                         [0, 10]]},
            {"label": "person", "polygon": [[150, 30], [190, 60],
                                            [150, 100], [120, 60]]},
        ],
    }
    gt_path = os.path.join(tmp_path, "x_gtFine_polygons.json")
    json.dump(gt, open(gt_path, "w"))
    img_path = os.path.join(tmp_path, "x_leftImg8bit.png")
    return gt_path, img_path


class TestGenerateAnnotations:
    def test_rows_and_draw_order(self, tmp_path):
        gt_path, img_path = _synthetic_gt(tmp_path)
        rows = generate_annotations(gt_path, img_path, 16,
                                    height=128, width=256)
        assert len(rows) == 2  # sky has no instances
        # objects reversed: person (annotated last) gets count 0
        assert rows[0][5] == "person" and rows[0][6] == 0
        assert rows[1][5] == "car" and rows[1][6] == 1
        assert len(rows[0]) == 7 + 32  # path + box4 + label + count + 16*2

    def test_no_object_row(self, tmp_path):
        gt_path, img_path = _synthetic_gt(tmp_path)
        rows = generate_annotations(gt_path, img_path, 16, labels=["bus"],
                                    height=128, width=256)
        assert rows == [[os.path.abspath(img_path), -1, -1, -1, -1,
                         "no_object", 0]]


class TestCsvCoco:
    def _write_csv(self, tmp_path):
        gt_path, img_path = _synthetic_gt(tmp_path)
        rows = generate_annotations(gt_path, img_path, 16,
                                    height=128, width=256)
        path = os.path.join(tmp_path, "gt.csv")
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            for r in rows:
                w.writerow(r)
        return path

    def test_roundtrip_to_sampler(self, tmp_path):
        csv_path = self._write_csv(tmp_path)
        out = os.path.join(tmp_path, "gt.json")
        coco_dict = csv_to_coco(csv_path, out)
        assert len(coco_dict["images"]) == 1
        assert len(coco_dict["annotations"]) == 2
        a = coco_dict["annotations"][0]
        assert len(a["poly"]) == 32 and "pseudo_depth" in a

        # the generated json drives the GT encoder end-to-end
        from centerpoly_tpu.configs import Config
        from centerpoly_tpu.data import (
            CocoPolyAnnotations, PolydetSampler, CityscapesMeta)
        cfg = Config(task="polydet", dataset="cityscapes",
                     input_h=128, input_w=256)
        sampler = PolydetSampler(cfg, CityscapesMeta(),
                                 CocoPolyAnnotations(out), split="val")
        s = sampler(0)
        assert s["hm"].shape == (32, 64, 8)
        assert s["reg_mask"].sum() == 2

    def test_no_object_rows_skipped(self, tmp_path):
        path = os.path.join(tmp_path, "empty.csv")
        with open(path, "w", newline="") as f:
            csv.writer(f).writerow(["/a/b.png", -1, -1, -1, -1,
                                    "no_object", 0])
        d = csv_to_coco(path)
        assert len(d["images"]) == 1 and len(d["annotations"]) == 0


class TestPolar:
    def test_known_values(self):
        # vertex at (3, 4) about origin: r=5, theta=atan(4/3)
        out = cartesian_to_polar_flat([3.0, 4.0], 0.0, 0.0)
        assert out[0] == pytest.approx(5.0)
        assert out[1] == pytest.approx(math.atan(4 / 3) * 100, rel=1e-5)

    def test_negative_x_quadrant_shift(self):
        out = cartesian_to_polar_flat([-3.0, 4.0], 0.0, 0.0)
        theta = out[1] / 100
        assert theta == pytest.approx(math.atan(4 / -3) + math.pi, rel=1e-5)

    def test_file_conversion(self, tmp_path):
        d = {"images": [], "categories": [],
             "annotations": [{"bbox": [10, 20, 5, 5],
                              "poly": [13.0, 24.0], "id": 1,
                              "image_id": 0, "category_id": 1}]}
        src = os.path.join(tmp_path, "c.json")
        dst = os.path.join(tmp_path, "p.json")
        json.dump(d, open(src, "w"))
        out = coco_poly_to_polar(src, dst)
        assert out["annotations"][0]["poly"][0] == pytest.approx(5.0)
        assert os.path.exists(dst)


class TestHourglassWeights:
    def test_remap(self):
        sd = {"module.kps.0.t_heats.weight": 1,
              "module.kps.0.ct_heats.weight": 2,
              "module.kps.0.l_regrs.bias": 3,
              "module.pre.0.conv.weight": 4}
        out = remap_extremenet_keys(sd)
        assert out["module.kps.0.hm_t.weight"] == 1
        assert out["module.kps.0.hm_c.weight"] == 2
        assert out["module.kps.0.reg_l.bias"] == 3
        assert out["module.pre.0.conv.weight"] == 4


class TestSubsampleFrameIndex:
    def test_uadetrac_names(self, tmp_path):
        """'img00123.jpg' style: strip img/.jpg and parse (ref
        convert_csv_to_coco.py:131)."""
        import csv as _csv
        from centerpoly_tpu.tools.csv_coco import csv_to_coco
        src = tmp_path / "in.csv"
        with open(src, "w", newline="") as f:
            w = _csv.writer(f)
            for i in range(25):
                w.writerow([f"img{i:05d}.jpg", 0, 0, 10, 10, "car", 1,
                            0, 0, 10, 0, 10, 10, 0, 10])
        out = csv_to_coco(str(src), str(tmp_path / "o.json"),
                          cats=("car",), subsample=10)
        assert len(out["images"]) == 3  # frames 0, 10, 20

    def test_cityscapes_names_not_corrupted_by_suffix_digits(self,
                                                             tmp_path):
        """'..._000019_leftImg8bit.png': the 8 of '8bit' must not enter
        the frame index (regression: all-digit concatenation dropped
        EVERY cityscapes image under subsample)."""
        import csv as _csv
        from centerpoly_tpu.tools.csv_coco import csv_to_coco
        src = tmp_path / "in.csv"
        with open(src, "w", newline="") as f:
            w = _csv.writer(f)
            for i in range(30):
                w.writerow([f"aachen_000000_{i:06d}_leftImg8bit.png",
                            0, 0, 10, 10, "car", 1,
                            0, 0, 10, 0, 10, 10, 0, 10])
        out = csv_to_coco(str(src), str(tmp_path / "o.json"),
                          cats=("car",), subsample=10)
        assert len(out["images"]) == 3  # frames 0, 10, 20


class TestTaskHeadGating:
    def test_exdet_agnostic(self):
        from centerpoly_tpu.configs.config import task_heads
        h = task_heads("exdet", 80, agnostic_ex=True)
        assert h["hm_t"] == h["hm_l"] == h["hm_b"] == h["hm_r"] == 1
        assert h["hm_c"] == 80  # center heat stays per-class
        h = task_heads("exdet", 80, agnostic_ex=False)
        assert h["hm_t"] == 80

    def test_ddd_reg_bbox_gate(self):
        from centerpoly_tpu.configs.config import task_heads
        assert "wh" not in task_heads("ddd", 3, reg_bbox=False)
        assert task_heads("ddd", 3, reg_bbox=True)["wh"] == 2

    def test_multi_pose_gates(self):
        from centerpoly_tpu.configs.config import task_heads
        h = task_heads("multi_pose", 1, hm_hp=False, reg_hp_offset=False)
        assert "hm_hp" not in h and "hp_offset" not in h
        h = task_heads("multi_pose", 1, hm_hp=False, reg_hp_offset=True)
        assert "hm_hp" not in h and h["hp_offset"] == 2  # independent gates
