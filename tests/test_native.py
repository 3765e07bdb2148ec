"""Native cpp/ components: confusion matrix + KITTI detection evaluator."""
import os

import numpy as np
import pytest

from centerpoly_tpu.eval.native import (
    add_to_confusion_matrix, run_kitti_eval, ensure_built)


class TestConfusionMatrix:
    def test_matches_numpy(self):
        rng = np.random.RandomState(0)
        pred = rng.randint(0, 20, (64, 96)).astype(np.uint8)
        gt = rng.randint(0, 20, (64, 96)).astype(np.uint8)
        cm_native = np.zeros((20, 20), np.uint64)
        add_to_confusion_matrix(pred, gt, cm_native)

        cm_ref = np.zeros((20, 20), np.uint64)
        for g, p in zip(gt.reshape(-1), pred.reshape(-1)):
            cm_ref[g, p] += 1
        assert (cm_native == cm_ref).all()
        assert cm_native.sum() == 64 * 96

    def test_accumulates(self):
        pred = np.ones((4, 4), np.uint8)
        gt = np.ones((4, 4), np.uint8)
        cm = np.zeros((3, 3), np.uint64)
        add_to_confusion_matrix(pred, gt, cm)
        add_to_confusion_matrix(pred, gt, cm)
        assert cm[1, 1] == 32


def _write_kitti(dir_, frame, rows):
    with open(os.path.join(dir_, f"{frame}.txt"), "w") as f:
        for r in rows:
            f.write(" ".join(str(x) for x in r) + "\n")


class TestKittiEval:
    """Drives the kitti_eval binary on synthetic GT/detections."""

    def _gt_row(self, cls="Car", trunc=0.0, occ=0, bbox=(100, 100, 200, 180),
                alpha=0.5):
        x1, y1, x2, y2 = bbox
        # type trunc occ alpha x1 y1 x2 y2 h w l t1 t2 t3 ry
        return [cls, trunc, occ, alpha, x1, y1, x2, y2,
                1.5, 1.7, 4.0, 1.0, 1.6, 10.0, 0.3]

    def _det_row(self, cls="Car", bbox=(100, 100, 200, 180), score=0.9,
                 alpha=0.5):
        x1, y1, x2, y2 = bbox
        # type trunc occ alpha x1 y1 x2 y2 h w l t1 t2 t3 ry score
        return [cls, -1, -1, alpha, x1, y1, x2, y2,
                1.5, 1.7, 4.0, 1.0, 1.6, 10.0, 0.3, score]

    def test_perfect_detections_ap100(self, tmp_path):
        # the official 41-point recall discretization only fills every
        # sample slot when there are >= 41 true positives
        if not ensure_built():
            pytest.skip("native toolchain unavailable")
        gt_dir = tmp_path / "gt"
        res_dir = tmp_path / "res"
        gt_dir.mkdir()
        res_dir.mkdir()
        for i in range(20):
            boxes = [(100 + 150 * j, 100, 200 + 150 * j, 180)
                     for j in range(3)]
            _write_kitti(str(gt_dir), f"{i:06d}",
                         [self._gt_row(bbox=b) for b in boxes])
            _write_kitti(str(res_dir), f"{i:06d}",
                         [self._det_row(bbox=b, score=0.9 - 0.1 * j)
                          for j, b in enumerate(boxes)])
        res = run_kitti_eval(str(gt_dir), str(res_dir))
        assert res is not None
        assert res["car"]["detection"][0] == pytest.approx(100.0, abs=1e-4)
        # perfect orientation -> AOS == AP
        assert res["car"]["aos"][0] == pytest.approx(100.0, abs=1e-4)
        # identical 3D boxes -> bev/3d also perfect
        assert res["car"]["bev"][0] == pytest.approx(100.0, abs=1e-4)
        assert res["car"]["3d"][0] == pytest.approx(100.0, abs=1e-4)
        # stats files written
        assert (res_dir / "stats_car_detection.txt").exists()

    def test_missed_and_false_detections(self, tmp_path):
        if not ensure_built():
            pytest.skip("native toolchain unavailable")
        gt_dir = tmp_path / "gt"
        res_dir = tmp_path / "res"
        gt_dir.mkdir()
        res_dir.mkdir()
        # 2 GT, detector finds 1 plus 1 false positive far away
        _write_kitti(str(gt_dir), "000000", [
            self._gt_row(bbox=(100, 100, 200, 180)),
            self._gt_row(bbox=(400, 100, 500, 180))])
        _write_kitti(str(res_dir), "000000", [
            self._det_row(bbox=(100, 100, 200, 180), score=0.9),
            self._det_row(bbox=(700, 100, 800, 180), score=0.8)])
        res = run_kitti_eval(str(gt_dir), str(res_dir))
        ap = res["car"]["detection"][0]
        assert 0 < ap < 100

    def test_ignored_small_gt(self, tmp_path):
        if not ensure_built():
            pytest.skip("native toolchain unavailable")
        gt_dir = tmp_path / "gt"
        res_dir = tmp_path / "res"
        gt_dir.mkdir()
        res_dir.mkdir()
        # GT below MIN_HEIGHT[EASY]=40 px is ignored, not a FN: AP must
        # equal the no-small-GT AP exactly
        for i in range(20):
            boxes = [(100 + 150 * j, 100, 200 + 150 * j, 180)
                     for j in range(3)]
            gt_rows = [self._gt_row(bbox=b) for b in boxes]
            gt_rows.append(self._gt_row(bbox=(700, 100, 730, 120)))  # 20px
            _write_kitti(str(gt_dir), f"{i:06d}", gt_rows)
            _write_kitti(str(res_dir), f"{i:06d}",
                         [self._det_row(bbox=b, score=0.9 - 0.1 * j)
                          for j, b in enumerate(boxes)])
        res = run_kitti_eval(str(gt_dir), str(res_dir))
        assert res["car"]["detection"][0] == pytest.approx(100.0, abs=1e-4)

    def test_rotated_bev_overlap(self, tmp_path):
        if not ensure_built():
            pytest.skip("native toolchain unavailable")
        gt_dir = tmp_path / "gt"
        res_dir = tmp_path / "res"
        gt_dir.mkdir()
        res_dir.mkdir()
        # detection rotated 90 deg about the same center: for l=4, w=1.7
        # footprint IoU is well below 0.7 -> bev AP 0, but 2D AP stays 100
        for i in range(45):
            gt = self._gt_row()
            det = self._det_row()
            det[14] = 0.3 + np.pi / 2
            _write_kitti(str(gt_dir), f"{i:06d}", [gt])
            _write_kitti(str(res_dir), f"{i:06d}", [det])
        res = run_kitti_eval(str(gt_dir), str(res_dir))
        assert res["car"]["detection"][0] == pytest.approx(100.0, abs=1e-4)
        assert res["car"]["bev"][0] == pytest.approx(0.0, abs=1e-4)


class TestEnsureBuiltGating:
    def test_per_artifact_gating(self, tmp_path):
        """The confusion-matrix .so must stay available when only the
        kitti_eval binary is missing, and vice versa (round-3 advisor:
        a partial build must not drop _load() to the numpy fallback)."""
        from centerpoly_tpu.eval import native
        if not ensure_built():
            pytest.skip("native toolchain unavailable")
        missing = str(tmp_path / "definitely_not_built")
        assert ensure_built(artifacts=(native.LIB_PATH,))
        assert ensure_built(artifacts=(native.KITTI_EVAL_BIN,))
        assert not ensure_built(artifacts=(missing,))
        assert not ensure_built(artifacts=(native.LIB_PATH, missing))
