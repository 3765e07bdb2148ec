"""Debug visualizer (ref debugger.py) and run_on_csv entry."""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from centerpoly_tpu.utils.debugger import Debugger, debug_polydet_batch


class TestDebugger:
    def test_colormap_shape_and_peaks(self):
        dbg = Debugger(num_classes=3)
        hm = np.zeros((16, 32, 3), np.float32)
        hm[4, 8, 1] = 1.0
        cm = dbg.gen_colormap(hm)
        assert cm.shape == (64, 128, 3)
        # the peak region is colored
        assert cm[16, 32].sum() > 0
        assert cm[60, 120].sum() == 0

    def test_blend_and_overlays(self, tmp_path):
        dbg = Debugger(num_classes=8,
                       class_names=[str(i) for i in range(8)])
        img = np.zeros((64, 128, 3), np.uint8)
        hm = np.zeros((16, 32, 8), np.float32)
        hm[8, 16, 2] = 1.0
        dbg.add_blend_img(img, dbg.gen_colormap(hm), "pred_hm")
        assert dbg.imgs["pred_hm"].shape == (64, 128, 3)
        dbg.add_img(img, "out")
        dbg.add_coco_bbox([10, 10, 60, 40], 2, 0.8, img_id="out")
        assert dbg.imgs["out"].sum() > 0
        dbg.add_polydet([20, 20, 40, 20, 40, 40, 20, 40], 1, 0.9,
                        img_id="out")
        dbg.add_coco_hp(np.random.RandomState(0).randint(
            0, 60, (17, 2)), img_id="out")
        dbg.save_all_imgs(str(tmp_path), prefix="t_")
        assert (tmp_path / "t_out.png").exists()
        assert (tmp_path / "t_pred_hm.png").exists()

    def test_debug_polydet_batch(self):
        dbg = Debugger(num_classes=2)
        img = np.zeros((64, 128, 3), np.uint8)
        hm = np.zeros((16, 32, 2), np.float32)
        hm[8, 16, 0] = 1.0
        dets = np.array([[10, 10, 20, 20, 0.9, 0,
                          3, 3, 5, 3, 5, 5, 3, 5, 1.0]])
        debug_polydet_batch(dbg, img, hm, hm, dets)
        assert "pred_hm" in dbg.imgs and "out_pred" in dbg.imgs


class TestRunOnCsv:
    def test_end_to_end(self, tmp_path):
        from centerpoly_tpu.infer.run_on_csv import main
        img_path = str(tmp_path / "img.png")
        cv2.imwrite(img_path, (np.random.RandomState(0).rand(96, 128, 3)
                               * 255).astype(np.uint8))
        src = tmp_path / "in.csv"
        src.write_text(f"{img_path},1,2,3,4\n{img_path},5,6,7,8\n")
        dst = tmp_path / "out.csv"
        main(["polydet", "--source_csv", str(src), "--target_csv",
              str(dst), "--dataset", "cityscapes", "--arch", "res_18",
              "--input_h", "64", "--input_w", "64", "--K", "8"])
        lines = dst.read_text().strip().splitlines()
        assert lines, "no detections written"
        first = lines[0].split(",")
        assert first[0] == img_path
        # path + bbox4 + label + score + 32 poly coords
        assert len(first) == 1 + 4 + 1 + 1 + 32

    def test_batched_matches_per_image(self, tmp_path):
        # --eval_batch routes through detector.run_batch; same rows out
        from centerpoly_tpu.infer.run_on_csv import main
        rng = np.random.RandomState(1)
        paths = []
        for i in range(3):
            p = str(tmp_path / f"img{i}.png")
            cv2.imwrite(p, (rng.rand(96, 128, 3) * 255).astype(np.uint8))
            paths.append(p)
        src = tmp_path / "in.csv"
        src.write_text("".join(f"{p},0,0,0,0\n" for p in paths))
        outs = []
        for i, bs in enumerate(("1", "4")):
            dst = tmp_path / f"out{i}.csv"
            main(["polydet", "--source_csv", str(src), "--target_csv",
                  str(dst), "--dataset", "cityscapes", "--arch", "res_18",
                  "--input_h", "64", "--input_w", "64", "--K", "8",
                  "--eval_batch", bs])
            outs.append(sorted(dst.read_text().strip().splitlines()))
        assert outs[0] == outs[1]


class TestDetectorDebug:
    def test_debug_level_4_saves_views(self, tmp_path):
        from centerpoly_tpu.configs import Config
        from centerpoly_tpu.infer.detector import PolydetDetector

        cfg = Config(task="polydet", dataset="cityscapes", arch="res_18",
                     input_h=64, input_w=64, K=8, debug=4,
                     debug_dir=str(tmp_path / "dbg"), vis_thresh=0.0)
        det = PolydetDetector(cfg)
        img = (np.random.RandomState(0).rand(96, 128, 3) * 255).astype(
            np.uint8)
        det.run(img)
        assert (tmp_path / "dbg" / "pred_hm.png").exists()
        assert (tmp_path / "dbg" / "detections.png").exists()
