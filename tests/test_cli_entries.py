"""L5 entry-point integration: `python -m centerpoly_tpu.test` over a
synthetic Cityscapes-layout data root (reference surface: src/test.py)."""
import json
import os

import numpy as np
import pytest

from centerpoly_tpu.data.datasets import CityscapesMeta


def _make_dataroot(tmp_path, n_images=2, n_points=16):
    """cityscapesStuff/BBoxes/val16_regular_interval.json + tiny pngs."""
    cv2 = pytest.importorskip("cv2")
    bdir = tmp_path / "cityscapesStuff" / "BBoxes"
    bdir.mkdir(parents=True)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    for i in range(n_images):
        p = str(img_dir / f"val_{i}_leftImg8bit.png")
        cv2.imwrite(p, (rng.rand(128, 256, 3) * 255).astype(np.uint8))
        images.append({"id": i, "file_name": p,
                       "height": 128, "width": 256})
        ang = np.sort(rng.rand(n_points) * 2 * np.pi)
        xs = 128 + 30 * np.cos(ang)
        ys = 64 + 20 * np.sin(ang)
        annotations.append({
            "id": i, "image_id": i, "category_id": 3,
            "bbox": [float(xs.min()), float(ys.min()),
                     float(xs.max() - xs.min()),
                     float(ys.max() - ys.min())],
            "poly": np.stack([xs, ys], -1).reshape(-1).tolist(),
            "pseudo_depth": 0, "area": 600.0})
    path = bdir / f"val{n_points}_regular_interval.json"
    json.dump({"images": images, "annotations": annotations,
               "categories": [{"id": c, "name": n} for c, n in
                              enumerate(CityscapesMeta.class_name[1:9],
                                        1)]}, open(path, "w"))
    return tmp_path


@pytest.mark.slow
def test_test_entry_runs(tmp_path, capsys):
    from centerpoly_tpu.test import main

    root = _make_dataroot(tmp_path)
    save_root = tmp_path / "exp"
    main(["polydet", "--dataset", "cityscapes", "--arch", "res_18",
          "--input_h", "64", "--input_w", "128", "--K", "8",
          "--data_dir", str(root), "--save_dir", str(save_root),
          "--exp_id", "smoke"])
    out = capsys.readouterr().out
    assert "results written to" in out or "instance AP" in out
    save_dir = save_root / "cityscapes" / "polydet" / "smoke"
    assert (save_dir / "results.json").exists()


@pytest.mark.slow
def test_run_batch_sharded_over_mesh():
    """Data-parallel serving: run_batch with a 1-D 'data' mesh shards
    the frame stack across devices (8-device virtual CPU mesh).  At 8
    frames over 8 devices each device runs batch-1 — the same program
    shapes as per-image run(), so results must match it."""
    import numpy as np
    from centerpoly_tpu.configs import Config
    from centerpoly_tpu.infer.detector import PolydetDetector
    from centerpoly_tpu.train.mesh import make_mesh

    cfg = Config(task="polydet", dataset="cityscapes", arch="res_18",
                 input_h=64, input_w=128, K=8)
    det = PolydetDetector(cfg)
    det_sh = PolydetDetector(cfg, variables=det.variables,
                             mesh=make_mesh(8))
    rng = np.random.RandomState(2)
    frames = [(rng.rand(64, 128, 3) * 255).astype(np.uint8)
              for _ in range(8)]
    outs = det_sh.run_batch(frames)
    assert len(outs) == 8
    for i in (0, 3, 7):
        single = det.run(frames[i])["results"]
        sharded = outs[i]["results"]
        for j in single:
            a, b = np.asarray(single[j]), np.asarray(sharded[j])
            assert a.shape == b.shape, (i, j, a.shape, b.shape)
            if a.size:
                a = a[np.lexsort(a.T)]
                b = b[np.lexsort(b.T)]
                np.testing.assert_allclose(a, b, atol=2e-3)


@pytest.mark.slow
def test_test_entry_eval_batch(tmp_path, capsys):
    """--eval_batch routes the split through run_batch (one compiled
    program per frame-stack shape, prefetch thread feeding it)."""
    from centerpoly_tpu.test import main

    root = _make_dataroot(tmp_path)
    save_root = tmp_path / "exp"
    main(["polydet", "--dataset", "cityscapes", "--arch", "res_18",
          "--input_h", "64", "--input_w", "128", "--K", "8",
          "--eval_batch", "2",
          "--data_dir", str(root), "--save_dir", str(save_root),
          "--exp_id", "smoke_b"])
    out = capsys.readouterr().out
    assert "results written to" in out or "instance AP" in out
    save_dir = save_root / "cityscapes" / "polydet" / "smoke_b"
    assert (save_dir / "results.json").exists()


@pytest.mark.slow
def test_main_entry_trains_one_epoch(tmp_path):
    from centerpoly_tpu.main import main

    root = _make_dataroot(tmp_path)
    # train split annotation: reuse the val file contents
    src = root / "cityscapesStuff" / "BBoxes" / "val16_regular_interval.json"
    dst = root / "cityscapesStuff" / "BBoxes" / "train16_regular_interval.json"
    dst.write_text(src.read_text())
    save_root = tmp_path / "exp2"
    main(["polydet", "--dataset", "cityscapes", "--arch", "res_18",
          "--input_h", "64", "--input_w", "128", "--K", "8",
          "--batch_size", "2", "--num_epochs", "1", "--val_intervals", "0",
          "--data_dir", str(root), "--save_dir", str(save_root),
          "--exp_id", "smoke"])
    save_dir = save_root / "cityscapes" / "polydet" / "smoke"
    assert (save_dir / "model_last").exists()
    assert (save_dir / "log.txt").exists() or (save_dir / "opt.txt").exists()


def test_run_batch_matches_single():
    """run_batch (one compiled program over a frame stack) must produce
    the same detections as per-image run() when no resize/TTA applies."""
    import numpy as np
    from centerpoly_tpu.configs import Config
    from centerpoly_tpu.infer.detector import PolydetDetector

    cfg = Config(task="polydet", dataset="cityscapes", arch="res_18",
                 input_h=128, input_w=256)
    det = PolydetDetector(cfg)
    rng = np.random.RandomState(0)
    frames = [(rng.rand(128, 256, 3) * 255).astype(np.uint8)
              for _ in range(3)]
    outs = det.run_batch(frames)
    assert len(outs) == 3
    for o in outs:
        for j, rows in o["results"].items():
            assert np.isfinite(np.asarray(rows)).all()
    # exact parity at B=1 (same conv shapes → bitwise-comparable; at B>1
    # XLA may batch convs differently, which flips near-tie top-k rows of
    # an untrained model)
    single = det.run(frames[0])["results"]
    batch0 = det.run_batch(frames[:1])[0]["results"]
    for j in single:
        a, b = np.asarray(single[j]), np.asarray(batch0[j])
        assert a.shape == b.shape
        if a.size:
            a = a[np.lexsort(a.T)]
            b = b[np.lexsort(b.T)]
            np.testing.assert_allclose(a, b, atol=1e-3)


def test_run_batch_tta_matches_single(monkeypatch):
    """run_batch applies flip-test + multi-scale TTA batched; at B=1 it
    must match per-image run() exactly (same program shapes).  cv2 is
    blocked so run()'s host-shrink path can't introduce fixed-point
    resampling differences — both paths then use the identical device
    warp and the comparison isolates the TTA batching logic."""
    import sys
    import numpy as np
    from centerpoly_tpu.configs import Config
    from centerpoly_tpu.infer.detector import PolydetDetector

    monkeypatch.setitem(sys.modules, "cv2", None)
    cfg = Config(task="polydet", dataset="cityscapes", arch="res_18",
                 input_h=128, input_w=256, flip_test=True,
                 test_scales=(1.0, 0.5))
    det = PolydetDetector(cfg)
    rng = np.random.RandomState(1)
    frames = [(rng.rand(128, 256, 3) * 255).astype(np.uint8)
              for _ in range(2)]
    outs = det.run_batch(frames)
    assert len(outs) == 2
    single = det.run(frames[0])["results"]
    batch0 = outs[0]["results"]
    for j in single:
        a, b = np.asarray(single[j]), np.asarray(batch0[j])
        assert a.shape == b.shape, (j, a.shape, b.shape)
        if a.size:
            a = a[np.lexsort(a.T)]
            b = b[np.lexsort(b.T)]
            np.testing.assert_allclose(a, b, atol=2e-3)


@pytest.mark.slow
def test_demo_video_entry(tmp_path, capsys):
    """Video path of the demo CLI (reference src/demo.py:23-36): a short
    synthetic .avi runs through the detector and an annotated video is
    written."""
    cv2 = pytest.importorskip("cv2")
    from centerpoly_tpu.infer.demo import main

    src = str(tmp_path / "clip.avi")
    w = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"MJPG"), 10.0,
                        (128, 64))
    rng = np.random.RandomState(0)
    for _ in range(4):
        w.write((rng.rand(64, 128, 3) * 255).astype(np.uint8))
    w.release()

    out_video = str(tmp_path / "clip_out.avi")
    main(["polydet", "--dataset", "cityscapes", "--arch", "res_18",
          "--input_h", "64", "--input_w", "128", "--K", "8",
          "--demo", src, "--out_video", out_video, "--max_frames", "3"])
    out = capsys.readouterr().out
    assert out.count("frame ") == 3
    assert os.path.exists(out_video)
    cap = cv2.VideoCapture(out_video)
    n = 0
    while cap.read()[0]:
        n += 1
    cap.release()
    assert n == 3


@pytest.mark.slow
def test_demo_video_entry_batched(tmp_path, capsys):
    """--eval_batch groups video frames through run_batch; the annotated
    output must still contain every frame, in order."""
    cv2 = pytest.importorskip("cv2")
    from centerpoly_tpu.infer.demo import main

    src = str(tmp_path / "clip.avi")
    w = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"MJPG"), 10.0,
                        (128, 64))
    rng = np.random.RandomState(0)
    for _ in range(5):
        w.write((rng.rand(64, 128, 3) * 255).astype(np.uint8))
    w.release()

    out_video = str(tmp_path / "clip_out_b.avi")
    main(["polydet", "--dataset", "cityscapes", "--arch", "res_18",
          "--input_h", "64", "--input_w", "128", "--K", "8",
          "--eval_batch", "2",
          "--demo", src, "--out_video", out_video, "--max_frames", "5"])
    assert os.path.exists(out_video)
    cap = cv2.VideoCapture(out_video)
    n = 0
    while cap.read()[0]:
        n += 1
    cap.release()
    assert n == 5


def test_run_stream_matches_run():
    """run_stream (pipelined dispatch, up to `depth` frames in flight)
    must yield exactly run()'s merged results, in input order."""
    import numpy as np
    from centerpoly_tpu.configs import Config
    from centerpoly_tpu.infer.detector import PolydetDetector

    cfg = Config(task="polydet", dataset="cityscapes", arch="res_18",
                 input_h=128, input_w=256)
    det = PolydetDetector(cfg)
    rng = np.random.RandomState(1)
    frames = [(rng.rand(128, 256, 3) * 255).astype(np.uint8)
              for _ in range(4)]
    streamed = list(det.run_stream(iter(frames), depth=2))
    assert len(streamed) == 4
    for frame, got in zip(frames, streamed):
        want = det.run(frame)["results"]
        assert set(got) == set(want)
        for j in want:
            a, b = np.asarray(want[j]), np.asarray(got[j])
            assert a.shape == b.shape
            if a.size:
                np.testing.assert_allclose(
                    a[np.lexsort(a.T)], b[np.lexsort(b.T)], atol=1e-3)


@pytest.mark.slow
def test_demo_video_entry_stream(tmp_path, capsys):
    """--stream pipelines video frames through run_stream; the annotated
    output must still contain every frame, in order."""
    cv2 = pytest.importorskip("cv2")
    from centerpoly_tpu.infer.demo import main

    src = str(tmp_path / "clip.avi")
    w = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"MJPG"), 10.0,
                        (128, 64))
    rng = np.random.RandomState(0)
    for _ in range(5):
        w.write((rng.rand(64, 128, 3) * 255).astype(np.uint8))
    w.release()

    out_video = str(tmp_path / "clip_stream.avi")
    main(["polydet", "--dataset", "cityscapes", "--arch", "res_18",
          "--input_h", "64", "--input_w", "128", "--K", "8",
          "--demo", src, "--out_video", out_video, "--max_frames", "4",
          "--stream"])
    out = capsys.readouterr().out
    assert out.count("frame ") == 4
    assert "pipelined" in out
    cap = cv2.VideoCapture(out_video)
    n = 0
    while cap.read()[0]:
        n += 1
    cap.release()
    assert n == 4
