"""Cross-validate eval/instance_eval.py against the official evaluator.

Generates a synthetic fixture (GT instance-id PNGs + prediction masks with
varied overlaps, confidences, a group region, void pixels, and a
sub-minRegionSize instance), runs the reference's vendored
evalInstanceLevelSemanticLabeling.py on it in a subprocess, and asserts our
evaluator produces identical AP / AP50 (reference :398-621).
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

HELPERS = os.path.join(os.path.dirname(__file__), "helpers")


def _make_fixture(root):
    """Two 256x512 images; returns (gt_arrays, pred_lists) keyed by stem."""
    rng = np.random.RandomState(7)
    ds = os.path.join(root, "ds")
    res = os.path.join(root, "res")
    gt_dir = os.path.join(ds, "gtFine", "val", "toytown")
    os.makedirs(gt_dir, exist_ok=True)
    os.makedirs(res, exist_ok=True)

    gt_arrays, preds = {}, {}
    for idx in range(2):
        stem = f"toytown_{idx:06d}_000019"
        gt = np.zeros((256, 512), np.uint16)
        # background: road (7, void for instance eval)
        gt[:] = 7
        # two cars (26), one person (24), one train (31)
        gt[20:80, 30:150] = 26000
        gt[90:180, 40:160] = 26001
        gt[30:120, 200:260] = 24000
        gt[150:220, 300:460] = 31000
        # a car group region (bare labelID)
        gt[200:250, 30:120] = 26
        # a tiny instance below minRegionSize (100 px)
        gt[10:15, 480:495] = 24001
        # void-ish unlabeled patch
        gt[0:40, 400:450] = 0
        if idx == 1:
            gt[20:80, 30:150] = 7  # image 1 loses one car
        gt_arrays[stem] = gt.astype(np.int64)
        Image.fromarray(gt).save(
            os.path.join(gt_dir, stem + "_gtFine_instanceIds.png"))

        # predictions: good car, shifted car, person with medium IoU,
        # spurious bus, train missed entirely; one pred mostly over void
        plist = []

        def add(mask, label_id, conf):
            plist.append({"mask": mask.astype(np.uint8) * 255,
                          "labelID": label_id, "conf": conf})

        m = np.zeros((256, 512), bool); m[22:78, 32:148] = True
        add(m, 26, 0.95)                      # high IoU with car 0
        m = np.zeros((256, 512), bool); m[100:190, 60:180] = True
        add(m, 26, 0.80)                      # partial IoU with car 1
        m = np.zeros((256, 512), bool); m[30:120, 210:280] = True
        add(m, 24, 0.70)                      # medium IoU person
        m = np.zeros((256, 512), bool); m[5:60, 350:420] = True
        add(m, 28, 0.60)                      # spurious bus
        m = np.zeros((256, 512), bool); m[0:35, 402:448] = True
        add(m, 26, 0.55)                      # mostly over void patch
        m = np.zeros((256, 512), bool); m[205:245, 35:115] = True
        add(m, 26, 0.50)                      # overlaps the group region
        # duplicate detection on car 0 with lower conf
        m = np.zeros((256, 512), bool); m[25:75, 35:140] = True
        add(m, 26, 0.40)
        if idx == 1:
            plist = plist[1:]  # vary across images
        preds[stem] = plist

        # write the official result format: txt manifest + mask PNGs
        lines = []
        for i, p in enumerate(plist):
            rel = f"{stem}_{i}.png"
            Image.fromarray(p["mask"]).save(os.path.join(res, rel))
            lines.append(f"{rel} {p['labelID']} {p['conf']}")
        with open(os.path.join(res, stem + ".txt"), "w") as f:
            f.write("\n".join(lines) + "\n")
    return ds, res, gt_arrays, preds


@pytest.fixture(scope="module")
def fixture_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("evalfix"))
    return _make_fixture(root)


def _run_official(ds, res, cwd):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # no jax involved, but keep clean
    out = subprocess.run(
        [sys.executable,
         os.path.join(HELPERS, "run_official_cityscapes_eval.py"), ds, res],
        capture_output=True, text=True, cwd=cwd, timeout=600, env=env)
    assert out.returncode == 0, f"official eval failed:\n{out.stdout}\n{out.stderr}"
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise AssertionError(f"no RESULT line in output:\n{out.stdout}")


def test_matches_official_evaluator(fixture_tree, tmp_path):
    ds, res, gt_arrays, preds = fixture_tree
    official = _run_official(ds, res, str(tmp_path))

    from centerpoly_tpu.eval.instance_eval import evaluate_instances
    ours = evaluate_instances(gt_arrays, preds)

    assert ours["allAp"] == pytest.approx(official["allAp"], abs=1e-9)
    assert ours["allAp50%"] == pytest.approx(official["allAp50"], abs=1e-9)
    for cls, v in official["classes"].items():
        got = ours["classes"][cls]
        if np.isnan(v["ap"]):
            assert np.isnan(got["ap"])
        else:
            assert got["ap"] == pytest.approx(v["ap"], abs=1e-9), cls
            assert got["ap50%"] == pytest.approx(v["ap50"], abs=1e-9), cls


def test_load_prediction_dir_matches_arrays(fixture_tree):
    """Reading the txt/mask result format reproduces the in-memory preds."""
    ds, res, gt_arrays, preds = fixture_tree
    from centerpoly_tpu.eval.instance_eval import (
        evaluate_instances, load_prediction_dir)
    loaded = load_prediction_dir(res, list(gt_arrays))
    a = evaluate_instances(gt_arrays, loaded)
    b = evaluate_instances(gt_arrays, preds)
    assert a["allAp"] == pytest.approx(b["allAp"], abs=1e-12)
    assert a["allAp50%"] == pytest.approx(b["allAp50%"], abs=1e-12)
