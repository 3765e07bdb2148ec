"""Cross-validate eval/semantic_eval.py against the official pixel-level
evaluator (reference evalPixelLevelSemanticLabeling.py), same pattern as
test_eval_crosscheck: synthetic labelIds/instanceIds GT + prediction PNGs,
official script in a subprocess, score-exact comparison."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

HELPERS = os.path.join(os.path.dirname(__file__), "helpers")


def _make_fixture(root):
    """Two 128x256 images with confusions, ignored labels, instances."""
    ds = os.path.join(root, "ds")
    res = os.path.join(root, "res")
    gt_dir = os.path.join(ds, "gtFine", "val", "toytown")
    os.makedirs(gt_dir, exist_ok=True)
    os.makedirs(res, exist_ok=True)

    pairs, inst_pairs = [], []
    for idx in range(2):
        stem = f"toytown_{idx:06d}_000019"
        gt = np.zeros((128, 256), np.uint8)
        gt[:] = 7                      # road
        gt[:40, :] = 23                # sky
        gt[40:70, :100] = 11           # building
        gt[40:70, 100:140] = 21        # vegetation
        gt[80:120, 20:60] = 24         # person (instance 24000)
        gt[80:120, 80:160] = 26        # car (instance 26000)
        gt[80:110, 180:220] = 26       # car (instance 26001)
        gt[0:10, 240:256] = 1          # ego vehicle (ignored)
        gt[120:128, :50] = 9           # parking (ignored)
        gt[70:80, 200:240] = 18        # polegroup (ignored)
        if idx == 1:
            gt[80:120, 20:60] = 7      # image 1 loses the person

        inst = gt.astype(np.uint16).copy()
        if idx == 0:
            inst[80:120, 20:60] = 24000
        inst[80:120, 80:160] = 26000
        inst[80:110, 180:220] = 26001

        pred = gt.copy()
        # confusions: some road -> sidewalk, part of car 0 -> person,
        # sky strip -> building, predictions over ignored GT
        pred[120:128, 100:180] = 8
        pred[80:120, 80:100] = 24
        pred[0:5, 0:60] = 11
        pred[0:10, 240:256] = 26       # over ego vehicle (ignored row)
        pred[120:128, :50] = 7         # over parking (ignored row)
        pred[70:80, 200:240] = 17      # pole over polegroup (ignored row)
        if idx == 1:
            pred[90:100, 180:210] = 32  # motorcycle confusion on car 1

        pairs.append((pred, gt))
        inst_pairs.append((pred, inst))
        Image.fromarray(gt).save(
            os.path.join(gt_dir, stem + "_gtFine_labelIds.png"))
        Image.fromarray(inst).save(
            os.path.join(gt_dir, stem + "_gtFine_instanceIds.png"))
        Image.fromarray(pred).save(os.path.join(res, stem + "_pred.png"))
    return ds, res, pairs, inst_pairs


@pytest.fixture(scope="module")
def fixture_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("semfix"))
    return _make_fixture(root)


def _run_official(ds, res, cwd):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    out = subprocess.run(
        [sys.executable,
         os.path.join(HELPERS, "run_official_pixel_eval.py"), ds, res],
        capture_output=True, text=True, cwd=cwd, timeout=600, env=env)
    assert out.returncode == 0, (
        f"official eval failed:\n{out.stdout}\n{out.stderr}")
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise AssertionError(f"no RESULT line in output:\n{out.stdout}")


def _assert_scores_match(ours, official):
    for name, v in official.items():
        got = ours[name]
        if v is None:
            assert np.isnan(got), name
        else:
            assert got == pytest.approx(v, abs=1e-9), name


def test_matches_official_pixel_evaluator(fixture_tree, tmp_path):
    ds, res, pairs, inst_pairs = fixture_tree
    official = _run_official(ds, res, str(tmp_path))

    from centerpoly_tpu.eval.semantic_eval import evaluate_semantic
    ours = evaluate_semantic(pairs, inst_pairs)

    _assert_scores_match(ours["classScores"], official["classScores"])
    _assert_scores_match(ours["categoryScores"],
                         official["categoryScores"])
    _assert_scores_match(ours["classInstScores"],
                         official["classInstScores"])
    _assert_scores_match(ours["categoryInstScores"],
                         official["categoryInstScores"])
    for key in ("averageScoreClasses", "averageScoreCategories",
                "averageScoreInstClasses", "averageScoreInstCategories"):
        assert ours[key] == pytest.approx(official[key], abs=1e-9), key


def test_perfect_prediction_iou_one(fixture_tree):
    """GT scored against itself: every present class IoU == 1."""
    from centerpoly_tpu.eval.semantic_eval import evaluate_semantic
    _, _, pairs, _ = fixture_tree
    gt = pairs[0][1]
    r = evaluate_semantic([(gt, gt)])
    for name in ("road", "sky", "building", "person", "car"):
        assert r["classScores"][name] == pytest.approx(1.0)
    assert r["averageScoreClasses"] == pytest.approx(1.0)
    # ignored labels stay nan even though present
    assert np.isnan(r["classScores"]["ego vehicle"])
