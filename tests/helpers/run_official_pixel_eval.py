"""Run the reference's official Cityscapes pixel-level semantic evaluator.

Executed as a subprocess by tests/test_semantic_eval.py: drives the vendored
evalPixelLevelSemanticLabeling.py (reference
src/lib/datasets/evaluation/cityscapesscripts/) on a fixture tree and prints
the resulting scores as one JSON line.

Usage: python run_official_pixel_eval.py <dataset_dir> <results_dir>
"""
import glob
import json
import math
import os
import sys


def _clean(d):
    return {k: (None if isinstance(v, float) and math.isnan(v) else float(v))
            for k, v in d.items()}


def main():
    dataset_dir, results_dir = sys.argv[1], sys.argv[2]
    os.environ["CITYSCAPES_DATASET"] = dataset_dir
    os.environ["CITYSCAPES_RESULTS"] = results_dir

    # modern Pillow removed PILLOW_VERSION; the vendored csHelpers probes it
    import PIL
    if not hasattr(PIL, "PILLOW_VERSION"):
        PIL.PILLOW_VERSION = getattr(PIL, "__version__", "10.0")
    # numpy 2.x removed the deprecated aliases the 2017-era script uses
    import numpy as np
    for name, typ in (("float", float), ("int", int), ("bool", bool)):
        if not hasattr(np, name):
            setattr(np, name, typ)
    if not hasattr(np, "ulonglong"):
        np.ulonglong = np.uint64
    if not hasattr(np, "longlong"):
        np.longlong = np.int64

    # the pixel script imports both `cityscapesscripts.*` and (via
    # csHelpers) `datasets.evaluation.cityscapesscripts.*`
    sys.path.insert(0, "/root/reference/src/lib")
    sys.path.insert(0, "/root/reference/src/lib/datasets/evaluation")
    from cityscapesscripts.evaluation import (
        evalPixelLevelSemanticLabeling as E)

    E.args.quiet = True
    E.args.JSONOutput = False
    E.args.colorized = False
    E.args.bold = E.args.nocol = ""
    gts = sorted(glob.glob(os.path.join(
        dataset_dir, "gtFine", "*", "*", "*_gtFine_labelIds.png")))
    assert gts, "no GT found"
    preds = [E.getPrediction(E.args, gt) for gt in gts]
    res = E.evaluateImgLists(preds, gts, E.args)
    out = {
        "classScores": _clean(res["classScores"]),
        "categoryScores": _clean(res["categoryScores"]),
        "classInstScores": _clean(res["classInstScores"]),
        "categoryInstScores": _clean(res["categoryInstScores"]),
        "averageScoreClasses": res["averageScoreClasses"],
        "averageScoreCategories": res["averageScoreCategories"],
        "averageScoreInstClasses": res["averageScoreInstClasses"],
        "averageScoreInstCategories": res["averageScoreInstCategories"],
    }
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
