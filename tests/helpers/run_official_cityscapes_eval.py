"""Run the reference's official Cityscapes instance-level evaluator.

Executed as a subprocess by tests/test_eval_crosscheck.py: drives the
vendored evalInstanceLevelSemanticLabeling.py (reference
src/lib/datasets/evaluation/cityscapesscripts/) on a fixture tree and
prints the resulting averages as one JSON line.

Usage: python run_official_cityscapes_eval.py <dataset_dir> <results_dir>
"""
import json
import os
import sys


def main():
    dataset_dir, results_dir = sys.argv[1], sys.argv[2]
    os.environ["CITYSCAPES_DATASET"] = dataset_dir
    os.environ["CITYSCAPES_RESULTS"] = results_dir

    # modern Pillow removed PILLOW_VERSION; the vendored csHelpers probes it
    import PIL
    if not hasattr(PIL, "PILLOW_VERSION"):
        PIL.PILLOW_VERSION = getattr(PIL, "__version__", "10.0")
    # numpy 2.x removed the deprecated builtin aliases the 2017-era script uses
    import numpy as np
    for name, typ in (("float", float), ("int", int), ("bool", bool)):
        if not hasattr(np, name):
            setattr(np, name, typ)

    sys.path.insert(0, "/root/reference/src/lib")
    from datasets.evaluation.cityscapesscripts.evaluation import (
        evalInstanceLevelSemanticLabeling as E)

    E.args.quiet = True
    E.args.JSONOutput = False
    # never read/write the cache shipped inside the read-only reference tree
    E.args.gtInstancesFile = os.path.join(results_dir, "gtInstances.json")
    import glob
    gts = sorted(glob.glob(E.args.groundTruthSearch))
    preds = [E.getPrediction(gt, E.args) for gt in gts]
    res = E.evaluateImgLists(preds, gts, E.args)
    out = {
        "allAp": float(res["averages"]["allAp"]),
        "allAp50": float(res["averages"]["allAp50%"]),
        "classes": {
            k: {"ap": float(v["ap"]), "ap50": float(v["ap50%"])}
            for k, v in res["averages"]["classes"].items()
        },
    }
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
