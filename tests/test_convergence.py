"""Oracle-free end-to-end training convergence.

The strongest correctness property no unit test can catch: training the
REAL polydet step (focal + offset + poly + depth losses, Adam, the real
sampler and decode) on a synthetic rectangle fixture must produce a
detector whose *predicted* (non-oracle) decode -> rasterize ->
official-protocol instance AP clears AP50 >= 0.5.  Mirrors what the
reference demonstrates by training on Cityscapes (src/main.py:24-198).

Runs the same harness as experiments/train_convergence.py (whose
TPU-scale results live in experiments/RESULTS.md).
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "experiments"))


@pytest.mark.slow
def test_training_learns_detector_oracle_free(tmp_path):
    from train_convergence import run

    res = run(arch="res_18", rep="cartesian", poly_loss="l1",
              epochs=40, n_images=8, input_h=128, input_w=256,
              batch_size=4, lr=2.5e-4, bar=0.5, val_every=5,
              root=str(tmp_path))
    assert res["passed"], (
        f"AP50 {res['final_ap50']:.3f} < 0.5 after {res['steps']} steps: "
        f"trajectory {res['ap_trajectory']}")
    # the mean AP over 0.50:0.95 must also be clearly non-trivial
    assert res["final_ap"] > 0.15, res
