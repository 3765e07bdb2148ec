"""ctypes bindings for the native eval components in cpp/.

- confusion_matrix: pixel-level confusion accumulation
  (ref addToConfusionMatrix.pyx); numpy fallback when the library
  isn't built.
- kitti_eval binary: official-protocol KITTI detection AP
  (ref src/tools/kitti_eval/evaluate_object_3d_offline.cpp).

Both artifacts build with `make -C cpp`; `ensure_built` invokes it on
demand.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional

import numpy as np

CPP_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "cpp")
LIB_PATH = os.path.join(CPP_DIR, "build", "libcenterpoly_native.so")
KITTI_EVAL_BIN = os.path.join(CPP_DIR, "build", "kitti_eval")

_lib = None


def ensure_built(artifacts=(LIB_PATH, KITTI_EVAL_BIN)) -> bool:
    """Build cpp/ artifacts if missing. Returns True when every artifact
    in `artifacts` is available.

    Gated per artifact: the confusion-matrix library must not be
    reported unavailable (dropping add_to_confusion_matrix to the slow
    numpy fallback) just because the unrelated kitti_eval binary failed
    to build, and vice versa.
    """
    if all(os.path.exists(a) for a in artifacts):
        return True
    try:
        subprocess.run(["make", "-C", CPP_DIR], check=True,
                       capture_output=True)
    except (OSError, subprocess.CalledProcessError):
        pass
    # re-check after make: a partially successful build may still have
    # produced everything this caller needs
    return all(os.path.exists(a) for a in artifacts)


def _load():
    global _lib
    if _lib is None and ensure_built(artifacts=(LIB_PATH,)):
        lib = ctypes.CDLL(LIB_PATH)
        lib.add_to_confusion_matrix.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_uint64, ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_uint32]
        lib.add_to_confusion_matrix.restype = None
        _lib = lib
    return _lib


def add_to_confusion_matrix(prediction: np.ndarray,
                            ground_truth: np.ndarray,
                            conf_matrix: np.ndarray) -> np.ndarray:
    """Accumulate uint8 label images into conf_matrix (dim, dim) uint64.

    Uses the native loop when built, else a numpy bincount fallback with
    identical semantics (labels >= dim are dropped).
    """
    pred = np.ascontiguousarray(prediction, np.uint8).reshape(-1)
    gt = np.ascontiguousarray(ground_truth, np.uint8).reshape(-1)
    assert pred.shape == gt.shape
    dim = conf_matrix.shape[0]
    assert conf_matrix.shape == (dim, dim)

    lib = _load()
    if lib is not None:
        cm = np.ascontiguousarray(conf_matrix, np.uint64)
        lib.add_to_confusion_matrix(
            pred.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            gt.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_uint64(pred.size),
            cm.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            ctypes.c_uint32(dim))
        conf_matrix[:] = cm
        return conf_matrix

    valid = (gt < dim) & (pred < dim)
    idx = gt[valid].astype(np.int64) * dim + pred[valid].astype(np.int64)
    conf_matrix += np.bincount(idx, minlength=dim * dim).reshape(
        dim, dim).astype(np.uint64)
    return conf_matrix


def run_kitti_eval(gt_dir: str, result_dir: str
                   ) -> Optional[Dict[str, Dict[str, list]]]:
    """Run the native KITTI evaluator.

    Returns {class: {metric: [easy, moderate, hard]}} with metrics in
    {'detection', 'bev', '3d', 'aos'}; None if the binary is unavailable.
    """
    if not ensure_built(artifacts=(KITTI_EVAL_BIN,)):
        return None
    proc = subprocess.run([KITTI_EVAL_BIN, gt_dir, result_dir],
                          capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(f"kitti_eval failed: {proc.stderr}")
    out: Dict[str, Dict[str, list]] = {}
    for line in proc.stdout.splitlines():
        parts = line.split()
        if not parts:
            continue
        if parts[0] == "AP" and len(parts) == 6:
            _, cls, metric, e, m, h = parts
            out.setdefault(cls, {})[metric] = [float(e), float(m),
                                               float(h)]
        elif parts[0] == "AOS" and len(parts) == 5:
            _, cls, e, m, h = parts
            out.setdefault(cls, {})["aos"] = [float(e), float(m),
                                              float(h)]
    return out
