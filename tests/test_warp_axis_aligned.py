import numpy as np
import jax.numpy as jnp

from centerpoly_tpu.geometry.affine import (
    warp_affine, warp_axis_aligned, get_affine_transform)


def test_matches_gather_warp():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(64, 96, 3).astype(np.float32))
    cases = [
        get_affine_transform(np.array([48.0, 32.0]), 96.0, 0, (48, 32)),
        np.array([[0.5, 0, 3.2], [0, 0.7, -1.4]], np.float32),
        np.array([[1.7, 0, -5.0], [0, 2.3, 4.5]], np.float32),
    ]
    for t in cases:
        a = np.asarray(warp_affine(img, t, (40, 60)))
        b = np.asarray(warp_axis_aligned(img, t, (40, 60)))
        # pixel-value tolerance: well under uint8 quantization (1/255)
        assert np.abs(a - b).max() < 3e-3


def test_scale_folded_warp_matches_resize_then_warp():
    """Multi-scale inference: folding the test scale into the warp matrix
    (one resample of the original frame) must be geometrically identical
    to the reference's cv2-resize-by-scale THEN warp
    (base_detector.py:41-60).  Checked on a smooth image where the two
    resampling paths agree to interpolation tolerance."""
    h, w, scale = 64, 96, 0.5
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([yy / h, xx / w, (yy + xx) / (h + w)], -1)
    new_h, new_w = int(h * scale), int(w * scale)
    c = np.array([new_w / 2.0, new_h / 2.0], np.float32)
    s = max(h, w) * 1.0
    trans = get_affine_transform(c, s, 0, (48, 32))
    # reference path: bilinear resize to (new_h, new_w), then warp
    ry = (np.arange(new_h) + 0.5) * (h / new_h) - 0.5
    rx = (np.arange(new_w) + 0.5) * (w / new_w) - 0.5
    y0 = np.clip(np.floor(ry).astype(int), 0, h - 2)
    x0 = np.clip(np.floor(rx).astype(int), 0, w - 2)
    fy = (ry - y0)[:, None, None]
    fx = (rx - x0)[None, :, None]
    small = (img[y0][:, x0] * (1 - fy) * (1 - fx)
             + img[y0 + 1][:, x0] * fy * (1 - fx)
             + img[y0][:, x0 + 1] * (1 - fy) * fx
             + img[y0 + 1][:, x0 + 1] * fy * fx)
    ref = np.asarray(warp_axis_aligned(jnp.asarray(small), trans, (32, 48)))
    # our path: fold scale into the matrix, warp the ORIGINAL frame once
    tf = trans.copy()
    tf[:, :2] *= scale
    got = np.asarray(warp_axis_aligned(jnp.asarray(img), tf, (32, 48)))
    assert np.abs(got - ref).max() < 0.02


class TestKeepRes:
    """fix_res=False: the device warp canvas must follow the per-image
    padded (inp_h, inp_w), not cfg.input_* (regression: the warp used
    to always render the fixed canvas, cropping keep-res inputs and
    desyncing meta['out_*'] from the actual feature grid)."""

    def _det(self):
        from centerpoly_tpu.configs import Config
        from centerpoly_tpu.infer.detector import PolydetDetector
        cfg = Config.from_args(
            ["polydet", "--dataset", "cityscapes", "--arch", "res_18",
             "--input_h", "128", "--input_w", "256", "--no_fix_res"])
        assert not cfg.fix_res
        return PolydetDetector(cfg)

    def test_canvas_follows_padded_size(self):
        det = self._det()
        h, w = 100, 200          # -> inp (128, 224) with pad=31
        trans, meta = det.pre_process_meta(h, w, 1.0)
        assert (meta["inp_h"], meta["inp_w"]) == (128, 224)
        img = np.zeros((h, w, 3), np.uint8)
        img[h // 2 - 1:h // 2 + 2, w // 2 - 1:w // 2 + 2] = 255
        images = det._pre_jit(jnp.asarray(img), jnp.asarray(trans),
                              det.mean, det.std,
                              (meta["inp_h"], meta["inp_w"]))
        assert images.shape[1:3] == (128, 224)
        # keep-res centers the frame 1:1 on the padded canvas: the blob
        # must land at the canvas center (undo normalization first)
        blob = np.asarray(images[0]) * np.asarray(det.cfg.std) \
            + np.asarray(det.cfg.mean)
        yy, xx = np.unravel_index(np.argmax(blob[..., 0]), blob.shape[:2])
        assert abs(yy - 64) <= 2 and abs(xx - 112) <= 2

    def test_run_end_to_end(self):
        det = self._det()
        img = (np.random.RandomState(0).rand(100, 200, 3) * 255).astype(
            np.uint8)
        ret = det.run(img)
        assert "results" in ret
