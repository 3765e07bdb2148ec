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
