"""Probe: can the low-channel high-res stem convs run faster with W on
the lane dimension (NCHW dimension numbers) than NHWC?

DLA's stem is C=16..32 at 512x1024: NHWC puts C on lanes, so XLA pads
16 -> 128 (8x wasted lanes; the OOM dumps show 8x padded stem temps).
Transposing to NCHW puts W=1024 on lanes (full utilization) at the cost
of two explicit transposes around the stem.

    python experiments/probe_stem_layout.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))), ".jax_cache"))
    import jax
    import jax.numpy as jnp
    from centerpoly_tpu.utils.timing import measure_device_time

    rng = np.random.RandomState(0)
    H, W = 512, 1024
    dt = jnp.bfloat16

    for cin, cout, k in [(3, 16, 7), (16, 16, 3), (16, 32, 3)]:
        x = jnp.asarray(rng.randn(1, H, W, cin), dt)
        w_hwio = jnp.asarray(rng.randn(k, k, cin, cout) * 0.05, dt)

        def nhwc(eps, x, w):
            return jnp.sum(jax.lax.conv_general_dilated(
                x + eps.astype(x.dtype), w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32))

        xc = jnp.transpose(x, (0, 3, 1, 2))
        w_oihw = jnp.transpose(w_hwio, (3, 2, 0, 1))

        def nchw(eps, xc, w):
            return jnp.sum(jax.lax.conv_general_dilated(
                xc + eps.astype(xc.dtype), w, (1, 1), "SAME",
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                preferred_element_type=jnp.float32))

        def nchw_roundtrip(eps, x, w):
            xc = jnp.transpose(x + eps.astype(x.dtype), (0, 3, 1, 2))
            y = jax.lax.conv_general_dilated(
                xc, w, (1, 1), "SAME",
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                preferred_element_type=jnp.float32)
            return jnp.sum(jnp.transpose(y, (0, 2, 3, 1)))

        def im2col(eps, x, w):
            # explicit patches @ weights matmul: M = H*W on MXU rows,
            # K = k*k*cin on the contraction — no lane padding of cin
            xp = x + eps.astype(x.dtype)
            patches = jax.lax.conv_general_dilated_patches(
                xp, (k, k), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            wf = w.reshape(k * k * cin, cout)
            return jnp.sum(jnp.einsum(
                "bhwf,fo->bhwo", patches, wf,
                preferred_element_type=jnp.float32))

        def conv_bn_relu(eps, x, w):
            # is the BN+ReLU epilogue fused into the conv? compare vs nhwc
            y = jax.lax.conv_general_dilated(
                x + eps.astype(x.dtype), w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            scale = jnp.full((cout,), 1.01, jnp.float32)
            shift = jnp.full((cout,), 0.02, jnp.float32)
            return jnp.sum(jnp.maximum(y * scale + shift, 0.0))

        row = {"conv": f"{k}x{k} {cin}->{cout} @512x1024"}
        row["nhwc_ms"] = round(
            measure_device_time(nhwc, (x, w_hwio)) * 1e3, 3)
        row["nchw_ms"] = round(
            measure_device_time(nchw, (xc, w_oihw)) * 1e3, 3)
        row["nchw_roundtrip_ms"] = round(
            measure_device_time(nchw_roundtrip, (x, w_oihw)) * 1e3, 3)
        row["im2col_ms"] = round(
            measure_device_time(im2col, (x, w_hwio)) * 1e3, 3)
        row["conv_bn_relu_ms"] = round(
            measure_device_time(conv_bn_relu, (x, w_hwio)) * 1e3, 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
