"""Compare XLA lowering strategies for the DCNv2 bilinear gather on TPU.

Representative shape: feature map 128x256xC, 9 taps, 4 corners per tap.
Run: python experiments/gather_bench.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

H, W, C, K = 128, 256, 64, 9


def timeit(f, *args, n=5):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def make_inputs(seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(H, W, C).astype(np.float32))
    sy = jnp.asarray(
        (rng.rand(H, W, K) * (H - 2)).astype(np.float32))
    sx = jnp.asarray(
        (rng.rand(H, W, K) * (W - 2)).astype(np.float32))
    return x, sy, sx


def v_fancy2d(x, sy, sx):
    y0 = jnp.floor(sy).astype(jnp.int32)
    x0 = jnp.floor(sx).astype(jnp.int32)
    fy = (sy - y0)[..., None]
    fx = (sx - x0)[..., None]

    def tap(yi, xi):
        return x[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]

    return (tap(y0, x0) * (1 - fy) * (1 - fx)
            + tap(y0, x0 + 1) * (1 - fy) * fx
            + tap(y0 + 1, x0) * fy * (1 - fx)
            + tap(y0 + 1, x0 + 1) * fy * fx)


def v_flat_take(x, sy, sx):
    y0 = jnp.floor(sy).astype(jnp.int32)
    x0 = jnp.floor(sx).astype(jnp.int32)
    fy = (sy - y0)[..., None]
    fx = (sx - x0)[..., None]
    xf = x.reshape(H * W, C)

    def tap(yi, xi):
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        return jnp.take(xf, idx, axis=0)

    return (tap(y0, x0) * (1 - fy) * (1 - fx)
            + tap(y0, x0 + 1) * (1 - fy) * fx
            + tap(y0 + 1, x0) * fy * (1 - fx)
            + tap(y0 + 1, x0 + 1) * fy * fx)


def v_two_rows(x, sy, sx):
    """Gather full rows (y0, y0+1) then column-sample: row gather is
    contiguous (W*C) so only H*W*K*2 row gathers of stride W*C."""
    y0 = jnp.floor(sy).astype(jnp.int32)
    x0 = jnp.floor(sx).astype(jnp.int32)
    fy = (sy - y0)[..., None]
    fx = (sx - x0)[..., None]
    x0c = jnp.clip(x0, 0, W - 1)
    x1c = jnp.clip(x0 + 1, 0, W - 1)
    idx00 = jnp.clip(y0, 0, H - 1) * W + x0c
    idx01 = jnp.clip(y0, 0, H - 1) * W + x1c
    idx10 = jnp.clip(y0 + 1, 0, H - 1) * W + x0c
    idx11 = jnp.clip(y0 + 1, 0, H - 1) * W + x1c
    xf = x.reshape(H * W, C)
    stacked = jnp.stack([idx00, idx01, idx10, idx11])  # (4, H, W, K)
    g = jnp.take(xf, stacked.reshape(-1), axis=0).reshape(
        4, H, W, K, C)
    return (g[0] * (1 - fy) * (1 - fx) + g[1] * (1 - fy) * fx
            + g[2] * fy * (1 - fx) + g[3] * fy * fx)


def v_onehot_rows(x, sy, sx):
    """Row one-hot matmul + in-row horizontal interp via take on columns."""
    # separable approximation is not exact; skip (placeholder)
    return None


def main():
    x, sy, sx = make_inputs()
    for name, fn in [("fancy2d", v_fancy2d), ("flat_take", v_flat_take),
                     ("two_rows", v_two_rows)]:
        f = jax.jit(fn)
        t = timeit(f, x, sy, sx)
        print(f"{name}: {t * 1000:.2f} ms")
        sys.stdout.flush()
    # cross-check correctness
    a = v_fancy2d(x, sy, sx)
    b = v_flat_take(x, sy, sx)
    c = v_two_rows(x, sy, sx)
    print("max diff flat:", float(jnp.max(jnp.abs(a - b))))
    print("max diff rows:", float(jnp.max(jnp.abs(a - c))))


if __name__ == "__main__":
    main()
