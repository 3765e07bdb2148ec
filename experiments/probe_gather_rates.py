"""Probe: honest device rates of TPU gather primitives, to pick the DCN
sampling formulation.  Chunk-rate vs chunk-size is the question: the DCN
forward is bound by gather descriptor rate (~233M chunks/s measured at
128 B chunks), so bigger chunks via a well-lowered primitive win.

    python experiments/probe_gather_rates.py
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
    N = 32768            # pixels (stride-4 map)
    K = 9                # taps
    C = 64

    x = jnp.asarray(rng.randn(N, C), jnp.bfloat16)          # 128B rows
    x2 = jnp.asarray(rng.randn(N // 2, 2 * C), jnp.bfloat16)  # 256B rows
    x4 = jnp.asarray(rng.randn(N // 4, 4 * C), jnp.bfloat16)  # 512B rows
    xf32 = x.astype(jnp.float32)                              # 256B rows
    idx = jnp.asarray(rng.randint(0, N, (N, K)), jnp.int32)
    idx2 = jnp.asarray(rng.randint(0, N // 2, (N, K)), jnp.int32)
    idx4 = jnp.asarray(rng.randint(0, N // 4, (N, K)), jnp.int32)
    # spatially local indices: i + small jitter (DCN-like locality)
    loc = np.clip(np.arange(N)[:, None]
                  + rng.randint(-1024, 1024, (N, K)), 0, N - 1)
    idx_loc = jnp.asarray(loc, jnp.int32)
    # take_along_axis within rows of an image: (B,H,W,C) gather along W
    B, H, W = 1, 128, 256
    ximg = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
    wid = jnp.asarray(rng.randint(0, W, (B, H, W, K)), jnp.int32)

    def t(name, fn, args, chunks, chunk_b):
        def scalar(eps, *a):
            # mix eps into the OPERAND so the gather cannot be hoisted
            # out of the timing scan as loop-invariant
            out = fn(a[0] + eps.astype(a[0].dtype), *a[1:])
            return jnp.sum(out.astype(jnp.float32))
        s = measure_device_time(scalar, args)
        print(json.dumps({
            "probe": name, "ms": round(s * 1e3, 3),
            "Mchunks_per_s": round(chunks / s / 1e6, 1),
            "GBps": round(chunks * chunk_b / s / 1e9, 1)}), flush=True)

    nK = N * K
    t("take_rows_128B", lambda x, i: jnp.take(x, i, axis=0), (x, idx),
      nK, 128)
    t("take_rows_128B_local", lambda x, i: jnp.take(x, i, axis=0),
      (x, idx_loc), nK, 128)
    t("take_rows_256B_f32", lambda x, i: jnp.take(x, i, axis=0),
      (xf32, idx), nK, 256)
    t("take_rows_256B_2C", lambda x, i: jnp.take(x, i, axis=0),
      (x2, idx2), nK, 256)
    t("take_rows_512B_4C", lambda x, i: jnp.take(x, i, axis=0),
      (x4, idx4), nK, 512)
    # find the byte ceiling: where does chunk rate stop being free?
    x8 = jnp.asarray(rng.randn(N // 8, 8 * C), jnp.bfloat16)   # 1KB
    x16 = jnp.asarray(rng.randn(N // 16, 16 * C), jnp.bfloat16)  # 2KB
    idx8 = jnp.asarray(rng.randint(0, N // 8, (N, K)), jnp.int32)
    idx16 = jnp.asarray(rng.randint(0, N // 16, (N, K)), jnp.int32)
    t("take_rows_1KB_8C", lambda x, i: jnp.take(x, i, axis=0),
      (x8, idx8), nK, 1024)
    t("take_rows_2KB_16C", lambda x, i: jnp.take(x, i, axis=0),
      (x16, idx16), nK, 2048)
    t("take_along_W_128B",
      lambda x, i: jnp.take_along_axis(
          x[:, :, :, None, :], i[..., None], axis=2),
      (ximg, wid), B * H * W * K, 128)

    # 4 separate takes vs 1 merged take of 4x indices
    idx_a = [jnp.asarray(rng.randint(0, N, (N, K)), jnp.int32)
             for _ in range(4)]
    t("four_takes_128B",
      lambda x, a, b_, c, d: (jnp.take(x, a, 0) + jnp.take(x, b_, 0)
                              + jnp.take(x, c, 0) + jnp.take(x, d, 0)),
      (x, *idx_a), 4 * nK, 128)
    merged = jnp.stack(idx_a, 0)
    t("one_take_4x_128B", lambda x, i: jnp.take(x, i, axis=0),
      (x, merged), 4 * nK, 128)


if __name__ == "__main__":
    main()
