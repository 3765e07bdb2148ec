"""Batched-throughput benchmark: the bench.py pipeline vmapped over a
frame batch (2048x1024 -> detections), frames/s per chip.

Honest on-device timing via scan-differencing (utils/timing.py) — the
old dispatch-loop + block_until_ready version measured the dispatch
queue, not the chip (see RESULTS.md methodology note).

    python experiments/bench_batch.py
"""
import os, sys, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import numpy as np, jax, jax.numpy as jnp
from centerpoly_tpu.configs import Config
from centerpoly_tpu.geometry.affine import warp_axis_aligned
from centerpoly_tpu.infer.detector import PolydetDetector
from centerpoly_tpu.utils.timing import measure_device_time

cfg = Config(task="polydet", dataset="cityscapes", arch="dla_34", input_h=512, input_w=1024)
det = PolydetDetector(cfg)
rng = np.random.RandomState(0)
trans, meta = det.pre_process_meta(1024, 2048, 1.0)
trans_dev = jax.device_put(jnp.asarray(trans, jnp.float32))
mean_dev = jax.device_put(jnp.asarray(cfg.mean, jnp.float32))
std_dev = jax.device_put(jnp.asarray(cfg.std, jnp.float32))

for B in (1, 4, 8):
    frames = jax.device_put((rng.rand(B, 1024, 2048, 3)*255).astype(np.uint8))

    def scalar_pipeline(eps, variables, frames_u8, trans, mean, std):
        imgs = jax.vmap(lambda f: warp_axis_aligned(
            f.astype(jnp.float32) + eps, trans,
            (cfg.input_h, cfg.input_w)))(frames_u8)
        imgs = (imgs / 255.0 - mean) / std
        _, dets = det._process_device(variables, imgs)
        return jnp.sum(dets.astype(jnp.float32))

    dt = measure_device_time(
        scalar_pipeline,
        (det.variables, frames, trans_dev, mean_dev, std_dev),
        k_big=9, reps=3)
    print(json.dumps({"batch": B, "s_per_batch": round(dt, 6),
                      "frames_per_s": round(B/dt, 1)}), flush=True)
