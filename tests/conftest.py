"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on CPU (fast, deterministic); multi-device tests shard over the
8 virtual devices. Real-TPU behavior is covered by bench.py / __graft_entry__.

The axon sitecustomize registers the remote-TPU backend in every python
process when PALLAS_AXON_POOL_IPS is set, and the outer env selects it via
JAX_PLATFORMS=axon. jax is therefore already imported by the time this
conftest runs, so plain os.environ edits to JAX_PLATFORMS are too late —
but jax.config.update("jax_platforms") is not, and XLA_FLAGS is read when
the CPU client is first created (no backend exists yet here). This keeps
everything in-process: an os.execve re-exec (the previous approach) loses
pytest's original stdout fd to the capture plugin's temp file, silently
swallowing the entire report when output is piped.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Persistent compile cache: this host has ONE cpu core, so big XLA compiles
# take minutes the first time; cache them across test runs.
_cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ["JAX_PLATFORMS"] = "cpu"  # for subprocesses spawned by tests

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# The sitecustomize imports jax before this conftest runs, so the
# JAX_COMPILATION_CACHE_DIR env var above is read too late — set the
# persistent cache programmatically (verified: env-only setup writes no
# entries; set_cache_dir does).
from jax.experimental.compilation_cache import (  # noqa: E402
    compilation_cache as _cc)

_cc.set_cache_dir(_cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert jax.devices()[0].platform == "cpu" and len(jax.devices()) == 8
