"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on CPU (fast, deterministic); multi-device tests shard over the
8 virtual devices. Real-TPU behavior is covered by bench.py / __graft_entry__.

The axon sitecustomize force-registers the TPU backend in every python
process when PALLAS_AXON_POOL_IPS is set (overriding JAX_PLATFORMS), so if
that var is present we re-exec pytest once with it removed — otherwise the
"8-device" tests silently degrade to the single real TPU chip.
"""
import os
import sys

if os.environ.get("PALLAS_AXON_POOL_IPS") and \
        not os.environ.get("_CENTERPOLY_TEST_REEXEC"):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"  # outer env says "axon"
    env["_CENTERPOLY_TEST_REEXEC"] = "1"
    argv0 = sys.argv[0]
    if os.path.basename(argv0).startswith("pytest") and \
            os.access(argv0, os.X_OK):
        os.execve(argv0, sys.argv, env)
    else:
        os.execve(sys.executable,
                  [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

# force cpu: the outer env sets JAX_PLATFORMS=axon, which is only
# registered when PALLAS_AXON_POOL_IPS is present (we just removed it)
os.environ["JAX_PLATFORMS"] = "cpu"
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
