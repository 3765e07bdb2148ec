"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on CPU (fast, deterministic); multi-device tests shard over the
8 virtual devices. Real-TPU behavior is covered by bench.py / __graft_entry__.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
