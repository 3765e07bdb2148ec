"""Honest on-device timing for tunneled/async JAX backends.

On the axon TPU harness, `jax.block_until_ready` acknowledges DISPATCH,
not execution, and any dispatch+fetch round trip pays a ~40 ms network
RTT — so both "fenced" wall-clock loops and pipelined fence-once loops
measure the tunnel, not the chip (measured 2026-08-17: a 159-GFLOP
program "timed" at 0.26 ms that way, 3x the chip's peak FLOP/s).

The only reliable measure is to run the program k times INSIDE one
compiled program with a data dependence between iterations (so XLA can
neither elide nor overlap them), fetch one scalar, and difference two
values of k: RTT and dispatch overhead cancel in the slope.

    per_call_s = measure_device_time(scalar_fn, args)

where scalar_fn(eps, *args) -> f32 scalar mixes the carried scalar eps
into its computation (e.g. `x + eps`) and reduces its output to a
scalar (e.g. `jnp.sum(out)`); the mixing keeps the loop sequential.
"""
from __future__ import annotations

import time
from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

__all__ = ["measure_device_time", "scalarize"]


def scalarize(fn: Callable) -> Callable:
    """Wrap fn(*args)->pytree as scalar_fn(eps, *args)->f32 scalar.

    Mixes eps into the FIRST argument (must be a float array) and
    reduces the output pytree to one f32 scalar.
    """
    def scalar_fn(eps, first, *rest):
        out = fn(first + eps.astype(first.dtype), *rest)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
    return scalar_fn


def _scan_k(scalar_fn, k, args):
    def body(carry, _):
        s = scalar_fn(carry * jnp.float32(1e-30), *args)
        return s, None
    s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=k)
    return s


def measure_device_time(
    scalar_fn: Callable,
    args: Sequence,
    k_small: int = 1,
    k_big: int = 17,
    reps: int = 5,
) -> float:
    """Median on-device seconds per call of scalar_fn(eps, *args).

    Compiles two programs that run the computation k_small / k_big times
    sequentially (data-dependent carry), times each end-to-end including
    the scalar fetch, and returns the slope
    (t_big - t_small) / (k_big - k_small).
    """
    assert k_big > k_small
    times = {}
    for k in (k_small, k_big):
        prog = jax.jit(partial(_scan_k, scalar_fn, k))
        float(prog(args))  # compile + first run
        laps = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(prog(args))  # fetch forces real execution
            laps.append(time.perf_counter() - t0)
        laps.sort()
        times[k] = laps[len(laps) // 2]
    return (times[k_big] - times[k_small]) / (k_big - k_small)
