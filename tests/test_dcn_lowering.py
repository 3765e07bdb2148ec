"""Lowering-level regression guards for the DCN formulations.

The TPU gather unit is chunk-rate-bound (~250M chunks/s measured), so
the formulations' entire value proposition is their DESCRIPTOR COUNT.
These tests read the StableHLO and count `call @_take*` sites times
their index-tensor sizes — a silent extra gather (e.g. a fancy-indexed
lookup table) would triple the chunk count without failing any
numerics test.  jnp.take lowers through an outlined @_take function,
so op-counting must happen at call sites, not gather ops.
"""
import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from centerpoly_tpu.models.deform_conv import (
    deform_conv2d, deform_conv2d_quad, deform_conv2d_quad_tapwise,
    deform_conv2d_tapwise)


def _chunks(fn, grad=False, b=1, h=32, w=32, c=8, co=8):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, h, w, c), jnp.bfloat16)
    off = jnp.asarray(rng.randn(b, h, w, 18) * 2, jnp.float32)
    mk = jnp.asarray(rng.rand(b, h, w, 9), jnp.float32)
    wt = jnp.asarray(rng.randn(3, 3, c, co), jnp.bfloat16)
    bs = jnp.asarray(rng.randn(co), jnp.bfloat16)
    f = fn
    if grad:
        f = jax.grad(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)),
                     argnums=(0, 1, 2, 3))
    txt = jax.jit(f).lower(x, off, mk, wt, bs).as_text()
    calls = re.findall(r'call @(_take\w*)\(.*?tensor<([0-9x]+)xi32>\)',
                       txt)
    total = sum(int(np.prod([int(d) for d in shape.split("x")]))
                for _, shape in calls)
    return len(calls), total, b * h * w


def test_fused_is_four_chunks_per_sample():
    n_calls, chunks, px = _chunks(deform_conv2d)
    assert n_calls == 4
    assert chunks == 4 * px * 9


def test_tapwise_same_chunks_smaller_temps():
    n_calls, chunks, px = _chunks(deform_conv2d_tapwise)
    assert n_calls == 36           # 9 taps x 4 corners
    assert chunks == 4 * px * 9


def test_quad_is_one_chunk_per_sample():
    """The whole point: ONE take, B*H*W*9 chunks, nothing else — the
    view tables must be arithmetic selects, never gathers."""
    n_calls, chunks, px = _chunks(deform_conv2d_quad)
    assert n_calls == 1, f"extra gathers crept into quad ({n_calls})"
    assert chunks == px * 9


def test_quad_tapwise_grad_keeps_chunk_count():
    n_calls, chunks, px = _chunks(deform_conv2d_quad_tapwise, grad=True)
    assert n_calls == 9            # one take per checkpointed tap
    assert chunks == px * 9


def test_duo_is_two_chunks_per_sample():
    """The chunk-size-ladder midpoint: TWO takes (one per bilinear row),
    B*H*W*9 chunks each — view tables must stay arithmetic selects."""
    from centerpoly_tpu.models.deform_conv import deform_conv2d_duo
    n_calls, chunks, px = _chunks(deform_conv2d_duo)
    assert n_calls == 2, f"extra gathers crept into duo ({n_calls})"
    assert chunks == 2 * px * 9


def test_duo_tapwise_grad_keeps_chunk_count():
    from centerpoly_tpu.models.deform_conv import deform_conv2d_duo_tapwise
    n_calls, chunks, px = _chunks(deform_conv2d_duo_tapwise, grad=True)
    assert n_calls == 18           # two takes per checkpointed tap
    assert chunks == 2 * px * 9
