"""Cross-model weight surgery: per-head transplants and layer freezing.

Behavioral reference: src/lib/models/model.py:66-125 — the EXT_HM / EXT_D /
EXT_Poly blocks copy every parameter whose name contains a head substring
from another checkpoint, and FREEZE_LAYERS stops gradients for loaded
non-head parameters.  There they are hard-coded booleans; here they are
proper functions usable from configs/scripts.
"""
from __future__ import annotations

from typing import Callable, Dict, Iterable

import jax
import numpy as np
import optax

from .checkpoint import flatten_params, unflatten_params


def transplant_heads(params, donor_params, substrings: Iterable[str],
                     verbose: bool = False):
    """Copy every donor parameter whose path contains any substring
    (e.g. 'hm', 'pseudo_depth', 'poly'), shapes permitting."""
    flat = flatten_params(jax.device_get(params))
    donor = flatten_params(jax.device_get(donor_params))
    subs = tuple(substrings)
    n = 0
    for k, v in donor.items():
        if any(s in k for s in subs) and k in flat \
                and flat[k].shape == np.asarray(v).shape:
            flat[k] = np.asarray(v)
            n += 1
            if verbose:
                print(f"transplant: {k}")
    if verbose:
        print(f"transplanted {n} tensors for {subs}")
    return unflatten_params(flat)


def freeze_mask(params, trainable_substrings: Iterable[str]) -> dict:
    """Boolean pytree: True = trainable. Parameters whose path contains a
    trainable substring stay trainable, everything else freezes
    (ref FREEZE_LAYERS keeps only 'poly'/'hm' trainable)."""
    subs = tuple(trainable_substrings)
    flat = flatten_params(jax.device_get(params))
    mask = {k: any(s in k for s in subs) for k in flat}
    return unflatten_params(mask)


def freeze_transform(mask) -> optax.GradientTransformation:
    """optax transform zeroing gradients of frozen parameters — the
    functional equivalent of requires_grad=False."""
    def zero_frozen(updates):
        return jax.tree_util.tree_map(
            lambda u, t: u if t else jax.numpy.zeros_like(u),
            updates, mask)

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        return zero_frozen(updates), state

    return optax.GradientTransformation(init_fn, update_fn)
