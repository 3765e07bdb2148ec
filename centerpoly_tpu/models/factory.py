"""Arch-string model factory (reference: src/lib/models/model.py:10-28).

Arch strings match the reference CLI surface:
  dla_34 | dlav0_34 | hourglass | smallhourglass | res_18 | res_101 |
  resdcn_18 | resdcn_101
"""
from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import flax.linen as nn

from .dla import DLASeg
from .hourglass import HourglassNet
from .resnet import ResNetDet


def _dla(num_layers: int, heads, head_conv: int, dtype) -> nn.Module:
    assert num_layers == 34, "only DLA-34 is defined (as in the reference)"
    return DLASeg(heads=heads, head_conv=head_conv, dtype=dtype)


def _dlav0(num_layers: int, heads, head_conv: int, dtype) -> nn.Module:
    assert num_layers == 34
    return DLASeg(heads=heads, head_conv=head_conv, plain_upsample=True,
                  dtype=dtype)


def _hourglass(num_layers: int, heads, head_conv: int, dtype) -> nn.Module:
    return HourglassNet(heads=heads, num_stacks=2, dtype=dtype)


def _smallhourglass(num_layers: int, heads, head_conv: int, dtype) -> nn.Module:
    return HourglassNet(heads=heads, num_stacks=1, dtype=dtype)


def _res(num_layers: int, heads, head_conv: int, dtype) -> nn.Module:
    return ResNetDet(heads=heads, num_layers=num_layers,
                     head_conv=head_conv, dtype=dtype)


def _resdcn(num_layers: int, heads, head_conv: int, dtype) -> nn.Module:
    return ResNetDet(heads=heads, num_layers=num_layers,
                     head_conv=head_conv, use_dcn=True, dtype=dtype)


MODEL_REGISTRY = {
    "dla": _dla,
    "dlav0": _dlav0,
    "hourglass": _hourglass,
    "smallhourglass": _smallhourglass,
    "res": _res,
    "resdcn": _resdcn,
}


def create_model(arch: str, heads: Dict[str, int], head_conv: int,
                 dtype: Any = jnp.float32) -> nn.Module:
    """arch like 'dla_34' or 'smallhourglass' -> Flax module.

    The module's __call__(x, train) returns a list of per-stack head dicts
    (NHWC maps), mirroring the reference model contract.
    """
    num_layers = int(arch[arch.find("_") + 1:]) if "_" in arch else 0
    name = arch[: arch.find("_")] if "_" in arch else arch
    if name not in MODEL_REGISTRY:
        raise KeyError(f"unknown arch '{arch}'")
    return MODEL_REGISTRY[name](num_layers, heads, head_conv, dtype)
