"""Checkpoint-import parity: reference torch arch == imported flax model.

Builds the *reference* architecture definitions (pose_dla_dcn.DLASeg /
large_hourglass.HourglassNet) from /root/reference with a pure-torch DCNv2
stub, randomizes their weights, imports the state_dict through
train/torch_import.py, and asserts the flax model reproduces the reference
head outputs on a shared image (ref load semantics: model.py:31-130).

This is the proof that reference .pth checkpoints load correctly — AP
parity claims rest on it.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "helpers"))

HEADS = {"hm": 8, "poly": 32, "pseudo_depth": 1, "reg": 2}


def _randomize_torch(net, seed=0):
    """Give every param/buffer a non-degenerate random value so head
    outputs carry real signal through 30+ layers."""
    import torch

    g = torch.Generator().manual_seed(seed)
    sd = net.state_dict()
    for k, v in sd.items():
        if v.dtype not in (torch.float32, torch.float64):
            continue
        if k.endswith("running_var"):
            sd[k] = 0.5 + torch.rand(v.shape, generator=g)
        elif k.endswith("running_mean"):
            sd[k] = 0.05 * torch.randn(v.shape, generator=g)
        elif "bn" in k.split(".")[-2:][0] or v.ndim == 1:
            # BN scale / biases: keep near identity-ish
            if k.endswith("weight") and v.ndim == 1:
                sd[k] = 0.75 + 0.5 * torch.rand(v.shape, generator=g)
            else:
                sd[k] = 0.05 * torch.randn(v.shape, generator=g)
        else:
            fan_in = int(np.prod(v.shape[1:])) or 1
            sd[k] = torch.randn(v.shape, generator=g) * (1.2 / np.sqrt(fan_in))
    net.load_state_dict(sd)
    return net


def _import_and_compare(ref_net, arch, x_nchw, atol, create_kwargs=None):
    import torch
    import jax
    import jax.numpy as jnp
    from centerpoly_tpu.models import create_model
    from centerpoly_tpu.train.torch_import import import_state_dict
    from helpers.torch_ref import state_dict_numpy

    with torch.no_grad():
        ref_out = ref_net(torch.from_numpy(x_nchw))[-1]
    ref_out = {k: v.numpy() for k, v in ref_out.items()}

    model = create_model(arch, HEADS, 256, **(create_kwargs or {}))
    x_nhwc = jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))
    variables = model.init(jax.random.PRNGKey(0), x_nhwc, train=False)

    sd = state_dict_numpy(ref_net)
    variables, report = import_state_dict(sd, variables, arch)

    # Every torch param must map (only classifier fc / bookkeeping skipped).
    bad = [k for k in report["skipped"]
           if not k.startswith("base.fc.")
           and not k.endswith("num_batches_tracked")]
    assert not bad, f"unmapped torch keys: {bad[:10]} (+{len(bad)-10 if len(bad)>10 else 0})"

    # Every flax param must have been overwritten (coverage check).
    from centerpoly_tpu.train.checkpoint import flatten_params
    n_params = len(flatten_params(variables["params"]))
    n_stats = len(flatten_params(variables.get("batch_stats", {})))
    assert len(report["loaded"]) == n_params + n_stats, (
        f"loaded {len(report['loaded'])} of {n_params + n_stats} flax leaves")

    out = model.apply(variables, x_nhwc, train=False)[-1]
    for head, ref_v in ref_out.items():
        got = np.transpose(np.asarray(out[head]), (0, 3, 1, 2))
        scale = max(1.0, float(np.abs(ref_v).max()))
        diff = np.abs(got - ref_v).max() / scale
        assert diff < atol, f"head {head}: rel-max diff {diff:.5f} >= {atol}"


@pytest.mark.slow
def test_dla34_import_parity():
    from helpers.torch_ref import build_ref_dla34

    net = _randomize_torch(build_ref_dla34(HEADS), seed=1)
    x = np.random.RandomState(0).randn(1, 3, 64, 128).astype(np.float32)
    _import_and_compare(net, "dla_34", x, atol=2e-3)


@pytest.mark.slow
def test_hourglass_import_parity():
    from helpers.torch_ref import build_ref_hourglass

    # hourglass n=5 halves 5x after the /4 pre: short side must be >=128
    net = _randomize_torch(build_ref_hourglass(HEADS, num_stacks=1), seed=2)
    x = np.random.RandomState(1).randn(1, 3, 128, 256).astype(np.float32)
    _import_and_compare(net, "smallhourglass", x, atol=2e-3)


def test_resnet18_import_parity():
    from helpers.torch_ref import build_ref_resnet

    net = _randomize_torch(
        build_ref_resnet(HEADS, num_layers=18, head_conv=256), seed=3)
    x = np.random.RandomState(2).randn(1, 3, 64, 128).astype(np.float32)
    _import_and_compare(net, "res_18", x, atol=2e-3)


@pytest.mark.slow
def test_resdcn18_import_parity():
    from helpers.torch_ref import build_ref_resdcn

    net = _randomize_torch(
        build_ref_resdcn(HEADS, num_layers=18, head_conv=256), seed=4)
    x = np.random.RandomState(3).randn(1, 3, 64, 128).astype(np.float32)
    _import_and_compare(net, "resdcn_18", x, atol=2e-3)
