"""Concrete torch->flax name maps for importing reference checkpoints.

The reference saves plain torch state_dicts (src/lib/models/model.py:133-142).
This module knows how the reference architectures name their parameters
(src/lib/models/networks/pose_dla_dcn.py, large_hourglass.py) and how those
names correspond to the flax module trees in centerpoly_tpu.models, so a
reference ``.pth`` can be loaded into our models for AP-parity validation
(`load_reference_checkpoint`).

Conventions recap (see checkpoint.import_torch_state_dict):
  kind 'conv'      OIHW -> HWIO transpose
  kind 'deconv_dw' grouped ConvTranspose2d (C,1,k,k) -> flipped (k,k,1,C)
  kind 'bn_*'      BatchNorm pieces (scale/bias -> params, mean/var -> stats)
  kind 'raw'       copied as-is (conv biases, DCN biases)
"""
from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import jax
import numpy as np

MapResult = Optional[Tuple[str, str]]

_BN_SUFFIX = {
    "weight": ("scale", "bn_scale"),
    "bias": ("bias", "bn_bias"),
    "running_mean": ("mean", "bn_mean"),
    "running_var": ("var", "bn_var"),
}


def _bn(prefix: str, suffix: str) -> MapResult:
    if suffix == "num_batches_tracked":
        return None
    leaf, kind = _BN_SUFFIX[suffix]
    return f"{prefix}/{leaf}", kind


def _residual_leaf(prefix: str, rest: str) -> MapResult:
    """Translate a torch BasicBlock/residual param path.

    torch: conv1/bn1/conv2/bn2 (+ skip.0/skip.1 in the hourglass residual,
    large_hourglass.py:55-84) -> flax Residual's ConvBN_0/ConvBN_1(/ConvBN_2).
    """
    m = re.match(r"conv([12])\.weight$", rest)
    if m:
        return f"{prefix}/ConvBN_{int(m.group(1)) - 1}/Conv_0/kernel", "conv"
    m = re.match(r"bn([12])\.(\w+)$", rest)
    if m:
        return _bn(f"{prefix}/ConvBN_{int(m.group(1)) - 1}/BatchNorm_0",
                   m.group(2))
    m = re.match(r"skip\.0\.weight$", rest)
    if m:
        return f"{prefix}/ConvBN_2/Conv_0/kernel", "conv"
    m = re.match(r"skip\.1\.(\w+)$", rest)
    if m:
        return _bn(f"{prefix}/ConvBN_2/BatchNorm_0", m.group(1))
    return None


def _convolution_leaf(prefix: str, rest: str) -> MapResult:
    """torch `convolution` block (conv/bn, large_hourglass.py:24-36)."""
    if rest == "conv.weight":
        return f"{prefix}/Conv_0/kernel", "conv"
    if rest == "conv.bias":
        return f"{prefix}/Conv_0/bias", "raw"
    m = re.match(r"bn\.(\w+)$", rest)
    if m:
        return _bn(f"{prefix}/BatchNorm_0", m.group(1))
    return None


def _dcn_leaf(prefix: str, rest: str) -> MapResult:
    """torch DeformConv (pose_dla_dcn.py:347-359): conv=DCN, actf=BN+ReLU."""
    if rest == "conv.weight":
        return f"{prefix}/DCNv2_0/kernel", "conv"
    if rest == "conv.bias":
        return f"{prefix}/DCNv2_0/bias", "raw"
    if rest == "conv.conv_offset_mask.weight":
        return f"{prefix}/DCNv2_0/conv_offset_mask/kernel", "conv"
    if rest == "conv.conv_offset_mask.bias":
        return f"{prefix}/DCNv2_0/conv_offset_mask/bias", "raw"
    m = re.match(r"actf\.0\.(\w+)$", rest)
    if m:
        return _bn(f"{prefix}/BatchNorm_0", m.group(1))
    return None


def _tree_path(rest: str, prefix: str) -> MapResult:
    """Translate a DLA Tree path (pose_dla_dcn.py:168-222).

    tree1/tree2 recurse; leaves are BasicBlocks (conv1/bn1/conv2/bn2),
    root (conv/bn) and project (Sequential conv,bn).
    """
    parts = rest.split(".")
    flax = [prefix]
    i = 0
    while i < len(parts):
        p = parts[i]
        if p in ("tree1", "tree2"):
            # BasicBlock leaf iff what follows is conv1/bn1/conv2/bn2
            if i + 1 < len(parts) and re.match(r"(conv|bn)[12]$",
                                               parts[i + 1]):
                return _residual_leaf("/".join(flax) + f"/{p}",
                                      ".".join(parts[i + 1:]))
            flax.append(p)
            i += 1
            continue
        if p == "root":
            rest2 = ".".join(parts[i + 1:])
            if rest2 == "conv.weight":
                return "/".join(flax) + "/root/Conv_0/kernel", "conv"
            m = re.match(r"bn\.(\w+)$", rest2)
            if m:
                return _bn("/".join(flax) + "/root/BatchNorm_0", m.group(1))
            return None
        if p == "project":
            rest2 = ".".join(parts[i + 1:])
            if rest2 == "0.weight":
                return "/".join(flax) + "/project/Conv_0/kernel", "conv"
            m = re.match(r"1\.(\w+)$", rest2)
            if m:
                return _bn("/".join(flax) + "/project/BatchNorm_0",
                           m.group(1))
            return None
        return None
    return None


def dla_name_map(tk: str) -> MapResult:
    """torch key (DLASeg, pose_dla_dcn.py:427-482) -> (flax key, kind)."""
    # base trunk -------------------------------------------------------
    m = re.match(r"base\.base_layer\.0\.weight$", tk)
    if m:
        return "base/base_layer/Conv_0/kernel", "conv"
    m = re.match(r"base\.base_layer\.1\.(\w+)$", tk)
    if m:
        return _bn("base/base_layer/BatchNorm_0", m.group(1))
    m = re.match(r"base\.level([01])\.(\d+)\.(\w+)$", tk)
    if m:
        lvl, idx, suffix = m.group(1), int(m.group(2)), m.group(3)
        conv_i, kind_i = divmod(idx, 3)  # Sequential: conv, bn, relu
        prefix = f"base/level{lvl}_{conv_i}"
        if kind_i == 0 and suffix == "weight":
            return f"{prefix}/Conv_0/kernel", "conv"
        if kind_i == 1:
            return _bn(f"{prefix}/BatchNorm_0", suffix)
        return None
    m = re.match(r"base\.level([2-5])\.(.*)$", tk)
    if m:
        return _tree_path(m.group(2), f"base/level{m.group(1)}")
    if tk.startswith("base.fc."):
        return None  # imagenet classifier head, not used
    # dla_up / ida_up --------------------------------------------------
    m = re.match(r"dla_up\.ida_(\d+)\.(proj|node)_(\d+)\.(.*)$", tk)
    if m:
        return _dcn_leaf(f"dla_up_ida_{m.group(1)}/{m.group(2)}_{m.group(3)}",
                         m.group(4))
    m = re.match(r"dla_up\.ida_(\d+)\.up_(\d+)\.weight$", tk)
    if m:
        return f"dla_up_ida_{m.group(1)}/up_{m.group(2)}/kernel", "deconv_dw"
    m = re.match(r"ida_up\.(proj|node)_(\d+)\.(.*)$", tk)
    if m:
        return _dcn_leaf(f"ida_up/{m.group(1)}_{m.group(2)}", m.group(3))
    m = re.match(r"ida_up\.up_(\d+)\.weight$", tk)
    if m:
        return f"ida_up/up_{m.group(1)}/kernel", "deconv_dw"
    # heads (Sequential conv3x3 -> relu -> conv1x1, :446-462) ----------
    m = re.match(r"(\w+)\.0\.(weight|bias)$", tk)
    if m:
        kind = "conv" if m.group(2) == "weight" else "raw"
        return f"heads/{m.group(1)}_conv/{'kernel' if kind == 'conv' else 'bias'}", kind
    m = re.match(r"(\w+)\.2\.(weight|bias)$", tk)
    if m:
        kind = "conv" if m.group(2) == "weight" else "raw"
        return f"heads/{m.group(1)}_out/{'kernel' if kind == 'conv' else 'bias'}", kind
    return None


def _kp_path(rest: str, prefix: str) -> MapResult:
    """Translate a kp_module path (large_hourglass.py:283-342).

    up1/low1/low3 are Sequentials of residuals; low2 is either the nested
    kp_module (-> our 'inner') or a Sequential of residuals at the deepest
    level.
    """
    parts = rest.split(".")
    flax = [prefix]
    i = 0
    while i < len(parts):
        p = parts[i]
        if p in ("up1", "low1", "low3") or (
                p == "low2" and i + 1 < len(parts) and
                parts[i + 1].isdigit()):
            idx = parts[i + 1]
            return _residual_leaf("/".join(flax) + f"/{p}_{idx}",
                                  ".".join(parts[i + 2:]))
        if p == "low2":
            flax.append("inner")
            i += 1
            continue
        return None
    return None


def hourglass_name_map(tk: str) -> MapResult:
    """torch key (exkp, large_hourglass.py:345-462) -> (flax key, kind)."""
    # pre: convolution + residual --------------------------------------
    m = re.match(r"pre\.0\.(.*)$", tk)
    if m:
        return _convolution_leaf("pre_conv", m.group(1))
    m = re.match(r"pre\.1\.(.*)$", tk)
    if m:
        return _residual_leaf("pre_res", m.group(1))
    # hourglass stacks ---------------------------------------------------
    m = re.match(r"kps\.(\d+)\.(.*)$", tk)
    if m:
        return _kp_path(m.group(2), f"kp_{m.group(1)}")
    m = re.match(r"cnvs\.(\d+)\.(.*)$", tk)
    if m:
        return _convolution_leaf(f"cnv_{m.group(1)}", m.group(2))
    # inter-stack glue ---------------------------------------------------
    m = re.match(r"inters\.(\d+)\.(.*)$", tk)
    if m:
        return _residual_leaf(f"inter_{m.group(1)}", m.group(2))
    m = re.match(r"(inters_|cnvs_)\.(\d+)\.0\.weight$", tk)
    if m:
        base = "inter_" if m.group(1) == "inters_" else "cnv_"
        return f"{base}_{m.group(2)}/Conv_0/kernel", "conv"
    m = re.match(r"(inters_|cnvs_)\.(\d+)\.1\.(\w+)$", tk)
    if m:
        base = "inter_" if m.group(1) == "inters_" else "cnv_"
        return _bn(f"{base}_{m.group(2)}/BatchNorm_0", m.group(3))
    # heads: ModuleList per stack of Sequential(convolution(no bn), 1x1)
    m = re.match(r"(\w+)\.(\d+)\.0\.conv\.(weight|bias)$", tk)
    if m:
        head, s, suffix = m.group(1), m.group(2), m.group(3)
        kind = "conv" if suffix == "weight" else "raw"
        leaf = "kernel" if suffix == "weight" else "bias"
        return f"heads_{s}/{head}_conv/{leaf}", kind
    m = re.match(r"(\w+)\.(\d+)\.1\.(weight|bias)$", tk)
    if m:
        head, s, suffix = m.group(1), m.group(2), m.group(3)
        kind = "conv" if suffix == "weight" else "raw"
        leaf = "kernel" if suffix == "weight" else "bias"
        return f"heads_{s}/{head}_out/{leaf}", kind
    return None


def _resnet_block_leaf(prefix: str, rest: str) -> MapResult:
    """torch BasicBlock/Bottleneck path inside a resnet layer."""
    m = re.match(r"conv([123])\.weight$", rest)
    if m:
        return (f"{prefix}/ConvBN_{int(m.group(1)) - 1}/Conv_0/kernel",
                "conv")
    m = re.match(r"bn([123])\.(\w+)$", rest)
    if m:
        return _bn(f"{prefix}/ConvBN_{int(m.group(1)) - 1}/BatchNorm_0",
                   m.group(2))
    if rest == "downsample.0.weight":
        return f"{prefix}/downsample/Conv_0/kernel", "conv"
    m = re.match(r"downsample\.1\.(\w+)$", rest)
    if m:
        return _bn(f"{prefix}/downsample/BatchNorm_0", m.group(1))
    return None


def _resnet_name_map(tk: str, use_dcn: bool) -> MapResult:
    """torch key (PoseResNet, msra_resnet.py:107-280 / resnet_dcn.py) ->
    (flax key, kind) for models.resnet.ResNetDet."""
    if tk == "conv1.weight":
        return "stem/Conv_0/kernel", "conv"
    m = re.match(r"bn1\.(\w+)$", tk)
    if m:
        return _bn("stem/BatchNorm_0", m.group(1))
    m = re.match(r"layer(\d)\.(\d+)\.(.*)$", tk)
    if m:
        return _resnet_block_leaf(f"layer{m.group(1)}_{m.group(2)}",
                                  m.group(3))
    m = re.match(r"deconv_layers\.(\d+)\.(.*)$", tk)
    if m:
        idx, rest = int(m.group(1)), m.group(2)
        if use_dcn:
            # resnet_dcn: 6 modules per stage
            # [DCN, BN, ReLU, ConvTranspose, BN, ReLU] (resnet_dcn.py:216-243)
            stage, pos = divmod(idx, 6)
            if pos == 0:
                if rest == "weight":
                    return f"dcn_{stage}/kernel", "conv"
                if rest == "bias":
                    return f"dcn_{stage}/bias", "raw"
                if rest == "conv_offset_mask.weight":
                    return f"dcn_{stage}/conv_offset_mask/kernel", "conv"
                if rest == "conv_offset_mask.bias":
                    return f"dcn_{stage}/conv_offset_mask/bias", "raw"
                return None
            if pos == 1:
                return _bn(f"dcn_bn_{stage}", rest)
            if pos == 3 and rest == "weight":
                return (f"deconv_{stage}/ConvTranspose_0/kernel", "deconv")
            if pos == 4:
                return _bn(f"deconv_{stage}/BatchNorm_0", rest)
            return None
        # msra_resnet: 3 modules per stage [ConvTranspose, BN, ReLU]
        stage, pos = divmod(idx, 3)
        if pos == 0 and rest == "weight":
            return f"deconv_{stage}/ConvTranspose_0/kernel", "deconv"
        if pos == 1:
            return _bn(f"deconv_{stage}/BatchNorm_0", rest)
        return None
    # heads: Sequential(conv3x3, relu, conv1x1) per head (:135-150)
    m = re.match(r"(\w+)\.0\.(weight|bias)$", tk)
    if m:
        kind = "conv" if m.group(2) == "weight" else "raw"
        leaf = "kernel" if kind == "conv" else "bias"
        return f"heads/{m.group(1)}_conv/{leaf}", kind
    m = re.match(r"(\w+)\.2\.(weight|bias)$", tk)
    if m:
        kind = "conv" if m.group(2) == "weight" else "raw"
        leaf = "kernel" if kind == "conv" else "bias"
        return f"heads/{m.group(1)}_out/{leaf}", kind
    return None


def resnet_name_map(tk: str) -> MapResult:
    return _resnet_name_map(tk, use_dcn=False)


def resdcn_name_map(tk: str) -> MapResult:
    return _resnet_name_map(tk, use_dcn=True)


NAME_MAPS = {
    "dla_34": dla_name_map,
    "dlav0_34": dla_name_map,
    "hourglass": hourglass_name_map,
    "smallhourglass": hourglass_name_map,
    "res_18": resnet_name_map,
    "res_101": resnet_name_map,
    "resdcn_18": resdcn_name_map,
    "resdcn_101": resdcn_name_map,
}


def name_map_for_arch(arch: str):
    key = arch
    if key not in NAME_MAPS:
        key = re.sub(r"_\d+$", "", arch)
        key = {"dla": "dla_34", "dlav0": "dla_34"}.get(key, key)
    fn = NAME_MAPS.get(key)
    if fn is None:
        raise ValueError(f"no torch name map for arch '{arch}' "
                         f"(have: {sorted(NAME_MAPS)})")
    return fn


def load_reference_checkpoint(path: str, variables, arch: str,
                              strict: bool = False):
    """Load a reference .pth into a flax `variables` dict for `arch`.

    Returns (variables, report). Tolerant partial load, matching the
    reference's load_model semantics (src/lib/models/model.py:31-130).
    """
    from .checkpoint import load_torch_pth, import_torch_state_dict

    sd = load_torch_pth(path)
    return import_state_dict(sd, variables, arch, strict=strict)


def import_state_dict(sd: Dict[str, np.ndarray], variables, arch: str,
                      strict: bool = False):
    """Merge an already-loaded torch state_dict into flax `variables`."""
    from .checkpoint import import_torch_state_dict

    variables = dict(variables)
    params, batch_stats, report = import_torch_state_dict(
        sd, jax.device_get(variables["params"]),
        jax.device_get(variables.get("batch_stats", {})),
        name_map_for_arch(arch), strict=strict)
    variables["params"] = params
    if batch_stats:
        variables["batch_stats"] = batch_stats
    return variables, report
