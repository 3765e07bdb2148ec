"""Build the *reference* torch models as parity oracles.

Imports the reference architecture definitions from /root/reference/src/lib
(read-only) with a pure-torch DCNv2 stub injected in place of the missing
CUDA extension, so a randomly-initialized reference model can serve as the
golden oracle for the torch->flax checkpoint importer
(centerpoly_tpu/train/torch_import.py).

The DCN stub reproduces the CUDA kernel's semantics (CharlesShang/DCNv2 as
consumed at reference pose_dla_dcn.py:347-359): offset/mask conv -> 18
interleaved (dy,dx) offsets + 9 sigmoid masks -> bilinear sampling with
zero padding -> modulated 3x3 contraction.
"""
from __future__ import annotations

import sys
import types

import torch
import torch.nn as nn

REF_LIB = "/root/reference/src/lib"


class DCNStub(nn.Module):
    """Pure-torch modulated deformable conv, matching DCNv2 semantics."""

    def __init__(self, chi, cho, kernel_size=(3, 3), stride=1, padding=1,
                 dilation=1, deformable_groups=1):
        super().__init__()
        assert tuple(kernel_size) == (3, 3) and stride == 1
        assert padding == 1 and dilation == 1 and deformable_groups == 1
        self.weight = nn.Parameter(torch.randn(cho, chi, 3, 3) * 0.02)
        self.bias = nn.Parameter(torch.zeros(cho))
        self.conv_offset_mask = nn.Conv2d(chi, 27, 3, padding=1)
        # real DCNv2 zero-inits offset conv; use small random so parity
        # actually exercises the deformed sampling path
        nn.init.normal_(self.conv_offset_mask.weight, std=0.01)
        nn.init.normal_(self.conv_offset_mask.bias, std=0.1)

    def forward(self, x):
        out = self.conv_offset_mask(x)
        o1, o2, mask = torch.chunk(out, 3, dim=1)
        offset = torch.cat((o1, o2), dim=1)  # (B,18,H,W): dy0,dx0,dy1,...
        mask = torch.sigmoid(mask)
        b, c, h, w = x.shape
        ys = torch.arange(h).view(1, h, 1, 1).float()
        xs = torch.arange(w).view(1, 1, w, 1).float()
        ky = torch.repeat_interleave(torch.arange(-1., 2.), 3).view(1, 1, 1, 9)
        kx = torch.arange(-1., 2.).repeat(3).view(1, 1, 1, 9)
        off = offset.permute(0, 2, 3, 1).reshape(b, h, w, 9, 2)
        sy = ys + ky + off[..., 0]
        sx = xs + kx + off[..., 1]
        xf = x.permute(0, 2, 3, 1).reshape(b, h * w, c)

        def samp(yi, xi):
            valid = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)).float()
            idx = (yi.clamp(0, h - 1) * w + xi.clamp(0, w - 1)).long()
            g = torch.gather(xf, 1, idx.reshape(b, -1, 1).expand(-1, -1, c))
            return g.reshape(b, h, w, 9, c) * valid.unsqueeze(-1)

        y0, x0 = sy.floor(), sx.floor()
        fy = (sy - y0).unsqueeze(-1)
        fx = (sx - x0).unsqueeze(-1)
        v = (samp(y0, x0) * (1 - fy) * (1 - fx)
             + samp(y0, x0 + 1) * (1 - fy) * fx
             + samp(y0 + 1, x0) * fy * (1 - fx)
             + samp(y0 + 1, x0 + 1) * fy * fx)
        v = v * mask.permute(0, 2, 3, 1).unsqueeze(-1)
        # taps row-major, cin minor: flat index k*c+i matches weight
        # (cho, chi, ky, kx) permuted to (ky,kx,chi,cho) -> (9*chi, cho)
        vt = v.reshape(b, h, w, 9 * c)
        wt = self.weight.permute(2, 3, 1, 0).reshape(9 * c, -1)
        return (vt @ wt + self.bias).permute(0, 3, 1, 2)


def _install_stubs():
    if REF_LIB not in sys.path:
        sys.path.insert(0, REF_LIB)
    if "models.networks.DCNv2.dcn_v2" not in sys.modules:
        pkg = types.ModuleType("models.networks.DCNv2")
        pkg.__path__ = []
        mod = types.ModuleType("models.networks.DCNv2.dcn_v2")
        mod.DCN = DCNStub
        sys.modules["models.networks.DCNv2"] = pkg
        sys.modules["models.networks.DCNv2.dcn_v2"] = mod


def build_ref_dla34(heads, head_conv=256, down_ratio=4):
    """Reference DLASeg('dla34') with pretrained=False (no network)."""
    _install_stubs()
    import models.networks.pose_dla_dcn as P
    net = P.DLASeg("dla34", heads, pretrained=False, down_ratio=down_ratio,
                   final_kernel=1, last_level=5, head_conv=head_conv)
    net.eval()
    return net


def build_ref_hourglass(heads, num_stacks=1):
    """Reference exkp small hourglass (large_hourglass.py:486-492)."""
    _install_stubs()
    import models.networks.large_hourglass as H
    net = H.HourglassNet(heads, num_stacks=num_stacks)
    net.eval()
    return net


def state_dict_numpy(net):
    return {k: v.detach().numpy() for k, v in net.state_dict().items()}


def build_ref_resnet(heads, num_layers=18, head_conv=64):
    """Reference msra_resnet PoseResNet (src/lib/models/networks/
    msra_resnet.py:275-280), no pretrained download."""
    _install_stubs()
    import models.networks.msra_resnet as R
    block, layers = R.resnet_spec[num_layers]
    net = R.PoseResNet(block, layers, heads, head_conv=head_conv)
    net.eval()
    return net


def build_ref_resdcn(heads, num_layers=18, head_conv=64):
    """Reference resnet_dcn PoseResNet (src/lib/models/networks/
    resnet_dcn.py) with the pure-torch DCN stub."""
    _install_stubs()
    import models.networks.resnet_dcn as R
    block, layers = R.resnet_spec[num_layers]
    net = R.PoseResNet(block, layers, heads, head_conv=head_conv)
    net.eval()
    return net
