from .gather import gather_feat, gather_feat_nhwc
from .decode import polydet_decode, ctdet_decode, pseudo_nms, topk_heatmap
from .nms import soft_nms, soft_nms_batch

__all__ = [
    "gather_feat",
    "gather_feat_nhwc",
    "polydet_decode",
    "ctdet_decode",
    "pseudo_nms",
    "topk_heatmap",
    "soft_nms",
    "soft_nms_batch",
]
