from .coco_poly import CocoPolyAnnotations
from .sampler import PolydetSampler
from .ctdet_sampler import CtdetSampler
from .ddd_sampler import DddSampler
from .exdet_sampler import ExdetSampler
from .multi_pose_sampler import MultiPoseSampler
from .datasets import DATASETS, CityscapesMeta, KittiPolyMeta, IDDMeta
from .loader import Loader

SAMPLERS = {
    "polydet": PolydetSampler,
    "ctdet": CtdetSampler,
    "ddd": DddSampler,
    "exdet": ExdetSampler,
    "multi_pose": MultiPoseSampler,
}

__all__ = [
    "CocoPolyAnnotations",
    "PolydetSampler",
    "CtdetSampler",
    "DddSampler",
    "ExdetSampler",
    "MultiPoseSampler",
    "SAMPLERS",
    "DATASETS",
    "CityscapesMeta",
    "KittiPolyMeta",
    "IDDMeta",
    "Loader",
]
