from .coco_poly import CocoPolyAnnotations
from .sampler import PolydetSampler
from .datasets import DATASETS, CityscapesMeta, KittiPolyMeta, IDDMeta
from .loader import Loader

__all__ = [
    "CocoPolyAnnotations",
    "PolydetSampler",
    "DATASETS",
    "CityscapesMeta",
    "KittiPolyMeta",
    "IDDMeta",
    "Loader",
]
