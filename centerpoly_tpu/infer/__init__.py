from .detector import (
    BaseDetector, PolydetDetector, CtdetDetector, DETECTORS,
    create_detector, polydet_post_process, ctdet_post_process)

__all__ = [
    "BaseDetector",
    "PolydetDetector",
    "CtdetDetector",
    "DETECTORS",
    "create_detector",
    "polydet_post_process",
    "ctdet_post_process",
]
