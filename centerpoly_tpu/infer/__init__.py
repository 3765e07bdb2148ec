from .detector import PolydetDetector, polydet_post_process

__all__ = ["PolydetDetector", "polydet_post_process"]
