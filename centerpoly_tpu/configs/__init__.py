from .config import Config, DATASET_INFO, task_heads

__all__ = ["Config", "DATASET_INFO", "task_heads"]
