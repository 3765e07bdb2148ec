"""Dataset metadata adapters: class tables + annotation paths + eval entry.

Behavioral reference: src/lib/datasets/dataset/{cityscapes,kitti_poly,
IDD}.py — class names, label ids, per-class frequencies, annotation path
selection by nbr_points/split, and `run_eval` wiring to the instance-AP
harness (eval/ package).
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional


class DatasetMeta:
    name: str = "base"
    num_classes: int = 8
    default_resolution = (512, 1024)
    max_objs = 128
    class_name: List[str] = []
    label_to_id: Dict[str, int] = {}
    class_frequencies: Dict[str, float] = {}
    eval_image_size = (1024, 2048)  # (h, w) of source frames
    # classes excluded from eval mask writing (ref cityscapes.py:242)
    eval_drop_classes = ("pole", "traffic sign", "traffic light")

    def __init__(self, data_root: str = "", nbr_points: int = 16):
        self.data_root = data_root
        self.nbr_points = nbr_points
        self._valid_ids = list(range(1, self.num_classes + 1))
        self.cat_ids = {v: i for i, v in enumerate(self._valid_ids)}

    def annot_path(self, split: str) -> str:
        raise NotImplementedError

    def img_dir(self, split: str) -> Optional[str]:
        return None

    def run_eval(self, results, save_dir: str):
        """Write instance masks + run the official-protocol AP evaluator."""
        from ..eval.harness import run_instance_eval
        return run_instance_eval(self, results, save_dir)


class CityscapesMeta(DatasetMeta):
    """Reference: dataset/cityscapes.py:39-118."""
    name = "cityscapes"
    num_classes = 8
    default_resolution = (512, 1024)
    class_name = [
        "__background__", "person", "rider", "car", "truck", "bus", "train",
        "motorcycle", "bicycle", "pole", "traffic sign", "traffic light"]
    label_to_id = {"person": 24, "rider": 25, "car": 26, "truck": 27,
                   "bus": 28, "train": 31, "motorcycle": 32, "bicycle": 33,
                   "pole": -1, "traffic sign": -1, "traffic light": -1}
    class_frequencies = {
        "person": 0.14062428170827013, "rider": 0.015518384984665498,
        "car": 0.20898266905714155, "truck": 0.003822132907776267,
        "bus": 0.0031719762791339126, "train": 0.0012740443025920892,
        "motorcycle": 0.005831707941761728, "bicycle": 0.0322057384531526,
        "pole": 0.34640870553158515, "traffic sign": 0.16402335310072175,
        "traffic light": 0.07813700573319936}
    eval_image_size = (1024, 2048)

    def annot_path(self, split: str) -> str:
        base = os.path.join(self.data_root, "cityscapesStuff", "BBoxes")
        if split == "test":
            return os.path.join(base, "test.json")
        return os.path.join(
            base, f"{split}{self.nbr_points}_regular_interval.json")

    def img_dir(self, split: str):
        # real Cityscapes layout; annotation file_names are usually absolute
        # (CSV-generated) so this is only the relative-path fallback
        d = os.path.join(self.data_root, "leftImg8bit", split)
        return d if os.path.isdir(d) else None


class KittiPolyMeta(DatasetMeta):
    """Reference: dataset/kitti_poly.py."""
    name = "kitti_poly"
    num_classes = 8
    default_resolution = (384, 1280)
    class_name = CityscapesMeta.class_name
    label_to_id = CityscapesMeta.label_to_id
    class_frequencies = CityscapesMeta.class_frequencies
    eval_image_size = (375, 1242)

    def annot_path(self, split: str) -> str:
        base = os.path.join(self.data_root, "KITTIPolyStuff", "BBoxes")
        if split == "test":
            return os.path.join(base, "test.json")
        return os.path.join(
            base, f"{split}{self.nbr_points}_regular_interval.json")


class IDDMeta(DatasetMeta):
    """Reference: dataset/IDD.py."""
    name = "IDD"
    num_classes = 8
    default_resolution = (512, 1024)
    class_name = [
        "__background__", "person", "rider", "car", "truck", "bus",
        "motorcycle", "bicycle", "autorickshaw", "pole", "traffic sign",
        "traffic light"]
    label_to_id = {"person": 24, "rider": 25, "car": 26, "truck": 27,
                   "bus": 28, "motorcycle": 32, "bicycle": 33,
                   "autorickshaw": 40, "pole": -1, "traffic sign": -1,
                   "traffic light": -1}
    class_frequencies = CityscapesMeta.class_frequencies
    eval_image_size = (1080, 1920)

    def annot_path(self, split: str) -> str:
        base = os.path.join(self.data_root, "IDDStuff", "BBoxes")
        if split == "test":
            return os.path.join(base, "test.json")
        return os.path.join(
            base, f"{split}{self.nbr_points}_regular_interval.json")


DATASETS = {
    "cityscapes": CityscapesMeta,
    "kitti_poly": KittiPolyMeta,
    # accept both spellings — the reference scripts pass `--dataset idd`
    # while its factory key is `IDD` (SURVEY.md §5 known defect, fixed here)
    "IDD": IDDMeta,
    "idd": IDDMeta,
}
