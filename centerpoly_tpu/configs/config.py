"""Typed experiment configuration.

Replaces the reference's argparse `opts` class (reference:
src/lib/opts.py:9-459) with a dataclass carrying the same semantic surface:
task / dataset / arch / rep axes, loss weights, augmentation and test-time
options, plus the derived head table.  Known reference defects are fixed,
not replicated (SURVEY.md §5): the undefined `r_variation` attribute, the
duplicate `reg` head update, and the `--polar_order` script typo.
"""
from __future__ import annotations

import dataclasses
import json
from typing import Dict, Optional, Tuple


DATASET_INFO = {
    # dataset -> (default_resolution (h, w), num_classes, mean, std)
    "cityscapes": (
        (512, 1024), 8,
        (0.28405, 0.322669, 0.28169),
        (0.042303, 0.040882, 0.042699),
    ),
    # kitti_poly uses imagenet-style stats and the 512x1024 resolution
    # (ref dataset/kitti_poly.py:16-20 — NOT the cityscapes stats, and
    # [384,1280] is the reference's commented-out value)
    "kitti_poly": (
        (512, 1024), 8,
        (0.485, 0.456, 0.406),
        (0.229, 0.224, 0.225),
    ),
    "IDD": (
        (512, 1024), 9,
        (0.28405, 0.322669, 0.28169),
        (0.042303, 0.040882, 0.042699),
    ),
    "idd": (
        (512, 1024), 9,
        (0.28405, 0.322669, 0.28169),
        (0.042303, 0.040882, 0.042699),
    ),
    "coco": ((512, 512), 80, (0.408, 0.447, 0.470), (0.289, 0.274, 0.278)),
    "pascal": ((384, 384), 20, (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
    "kitti": ((384, 1280), 3, (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
    "uadetrac": ((512, 512), 4, (0.408, 0.447, 0.470), (0.289, 0.274, 0.278)),
    "uadetrac1on10": ((512, 512), 4, (0.408, 0.447, 0.470),
                      (0.289, 0.274, 0.278)),
    "uadetrac1on10_b": ((512, 512), 4, (0.408, 0.447, 0.470),
                        (0.289, 0.274, 0.278)),
    "uav": ((512, 512), 4, (0.408, 0.447, 0.470), (0.289, 0.274, 0.278)),
    "coco_hp": ((512, 512), 1, (0.408, 0.447, 0.470), (0.289, 0.274, 0.278)),
}


def task_heads(task: str, num_classes: int, nbr_points: int = 16,
               reg_offset: bool = True, cat_spec_poly: bool = False,
               cat_spec_wh: bool = False, agnostic_ex: bool = False,
               reg_bbox: bool = True, hm_hp: bool = True,
               reg_hp_offset: bool = True) -> Dict[str, int]:
    """Head table per task (ref opts.py:332-425)."""
    if task == "polydet":
        heads = {
            "hm": num_classes,
            "poly": nbr_points * 2 * (num_classes if cat_spec_poly else 1),
            "pseudo_depth": 1,
        }
    elif task == "ctdet":
        heads = {"hm": num_classes,
                 "wh": 2 * (num_classes if cat_spec_wh else 1)}
    elif task == "ddd":
        heads = {"hm": num_classes, "dep": 1, "rot": 8, "dim": 3}
        if reg_bbox:  # ref opts.py:358-360
            heads["wh"] = 2
    elif task == "exdet":
        # agnostic_ex merges the extreme heatmaps to 1 channel — the
        # sampler emits 1-channel GT then (ref opts.py:349-352)
        hc = 1 if agnostic_ex else num_classes
        heads = {"hm_t": hc, "hm_l": hc, "hm_b": hc, "hm_r": hc,
                 "hm_c": num_classes}
        if reg_offset:
            heads.update({"reg_t": 2, "reg_l": 2, "reg_b": 2, "reg_r": 2})
        return heads
    elif task == "multi_pose":
        heads = {"hm": num_classes, "wh": 2, "hps": 34}
        # independent gates, not nested (ref opts.py:418-421)
        if hm_hp:
            heads["hm_hp"] = 17
        if reg_hp_offset:
            heads["hp_offset"] = 2
    else:
        raise ValueError(f"unknown task '{task}'")
    if reg_offset:
        heads["reg"] = 2
    return heads


# env vars written by a Config (as opposed to exported by the user),
# mapped to the user's pre-existing value (None if unset): a later
# Config reverting to defaults RESTORES that value rather than popping,
# so a user export survives an intervening non-auto Config
_CONFIG_OWNED_ENV: dict = {}

# What the inference-only entrypoints default dcn_kernel to on DCN
# archs (Config.prefer_fast_inference_dcn).  R chosen from measured
# learned-offset stats: the fixture-trained DLA-34's worst node has
# y_max 5.13 px (15 of 16 nodes < 3), so the R=6 band is a no-op on
# trained weights while the kernel still beats the exact XLA path
# (RESULTS.md round-5 "Queue5 part 2" + R-cost table).
INFERENCE_DCN_KERNEL_DEFAULT = "rowband:6"


def _apply_owned_env(var: str, value: str, default: str = "auto") -> None:
    """Write `var=value` with config-ownership bookkeeping.

    A non-default value snapshots the user's pre-existing env (once)
    and overwrites it; reverting to the default restores the snapshot
    rather than popping, so a user export survives an intervening
    non-default Config.
    """
    import os
    if value != default:
        if var not in _CONFIG_OWNED_ENV:
            _CONFIG_OWNED_ENV[var] = os.environ.get(var)
        os.environ[var] = value
    elif var in _CONFIG_OWNED_ENV:
        prior = _CONFIG_OWNED_ENV.pop(var)
        if prior is None:
            os.environ.pop(var, None)
        else:
            os.environ[var] = prior


@dataclasses.dataclass
class Config:
    """One experiment. Field names/defaults track reference opts.py."""
    # experiment
    task: str = "polydet"
    dataset: str = "cityscapes"
    exp_id: str = "default"
    arch: str = "dla_34"
    load_model: str = ""
    resume: bool = False
    seed: int = 317
    data_dir: str = "data"
    save_dir: str = "exp"

    # model
    train_dtype: str = "float32"   # float32 | bfloat16 — activation dtype for
                                   # training (params/optimizer stay f32; the
                                   # loss upcasts head maps to f32)
    dcn_form: str = "auto"         # auto | fused | tapwise | quad |
                                   # quad_tapwise — DCNv2 sampling
                                   # formulation (identical math; see
                                   # models/deform_conv.py)
    dcn_kernel: str = "auto"       # auto | off | on | rowband[:R] |
                                   # halo[:R] — Pallas DCN kernel mode
                                   # (CENTERPOLY_PALLAS_DCN; rowband
                                   # bands y-offsets to ±R with exact
                                   # x — measured AP50 delta +0.0000 on
                                   # trained weights, RESULTS.md
                                   # "Queue5 part 2")
    eval_batch: int = 1            # frames per compiled program in batch
    infer_devices: int = 0         # >1: shard run_batch over a 'data'
                                   # mesh of this many devices
                                   # inference surfaces (run_on_csv);
                                   # >1 uses detector.run_batch
    head_conv: int = -1            # -1 -> 256 for dla/hourglass, 64 for res
    down_ratio: int = 4
    rep: str = "cartesian"         # cartesian | polar | polar_fixed
    nbr_points: int = 16
    cat_spec_poly: bool = False
    cat_spec_wh: bool = False
    dense_poly: bool = False
    reg_offset: bool = True

    # input
    input_h: int = -1
    input_w: int = -1

    # train
    lr: float = 1.25e-4
    lr_step: Tuple[int, ...] = (90, 120)
    num_epochs: int = 240
    batch_size: int = 32
    val_intervals: int = 5
    grad_clip: Optional[float] = None
    num_workers: int = 4

    # loss
    mse_loss: bool = False
    reg_loss: str = "l1"           # l1 | sl1 (ctdet/ddd wh regression)
    dense_wh: bool = False
    norm_wh: bool = False
    hm_gauss: int = 3              # fixed sigma when mse_loss
    poly_loss: str = "l1"          # l1 | iou | l1+iou | relu
    poly_order: bool = False
    elliptical_gt: bool = True     # paper runs use it
    hm_weight: float = 1.0
    off_weight: float = 1.0
    poly_weight: float = 1.0
    depth_weight: float = 0.1
    wh_weight: float = 0.1
    # ddd loss weights / flags (ref opts.py ddd section)
    dep_weight: float = 1.0
    dim_weight: float = 1.0
    rot_weight: float = 1.0
    reg_bbox: bool = True
    # multi_pose loss weights / flags
    hp_weight: float = 1.0
    hm_hp_weight: float = 1.0
    dense_hp: bool = False
    hm_hp: bool = True
    reg_hp_offset: bool = True
    # exdet
    agnostic_ex: bool = False

    # augmentation
    not_rand_crop: bool = False
    shift: float = 0.1
    scale: float = 0.4
    flip: float = 0.5
    no_reorder_flip: bool = False
    no_color_aug: bool = False
    aug_rot: float = 0.0           # multi_pose rotation aug probability
    rotate: float = 0.0            # multi_pose max rotation (degrees)
    aug_ddd: float = 0.5           # ddd scale/shift aug probability

    # debug visualization (ref opts.py:19-24): 0 = off, 1/2 = compose
    # overlay + heatmap views, 4 = save all views to debug_dir
    debug: int = 0
    debug_dir: str = "debug"

    # test
    test_scales: Tuple[float, ...] = (1.0,)
    nms: bool = False
    K: int = 128
    thresh: float = 0.05
    peak_thresh: float = 0.2       # ddd score cut (ref opts.py)
    fix_res: bool = True
    flip_test: bool = False
    vis_thresh: float = 0.3

    # oracle eval (SURVEY §4: the reference's decoupling harness)
    eval_oracle_hm: bool = False
    eval_oracle_poly: bool = False
    eval_oracle_offset: bool = False
    eval_oracle_pseudo_depth: bool = False

    # parallelism (TPU-native axis; reference analog: chunk_sizes/gpus)
    mesh_shape: Tuple[int, ...] = (-1,)   # -1 = all devices on 'data'
    mixed_precision: bool = True          # bf16 conv compute
    # multi-host (SURVEY §2.7): same program over N processes; the mesh
    # spans all global devices after jax.distributed.initialize
    distributed: bool = False             # call jax.distributed.initialize
    coordinator_address: str = ""         # "" = auto-detect (TPU pods)
    num_processes: int = -1               # -1 = auto-detect
    process_id: int = -1                  # -1 = auto-detect

    # -- derived --------------------------------------------------------
    def __post_init__(self):
        info = DATASET_INFO.get(self.dataset)
        if info is None:
            raise ValueError(f"unknown dataset '{self.dataset}'")
        (dh, dw), ncls, mean, std = info
        self.num_classes = ncls
        self.mean = mean
        self.std = std
        if self.input_h <= 0:
            self.input_h = dh
        if self.input_w <= 0:
            self.input_w = dw
        if self.head_conv == -1:
            self.head_conv = 256 if (
                "dla" in self.arch or "hourglass" in self.arch) else 64
        self.pad = 127 if "hourglass" in self.arch else 31
        self.num_stacks = 2 if self.arch == "hourglass" else 1
        # the DCNv2 module resolves its formulation and Pallas-kernel
        # mode at trace time via these env vars (module attrs would
        # retrace every switch); 'auto' clears any value a PREVIOUS
        # Config wrote (so configs don't leak into each other) but
        # leaves a user-exported env var alone
        _apply_owned_env("CENTERPOLY_DCN_FORMULATION", self.dcn_form)
        kern = self.dcn_kernel.lower()
        prefix = kern.split(":", 1)[0]
        if prefix not in ("auto", "off", "on", "0", "1", "rowband",
                          "halo"):
            # fail at config construction, not mid-trace: a typo here
            # would silently run the wrong (slower or clamped) DCN path
            raise ValueError(
                f"dcn_kernel={self.dcn_kernel!r}: expected auto | off | "
                f"on | rowband[:R] | halo[:R] "
                f"(models/deform_conv.py gate vocabulary)")
        _apply_owned_env("CENTERPOLY_PALLAS_DCN", kern)
        self._dcn_kernel_defaulted = False
        if self.poly_loss in ("iou", "l1+iou") and self.rep == "cartesian":
            # deliberate deviation from the reference (losses.py:1049-1060
            # computes IoU on raw channel pairs even for cartesian — i.e.
            # reads (x, y) as (r, theta), a silent bug): this repo's
            # polar-sort IoU is only meaningful for polar reps.  Fail at
            # config construction, not mid-trace (losses/poly.py:141).
            raise ValueError(
                f"poly_loss='{self.poly_loss}' requires rep='polar' or "
                f"'polar_fixed' (got rep='cartesian'): the polygon IoU "
                f"loss sorts (r, theta) vertex pairs by theta, which has "
                f"no meaning for cartesian polygons")
        self.output_h = self.input_h // self.down_ratio
        self.output_w = self.input_w // self.down_ratio
        self.max_objs = 128
        self.heads = task_heads(
            self.task, self.num_classes, self.nbr_points,
            self.reg_offset, self.cat_spec_poly, self.cat_spec_wh,
            agnostic_ex=self.agnostic_ex, reg_bbox=self.reg_bbox,
            hm_hp=self.hm_hp, reg_hp_offset=self.reg_hp_offset)

    def prefer_fast_inference_dcn(self) -> bool:
        """Default the INFERENCE-ONLY entrypoints onto the rowband
        Pallas DCN kernel (test/demo/run_on_csv call this right after
        from_args; the training entry never does).

        Applies only when the user expressed no preference (dcn_kernel
        'auto' and CENTERPOLY_PALLAS_DCN unset) and the arch has DCNv2
        nodes (dla_* except dlav0, resdcn_*).  Evidence for the
        default: eval-side AP50 delta vs the exact path is +0.0000 on
        trained weights and learned y-offsets stay inside the band
        (RESULTS.md "Queue5 part 2"); speed is 2.1x on DLA-34
        (16.6 vs 35.1 ms/frame).  `--dcn_kernel off` restores exact
        DCNv2 semantics.  Returns True when the default was applied.
        """
        import os
        has_dcn = (self.arch.startswith("dla")
                   and not self.arch.startswith("dlav0")) \
            or self.arch.startswith("resdcn")
        if (self.dcn_kernel != "auto" or not has_dcn
                or os.environ.get("CENTERPOLY_PALLAS_DCN") is not None):
            return False
        self.dcn_kernel = INFERENCE_DCN_KERNEL_DEFAULT
        _apply_owned_env("CENTERPOLY_PALLAS_DCN", self.dcn_kernel)
        self._dcn_kernel_defaulted = True
        return True

    def to_json(self) -> str:
        d = {k: v for k, v in dataclasses.asdict(self).items()}
        for k in ("heads",):
            d[k] = dict(getattr(self, k))
        return json.dumps(d, indent=2, default=str)

    @classmethod
    def from_args(cls, argv=None) -> "Config":
        """CLI front-end mirroring the reference flag surface."""
        import argparse

        parser = argparse.ArgumentParser(description="centerpoly_tpu")
        parser.add_argument("task", nargs="?", default="polydet")
        fields = {f.name: f for f in dataclasses.fields(cls)}
        for name, f in fields.items():
            if name == "task":
                continue
            if f.type == "bool" or isinstance(f.default, bool):
                # default-False flags switch on with --name; default-True
                # flags switch off with --no_name (the reference's
                # `--not_*` surface, e.g. opts.py --not_reg_offset)
                parser.add_argument(f"--{name}", dest=name,
                                    action="store_true", default=f.default)
                parser.add_argument(f"--no_{name}", f"--not_{name}",
                                    dest=name, action="store_false")
            elif isinstance(f.default, tuple):
                parser.add_argument(f"--{name}", type=str,
                                    default=",".join(map(str, f.default)))
            elif f.default is None:
                parser.add_argument(f"--{name}", type=float, default=None)
            else:
                parser.add_argument(f"--{name}", type=type(f.default),
                                    default=f.default)
        ns = parser.parse_args(argv)
        kwargs = {}
        for name, f in fields.items():
            v = getattr(ns, name)
            if isinstance(f.default, tuple) and isinstance(v, str):
                elems = [x for x in v.split(",") if x]
                cast = float if name == "test_scales" else int
                v = tuple(cast(x) for x in elems)
            kwargs[name] = v
        return cls(**kwargs)
