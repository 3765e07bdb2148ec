"""Train entry point: `python -m centerpoly_tpu.main polydet --dataset
cityscapes --arch dla_34 ...` (reference surface: src/main.py)."""
from __future__ import annotations

import os
import sys

import numpy as np


def main(argv=None):
    from .configs import Config
    from .data import CocoPolyAnnotations, SAMPLERS, DATASETS, Loader
    from .train.trainer import Trainer
    from .utils.logger import Logger

    cfg = Config.from_args(argv)
    np.random.seed(cfg.seed)

    local_batch = cfg.batch_size
    rank, world = 0, 1
    if cfg.distributed:
        from .train.mesh import initialize_distributed
        multi = initialize_distributed(cfg.coordinator_address,
                                       cfg.num_processes, cfg.process_id)
        import jax
        print(f"distributed: {jax.process_count()} processes, "
              f"{jax.device_count()} global devices (multi={multi})")
        if multi:
            # cfg.batch_size is GLOBAL; each process loads a DISJOINT
            # share of the index space (Loader rank/world stride over a
            # shared-seed shuffle) and shard_batch assembles the global
            # array from the per-process shards
            assert cfg.batch_size % jax.process_count() == 0, (
                "batch_size must divide evenly across processes")
            local_batch = cfg.batch_size // jax.process_count()
            rank, world = jax.process_index(), jax.process_count()

    meta_cls = DATASETS.get(cfg.dataset)
    if meta_cls is None:
        raise SystemExit(f"dataset '{cfg.dataset}' has no adapter")
    meta = meta_cls(cfg.data_dir, cfg.nbr_points)

    sampler_cls = SAMPLERS.get(cfg.task)
    if sampler_cls is None:
        raise SystemExit(f"task '{cfg.task}' has no sampler")
    train_ann = CocoPolyAnnotations(meta.annot_path("train"))
    train_sampler = sampler_cls(cfg, meta, train_ann, split="train",
                                img_dir=meta.img_dir("train"))
    train_loader = Loader(train_sampler, len(train_sampler),
                          local_batch, shuffle=True, seed=cfg.seed,
                          num_workers=cfg.num_workers,
                          rank=rank, world=world)

    val_loader = None
    try:
        val_ann = CocoPolyAnnotations(meta.annot_path("val"))
        val_sampler = sampler_cls(cfg, meta, val_ann, split="val",
                                  img_dir=meta.img_dir("val"))
        # val is sharded too (shard_batch assembles global arrays from
        # per-process shards); in multi-host runs the AP gate therefore
        # scores each process's shard — identical shards would double
        # count, disjoint shards just gate on a per-rank subsample
        val_loader = Loader(val_sampler, len(val_sampler),
                            local_batch, shuffle=False, drop_last=False,
                            rank=rank, world=world)
    except FileNotFoundError:
        pass

    save_dir = os.path.join(cfg.save_dir, cfg.dataset, cfg.task, cfg.exp_id)
    os.makedirs(save_dir, exist_ok=True)
    logger = Logger(save_dir, cfg.to_json())

    trainer = Trainer(cfg, train_loader, val_loader, meta, logger)
    trainer.fit(save_dir)


if __name__ == "__main__":
    main()
