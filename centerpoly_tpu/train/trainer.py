"""Training orchestration: epoch loop, val-AP model selection, checkpoints.

Behavioral reference: src/main.py:24-198 + src/lib/trains/base_trainer.py:
64-149 — per-epoch train, periodic val with Cityscapes AP gating of
model_best (main.py:162-186), LR step decay, model_last every epoch,
--resume reloading model_last (+ optimizer), oracle head substitution
during val (trains/polydet.py:49-70).
"""
from __future__ import annotations

import time
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..configs import Config
from ..losses import PolydetLossConfig, CtdetLossConfig
from ..models import create_model
from ..utils.timers import AverageMeter
from ..utils.logger import Logger
from .state import create_train_state
from .step import make_train_step, make_eval_step, loss_fn_for_task
from .mesh import make_mesh, shard_batch, replicate
from .checkpoint import save_checkpoint, load_checkpoint


def loss_config_for(cfg: Config):
    """Build the per-task loss config from the experiment config."""
    if cfg.task == "polydet":
        return PolydetLossConfig(
            hm_weight=cfg.hm_weight, off_weight=cfg.off_weight,
            poly_weight=cfg.poly_weight, depth_weight=cfg.depth_weight,
            rep=cfg.rep, poly_loss=cfg.poly_loss,
            poly_order=cfg.poly_order, reg_offset=cfg.reg_offset,
            mse_loss=cfg.mse_loss)
    if cfg.task == "ctdet":
        return CtdetLossConfig(
            hm_weight=cfg.hm_weight, off_weight=cfg.off_weight,
            wh_weight=cfg.wh_weight, mse_loss=cfg.mse_loss,
            reg_loss=cfg.reg_loss, dense_wh=cfg.dense_wh,
            norm_wh=cfg.norm_wh, cat_spec_wh=cfg.cat_spec_wh,
            reg_offset=cfg.reg_offset)
    if cfg.task == "ddd":
        from ..losses.ddd import DddLossConfig
        return DddLossConfig(
            hm_weight=cfg.hm_weight, dep_weight=cfg.dep_weight,
            dim_weight=cfg.dim_weight, rot_weight=cfg.rot_weight,
            wh_weight=cfg.wh_weight, off_weight=cfg.off_weight,
            mse_loss=cfg.mse_loss, reg_bbox=cfg.reg_bbox,
            reg_offset=cfg.reg_offset)
    if cfg.task == "exdet":
        from ..losses.exdet import ExdetLossConfig
        return ExdetLossConfig(
            hm_weight=cfg.hm_weight, off_weight=cfg.off_weight,
            mse_loss=cfg.mse_loss, reg_offset=cfg.reg_offset)
    if cfg.task == "multi_pose":
        from ..losses.multi_pose import MultiPoseLossConfig
        return MultiPoseLossConfig(
            hm_weight=cfg.hm_weight, wh_weight=cfg.wh_weight,
            off_weight=cfg.off_weight, hp_weight=cfg.hp_weight,
            hm_hp_weight=cfg.hm_hp_weight, mse_loss=cfg.mse_loss,
            reg_loss=cfg.reg_loss, dense_hp=cfg.dense_hp,
            hm_hp=cfg.hm_hp, reg_hp_offset=cfg.reg_hp_offset,
            reg_offset=cfg.reg_offset)
    raise ValueError(f"no loss config for task '{cfg.task}'")


class Trainer:
    def __init__(self, cfg: Config, train_loader, val_loader=None,
                 dataset_meta=None, logger: Optional[Logger] = None,
                 use_mesh: bool = True):
        self.cfg = cfg
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.meta = dataset_meta
        self.logger = logger
        self.loss_cfg = loss_config_for(cfg)
        loss_callable = loss_fn_for_task(cfg.task)

        n_dev = len(jax.devices())
        # the batch axis shards over the mesh — it must divide evenly
        use_mesh = use_mesh and n_dev > 1 and cfg.batch_size % n_dev == 0
        self.mesh = make_mesh() if use_mesh else None
        dtype = jnp.bfloat16 if cfg.train_dtype in (
            "bf16", "bfloat16") else jnp.float32
        model = create_model(cfg.arch, cfg.heads, cfg.head_conv, dtype=dtype)
        steps_per_epoch = max(1, len(train_loader))
        self.state = create_train_state(
            model, jax.random.PRNGKey(cfg.seed),
            (1, cfg.input_h, cfg.input_w, 3),
            base_lr=cfg.lr, lr_steps=cfg.lr_step,
            steps_per_epoch=steps_per_epoch, grad_clip=cfg.grad_clip)
        if self.mesh is not None:
            self.state = replicate(self.state, self.mesh)
        self.train_step = make_train_step(self.loss_cfg, mesh=self.mesh,
                                          loss_callable=loss_callable)
        self.eval_step = make_eval_step(self.loss_cfg, mesh=self.mesh,
                                        loss_callable=loss_callable)
        self._val_decode = None
        # -inf, not -1: the fallback gate metric is -val_loss, which
        # starts below -1 on any fresh model — the first valid metric
        # must always save a model_best (ref main.py gates with 1e10)
        self.best = float("-inf")
        self.start_epoch = 0
        n_params = sum(
            int(np.prod(np.asarray(p).shape))
            for p in jax.tree_util.tree_leaves(self.state.params))
        self._log(f"model {cfg.arch}: {n_params / 1e6:.2f}M parameters\n")

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
        # per-step stats stay ON DEVICE (tiny async adds): float()-ing
        # each scalar would block the host on every step — on a
        # tunneled backend that is a ~40 ms round trip per stat per
        # step, and it stops the device pipelining ahead of batch prep
        sums: Dict[str, object] = {}
        counts: Dict[str, int] = {}
        t0 = time.time()
        n = 0
        for batch in self.train_loader:
            bsz = batch["input"].shape[0]
            self.state, stats = self.train_step(self.state, self._put(batch))
            for k, v in stats.items():
                sums[k] = v * bsz + sums[k] if k in sums else v * bsz
                counts[k] = counts.get(k, 0) + bsz
            n += 1
        # fetching the accumulated scalars blocks until the last step's
        # compute is done — take the epoch time AFTER it so dt measures
        # execution, not dispatch
        avg = {k: float(s) / counts[k] for k, s in sums.items()}
        dt = time.time() - t0
        self._log(f"epoch {epoch} | {n} iters | {dt:.1f}s | " +
                  " ".join(f"{k} {v:.4f}" for k, v in avg.items()) + "\n")
        if self.logger is not None:
            for k, v in avg.items():
                self.logger.scalar_summary(f"train_{k}", v, epoch)
        return avg

    # -- validation -------------------------------------------------------

    def _decode_outputs(self, outs, batch) -> Optional[Dict]:
        """Decode a val batch's head maps into per-image results
        (ref trains/polydet.py:220-237, trains/ctdet.py:137-150
        save_result)."""
        if "meta" not in batch:
            return None
        if self.cfg.task == "ctdet":
            return self._decode_ctdet(outs, batch)
        if self.cfg.task != "polydet":
            return None
        from ..ops.decode import polydet_decode
        from ..infer.detector import polydet_post_process
        from ..utils.oracle import apply_oracles

        cfg = self.cfg
        heads = {k: np.asarray(jax.device_get(v), np.float32)
                 for k, v in outs.items()}
        if any(getattr(cfg, f, False) for f in (
                "eval_oracle_hm", "eval_oracle_poly", "eval_oracle_offset",
                "eval_oracle_pseudo_depth")):
            gt_like = {k: np.asarray(v) for k, v in batch.items()
                       if k != "meta"}
            oracled = apply_oracles(heads, gt_like, cfg)
            # oracle hm comes through as GT probabilities, not logits
            hm = jnp.asarray(oracled["hm"]) if cfg.eval_oracle_hm \
                else jax.nn.sigmoid(jnp.asarray(heads["hm"]))
            heads = {**heads, **{k: oracled[k] for k in oracled}}
        else:
            hm = jax.nn.sigmoid(jnp.asarray(heads["hm"]))

        dets = polydet_decode(
            hm, jnp.asarray(heads["poly"]),
            jnp.asarray(heads["pseudo_depth"]),
            reg=jnp.asarray(heads["reg"]) if cfg.reg_offset else None,
            k=cfg.K, rep=cfg.rep)
        dets = np.asarray(dets)
        results = {}
        metas = batch["meta"]
        for i, m in enumerate(metas):
            pp = polydet_post_process(
                dets[i:i + 1], [m["c"]], [m["s"]],
                cfg.output_h, cfg.output_w, cfg.num_classes)[0]
            length = 5 + 2 * cfg.nbr_points + 1
            for j in range(1, cfg.num_classes + 1):
                pp[j] = np.array(pp[j], np.float32).reshape(-1, length)
            results[int(m["img_id"])] = pp
        return results

    def _decode_ctdet(self, outs, batch) -> Dict:
        from ..ops.decode import ctdet_decode
        from ..infer.detector import ctdet_post_process

        cfg = self.cfg
        hm = jax.nn.sigmoid(jnp.asarray(outs["hm"], jnp.float32))
        dets = np.asarray(ctdet_decode(
            hm, jnp.asarray(outs["wh"], jnp.float32),
            reg=jnp.asarray(outs["reg"], jnp.float32)
            if cfg.reg_offset else None,
            k=cfg.K, cat_spec_wh=cfg.cat_spec_wh))
        results = {}
        for i, m in enumerate(batch["meta"]):
            pp = ctdet_post_process(
                dets[i:i + 1], [m["c"]], [m["s"]],
                cfg.output_h, cfg.output_w, cfg.num_classes)[0]
            for j in range(1, cfg.num_classes + 1):
                pp[j] = np.array(pp[j], np.float32).reshape(-1, 5)
            results[int(m["img_id"])] = pp
        return results

    def eval_variables(self):
        """The current weights as an inference `variables` dict (what
        create_detector / model.apply(train=False) consume)."""
        variables = {"params": self.state.params}
        if self.state.batch_stats:
            variables["batch_stats"] = self.state.batch_stats
        return variables

    def validate(self, epoch: int, save_dir: str):
        """Val loss + (polydet) decoded results -> instance AP when the
        dataset meta can evaluate.  Returns (val_loss, ap_or_None)."""
        if self.val_loader is None:
            return None, None
        meters: Dict[str, AverageMeter] = {}
        results = {}
        for batch in self.val_loader:
            bsz = batch["input"].shape[0]
            outs, stats = self.eval_step(self.state, self._put(batch))
            for k, v in stats.items():
                meters.setdefault(k, AverageMeter()).update(float(v), bsz)
            r = self._decode_outputs(outs, batch)
            if r:
                results.update(r)
        avg = {k: m.avg for k, m in meters.items()}
        self._log(f"val   {epoch} | " +
                  " ".join(f"{k} {v:.4f}" for k, v in avg.items()) + "\n")
        if self.logger is not None:
            for k, v in avg.items():
                self.logger.scalar_summary(f"val_{k}", v, epoch)

        ap = None
        if results and self.meta is not None:
            try:
                res = self.meta.run_eval(results, save_dir)
            except Exception as e:  # eval GT genuinely unavailable
                self._log(f"val {epoch} | AP eval skipped: {e}\n")
                res = None
            if res is not None:
                # cityscapes-style evaluators emit allAp; the COCO-protocol
                # ones (coco/pascal/uadetrac/...) emit AP. Leave ap=None when
                # neither is present so fit() falls back to -loss gating.
                ap_val = res.get("allAp", res.get("AP"))
                ap = float(ap_val) if ap_val is not None else None
                ap50 = res.get("allAp50%", res.get("AP50"))
                self._log(f"val   {epoch} | AP {ap if ap is None else round(ap, 4)} "
                          f"AP50 {ap50}\n")
                if self.logger is not None and ap is not None:
                    self.logger.scalar_summary("val_AP", ap, epoch)
        return avg.get("loss"), ap

    def fit(self, save_dir: str, num_epochs: Optional[int] = None):
        cfg = self.cfg
        num_epochs = num_epochs or cfg.num_epochs
        if cfg.resume:
            try:
                self.state, self.start_epoch = load_checkpoint(
                    save_dir, "last", self.state)
                self._log(f"resumed from epoch {self.start_epoch}\n")
            except Exception as e:
                self._log(f"resume requested but no usable model_last "
                          f"({e}); starting fresh\n")
        for epoch in range(self.start_epoch + 1, num_epochs + 1):
            self.run_epoch(epoch)
            save_checkpoint(save_dir, "last", self.state, epoch)
            if cfg.val_intervals > 0 and epoch % cfg.val_intervals == 0:
                val_loss, ap = self.validate(epoch, save_dir)
                # gate best on AP when eval ran, else on -loss
                # (ref main.py:162-186)
                metric = ap if ap is not None else (
                    -val_loss if val_loss is not None else None)
                if metric is not None and metric > self.best:
                    self.best = metric
                    save_checkpoint(save_dir, "best", self.state, epoch)
        return self.state
