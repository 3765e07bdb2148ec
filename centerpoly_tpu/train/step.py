"""jitted train / eval steps with GSPMD data parallelism.

One step == reference base_trainer.run_epoch body (base_trainer.py:64-134):
forward, loss, backward, Adam update — but fused into a single compiled
program.  Sharding: batch on the 'data' mesh axis, params replicated; the
compiler inserts the gradient psum over ICI (SURVEY.md §2.7).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..losses import polydet_loss, PolydetLossConfig


def loss_fn_for_task(task: str) -> Callable:
    """train_factory equivalent (ref trains/train_factory.py): task ->
    loss function(outputs, batch, cfg) -> (loss, stats)."""
    if task == "polydet":
        return polydet_loss
    if task == "ctdet":
        from ..losses.ctdet import ctdet_loss
        return ctdet_loss
    if task == "ddd":
        from ..losses.ddd import ddd_loss
        return ddd_loss
    if task == "exdet":
        from ..losses.exdet import exdet_loss
        return exdet_loss
    if task == "multi_pose":
        from ..losses.multi_pose import multi_pose_loss
        return multi_pose_loss
    raise ValueError(f"no train loss for task '{task}'")


def make_train_step(loss_cfg: PolydetLossConfig,
                    mesh: Mesh | None = None,
                    loss_callable: Callable | None = None,
                    grad_bucket: bool = False) -> Callable:
    """Returns train_step(state, batch) -> (state, stats).

    grad_bucket=True uses an explicit shard_map step whose gradients are
    reduced by ONE flattened pmean instead of the ~one-collective-per-
    parameter GSPMD emits for the pjit step.  Semantics shift to exactly
    the reference DataParallel's (base_trainer.py:95: per-replica BN and
    per-replica masked-mean losses, then a flat mean across replicas),
    where the pjit path computes global-batch statistics.  Use it when
    the mesh's collective latency dominates (many tiny gradient tensors
    over DCN, or virtual CPU meshes on few cores).
    """
    task_loss = loss_callable or polydet_loss

    def loss_fn(params, batch_stats, apply_fn, batch):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        outs, mutated = apply_fn(
            variables, batch["input"], train=True,
            mutable=["batch_stats"] if batch_stats else [],
        )
        # bf16 models (cfg.train_dtype) emit bf16 head maps; all loss math
        # runs in f32 regardless of the activation dtype
        outs = jax.tree.map(
            lambda a: a.astype(jnp.float32)
            if a.dtype == jnp.bfloat16 else a, outs)
        loss, stats = task_loss(outs, batch, loss_cfg)
        new_stats = mutated.get("batch_stats", batch_stats) if batch_stats \
            else batch_stats
        return loss, (stats, new_stats)

    def train_step(state, batch):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (stats, new_bs)), grads = grad_fn(
            state.params, state.batch_stats, state.apply_fn, batch)
        state = state.apply_gradients(grads)
        state = state.replace(batch_stats=new_bs)
        return state, stats

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))

    if grad_bucket:
        axis = mesh.axis_names[0]

        def bucketed_step(state, batch):
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            (_, (stats, new_bs)), grads = grad_fn(
                state.params, state.batch_stats, state.apply_fn, batch)
            flat, treedef = jax.tree.flatten(grads)
            # one rendezvous for the whole gradient: ravel every leaf
            # into a single f32 vector, pmean once, split back
            vec = jnp.concatenate(
                [jnp.ravel(g).astype(jnp.float32) for g in flat])
            vec = jax.lax.pmean(vec, axis)
            off, merged = 0, []
            for g in flat:
                merged.append(vec[off:off + g.size]
                              .reshape(g.shape).astype(g.dtype))
                off += g.size
            grads = jax.tree.unflatten(treedef, merged)
            new_bs = jax.lax.pmean(new_bs, axis) if new_bs else new_bs
            stats = jax.lax.pmean(stats, axis)
            state = state.apply_gradients(grads)
            state = state.replace(batch_stats=new_bs)
            return state, stats

        return jax.jit(
            jax.shard_map(
                bucketed_step, mesh=mesh,
                in_specs=(P(), P(axis)), out_specs=(P(), P()),
                check_vma=False),
            donate_argnums=(0,))

    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P("data"))
    return jax.jit(
        train_step,
        donate_argnums=(0,),
        in_shardings=(None, batch_sharded),
        out_shardings=(None, replicated),
    )


def make_eval_step(loss_cfg: PolydetLossConfig,
                   mesh: Mesh | None = None,
                   loss_callable: Callable | None = None) -> Callable:
    """eval_step(state, batch) -> (outs, stats): forward + loss only."""
    task_loss = loss_callable or polydet_loss

    def eval_step(state, batch):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        outs = state.apply_fn(variables, batch["input"], train=False)
        # same convention as train_step: loss math in f32 even when the
        # bf16 model emits bf16 head maps (the val loss gates model_best
        # when AP is unavailable — keep it at full precision)
        outs = jax.tree.map(
            lambda a: a.astype(jnp.float32)
            if a.dtype == jnp.bfloat16 else a, outs)
        loss, stats = task_loss(outs, batch, loss_cfg)
        return outs[-1], stats

    if mesh is None:
        return jax.jit(eval_step)
    batch_sharded = NamedSharding(mesh, P("data"))
    return jax.jit(eval_step, in_shardings=(None, batch_sharded))
