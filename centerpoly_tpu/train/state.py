"""Train state: params + batch stats + Adam with step-decay schedule.

Reference training loop: src/main.py:24-198 — Adam, LR divided by 10 at
each epoch in `lr_step` (main.py:191-197), optional grad clip
(base_trainer.py:100-101).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Any = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state)


def lr_schedule(base_lr: float, lr_steps: Sequence[int],
                steps_per_epoch: int) -> optax.Schedule:
    """LR / 10 at each epoch boundary in lr_steps (ref main.py:191-197)."""
    boundaries = {int(e) * steps_per_epoch: 0.1 for e in lr_steps}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def _fast_init_variables(model, rng, input_shape):
    """Shape-only init: eval_shape the init program (no XLA compile or
    execution) and fill leaves with small deterministic host values.

    For compile checks and dryruns the *values* of the params are
    irrelevant — only their shapes/dtypes and the train step's sharding
    are under test — and model.init on a 1-core CPU host costs ~20 s of
    XLA compile that eval_shape avoids entirely.
    """
    import numpy as np

    shapes = jax.eval_shape(
        lambda r: model.init(r, jnp.zeros(input_shape), train=False), rng)
    host_rng = np.random.RandomState(0)

    def fill(leaf):
        arr = (host_rng.standard_normal(leaf.shape) * 0.05).astype(
            np.dtype(leaf.dtype))
        return jnp.asarray(arr)

    return jax.tree.map(fill, shapes)


def create_train_state(
    model,
    rng,
    input_shape,
    base_lr: float = 1.25e-4,
    lr_steps: Sequence[int] = (90, 120),
    steps_per_epoch: int = 1000,
    grad_clip: Optional[float] = None,
    fast_init: bool = False,
) -> TrainState:
    if fast_init:
        variables = _fast_init_variables(model, rng, input_shape)
    else:
        variables = model.init(rng, jnp.zeros(input_shape), train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    sched = lr_schedule(base_lr, lr_steps, steps_per_epoch)
    chain = []
    if grad_clip is not None:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(optax.adam(sched))
    tx = optax.chain(*chain)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )
