"""Weight surgery: head transplants + freezing (ref model.py:66-125)."""
import numpy as np
import jax
import jax.numpy as jnp
import optax

from centerpoly_tpu.train.surgery import (
    transplant_heads, freeze_mask, freeze_transform)


def _params(seed):
    r = np.random.RandomState(seed)
    return {
        "backbone": {"conv": {"kernel": r.randn(3, 3).astype(np.float32)}},
        "heads": {
            "hm_out": {"kernel": r.randn(4, 2).astype(np.float32)},
            "poly_out": {"kernel": r.randn(4, 8).astype(np.float32)},
        },
    }


def test_transplant_copies_only_matching():
    a, b = _params(0), _params(1)
    out = transplant_heads(a, b, ["hm"])
    assert np.allclose(out["heads"]["hm_out"]["kernel"],
                       b["heads"]["hm_out"]["kernel"])
    assert np.allclose(out["heads"]["poly_out"]["kernel"],
                       a["heads"]["poly_out"]["kernel"])
    assert np.allclose(out["backbone"]["conv"]["kernel"],
                       a["backbone"]["conv"]["kernel"])


def test_freeze_zeroes_frozen_grads():
    p = _params(0)
    mask = freeze_mask(p, ["poly", "hm"])
    tx = optax.chain(freeze_transform(mask), optax.sgd(0.1))
    state = tx.init(p)
    grads = jax.tree_util.tree_map(jnp.ones_like, p)
    updates, _ = tx.update(grads, state, p)
    assert float(jnp.abs(updates["backbone"]["conv"]["kernel"]).sum()) == 0
    assert float(jnp.abs(updates["heads"]["hm_out"]["kernel"]).sum()) > 0
