"""Checkpoint save/load + PyTorch-checkpoint import.

Behavioral reference: src/lib/models/model.py:31-142 — checkpoint dict
{'epoch', 'state_dict', 'optimizer'}, tolerant partial load (shape-mismatch
skip with a warning), `module.` prefix strip, model_last / model_best /
model_{epoch} naming (src/main.py:156-193).

Native format here is orbax; `import_torch_state_dict` converts a reference
.pth state_dict into a flax param/batch-stats tree (OIHW->HWIO kernels, BN
split into scale/bias vs running stats, transposed-conv kernel flip).
"""
from __future__ import annotations

import os
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np
import jax


def _ocp():
    import orbax.checkpoint as ocp
    return ocp


def save_checkpoint(save_dir: str, tag: str, state, epoch: int):
    """Write model_<tag> (last/best/<epoch>) with epoch metadata."""
    ocp = _ocp()
    path = os.path.abspath(os.path.join(save_dir, f"model_{tag}"))
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "epoch": np.int32(epoch),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "step": jax.device_get(state.step),
    }
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(save_dir: str, tag: str, state):
    """Restore into an existing TrainState (resume semantics:
    ref model.py:102-112 — optimizer state + epoch come back too)."""
    ocp = _ocp()
    path = os.path.abspath(os.path.join(save_dir, f"model_{tag}"))
    ckptr = ocp.StandardCheckpointer()
    template = {
        "epoch": np.int32(0),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "step": jax.device_get(state.step),
    }
    restored = ckptr.restore(path, template)
    new_state = state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    )
    return new_state, int(restored["epoch"])


def restore_variables(path: str, init_variables=None):
    """Restore inference variables {'params', 'batch_stats'} from a
    model_<tag> checkpoint dir written by save_checkpoint."""
    del init_variables  # shapes come from the stored arrays
    ocp = _ocp()
    path = os.path.abspath(path)
    # raw restore (no template needed): shapes come from the stored arrays
    restored = ocp.PyTreeCheckpointer().restore(path)
    out = {"params": restored["params"]}
    if restored.get("batch_stats"):
        out["batch_stats"] = restored["batch_stats"]
    return out


# ---------------------------------------------------------------------------
# PyTorch import
# ---------------------------------------------------------------------------

def torch_conv_to_flax(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def torch_deconv_to_flax_depthwise(w: np.ndarray) -> np.ndarray:
    """Grouped ConvTranspose2d weight (C, 1, k, k) -> our DepthwiseUpsample
    lhs-dilated conv kernel (k, k, 1, C), spatially flipped (transposed conv
    correlates with the flipped kernel)."""
    w = w[:, 0, ::-1, ::-1]          # (C, k, k) flipped
    return np.transpose(w, (1, 2, 0))[:, :, None, :]


def torch_deconv_to_flax(w: np.ndarray) -> np.ndarray:
    """Dense ConvTranspose2d weight (Cin, Cout, k, k) -> flax ConvTranspose
    kernel (k, k, Cin, Cout), spatially flipped (verified equivalent for
    the k=4/s=2/p=1 <-> SAME configuration used by the deconv stages)."""
    return np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1))


def flatten_params(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict) or hasattr(v, "items"):
            out.update(flatten_params(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def unflatten_params(flat: Dict[str, np.ndarray]):
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def import_torch_state_dict(
    state_dict: Dict[str, "np.ndarray"],
    params: Dict,
    batch_stats: Dict,
    name_map: Callable[[str], Optional[Tuple[str, str]]],
    strict: bool = False,
):
    """Merge a torch state_dict into flax trees.

    Args:
      state_dict: torch name -> numpy array (already .numpy()'d; `module.`
        prefixes are stripped here).
      params / batch_stats: flax trees to update (copies returned).
      name_map: torch key -> (flax_flat_key, kind) where kind in
        {'conv', 'deconv_dw', 'bn_scale', 'bn_bias', 'bn_mean', 'bn_var',
         'bias', 'raw'}; return None to skip a key.
      strict: raise on shape mismatch instead of skipping (the reference
        skips with a warning, model.py:52-64).

    Returns (params, batch_stats, report dict).
    """
    flat_p = flatten_params(params)
    flat_b = flatten_params(batch_stats)
    loaded, skipped = [], []
    for tk, tv in state_dict.items():
        tk = tk[len("module."):] if tk.startswith("module.") else tk
        mapped = name_map(tk)
        if mapped is None:
            skipped.append(tk)
            continue
        fk, kind = mapped
        tv = np.asarray(tv)
        if kind == "conv":
            tv = torch_conv_to_flax(tv)
        elif kind == "deconv_dw":
            tv = torch_deconv_to_flax_depthwise(tv)
        elif kind == "deconv":
            tv = torch_deconv_to_flax(tv)
        target = flat_b if kind in ("bn_mean", "bn_var") else flat_p
        if fk not in target:
            skipped.append(tk)
            continue
        if target[fk].shape != tv.shape:
            if strict:
                raise ValueError(
                    f"shape mismatch {tk} -> {fk}: "
                    f"{tv.shape} vs {target[fk].shape}")
            skipped.append(tk)
            continue
        target[fk] = tv.astype(target[fk].dtype)
        loaded.append(tk)
    report = {"loaded": loaded, "skipped": skipped}
    return unflatten_params(flat_p), unflatten_params(flat_b), report


def load_torch_pth(path: str) -> Dict[str, np.ndarray]:
    """Read a reference checkpoint file {'epoch', 'state_dict', ...}."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    return {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in sd.items()}
