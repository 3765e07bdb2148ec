"""Pre-trace + serialize the dryrun's 8-way-sharded train step.

The multichip dryrun (__graft_entry__.py) must finish inside the
driver's wall budget on a 1-core host.  Live, the child spends ~10 s in
eval_shape(model.init), ~22 s tracing fwd+bwd, and ~7 s in a warm-cache
compile before the step even runs.  jax.export lets us do the tracing
ONCE here, commit the StableHLO blob + the input-leaf manifest, and have
the child deserialize + call it — same program, same mesh shardings,
same 8-way execution, a fraction of the wall.

Run under the canonical child env (the same one __graft_entry__ spawns):

    _CENTERPOLY_DRYRUN_CHILD= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python experiments/export_dryrun_step.py

Artifacts (committed):
    experiments/dryrun_step_8.jaxexport  — serialized Exported
    experiments/dryrun_step_8.json       — input leaf shapes/dtypes
"""
from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

N_DEVICES = 8


def main():
    import jax
    # the axon sitecustomize force-registers the remote-TPU backend in
    # every process; this exporter must never touch the tunnel
    jax.config.update("jax_platforms", "cpu")
    from centerpoly_tpu.losses import PolydetLossConfig
    from centerpoly_tpu.train import make_train_step, make_mesh
    from __graft_entry__ import (_build_dryrun_state_and_batch,
                                 dryrun_source_hash)

    assert len(jax.devices()) >= N_DEVICES, (
        f"need {N_DEVICES} devices, run under the canonical child env")

    cfg, state, batch = _build_dryrun_state_and_batch(N_DEVICES)
    mesh = make_mesh(N_DEVICES)
    loss_cfg = PolydetLossConfig(
        rep=cfg.rep, poly_loss=cfg.poly_loss, poly_order=cfg.poly_order)
    step = make_train_step(loss_cfg, mesh=mesh, grad_bucket=True)

    # Flatten to plain array lists: the TrainState treedef carries the
    # optax tx (a static field of closures) which neither serializes nor
    # compares equal across processes; the export boundary must be
    # structure-free.  The treedefs are closed over at trace time only.
    flat_state, state_def = jax.tree.flatten(state)
    batch_keys = sorted(batch.keys())
    flat_batch = [batch[k] for k in batch_keys]

    def step_flat(flat_state, flat_batch):
        st = jax.tree.unflatten(state_def, flat_state)
        bt = dict(zip(batch_keys, flat_batch))
        new_state, stats = step(st, bt)
        return jax.tree.leaves(new_state), stats

    import jax.numpy as jnp
    abs_state = [
        jax.ShapeDtypeStruct(x.shape, x.dtype) for x in flat_state]
    abs_batch = [
        jax.ShapeDtypeStruct(x.shape, x.dtype) for x in flat_batch]
    exported = jax.export.export(jax.jit(step_flat))(abs_state, abs_batch)
    blob = exported.serialize()

    manifest = {
        "n_devices": N_DEVICES,
        "batch_keys": batch_keys,
        "state_leaves": [[list(x.shape), str(x.dtype)] for x in flat_state],
        "batch_leaves": [[list(x.shape), str(x.dtype)] for x in flat_batch],
        "jax_version": jax.__version__,
        # binds the blob to the source it was traced from: the replay
        # re-computes this and traces live on mismatch
        # (tests/test_graft_entry.py keeps it honest in CI)
        "source_hash": dryrun_source_hash(),
    }
    out_blob = os.path.join(HERE, f"dryrun_step_{N_DEVICES}.jaxexport")
    out_json = os.path.join(HERE, f"dryrun_step_{N_DEVICES}.json")
    with open(out_blob, "wb") as f:
        f.write(blob)
    with open(out_json, "w") as f:
        json.dump(manifest, f, indent=1)
    print(f"wrote {out_blob} ({len(blob)} bytes) + manifest")

    # smoke: deserialize + run right here (also warms the compile cache
    # under JAX_COMPILATION_CACHE_DIR if set).  The exported call must
    # see an 8-device context: place state replicated and batch sharded
    # on the mesh before calling (uncommitted host arrays default to a
    # 1-device placement, which the export rejects).
    from jax.sharding import NamedSharding, PartitionSpec as P
    rt = jax.export.deserialize(blob)
    rep = NamedSharding(mesh, P())
    shd = NamedSharding(mesh, P("data"))
    flat_state = [jax.device_put(x, rep) for x in flat_state]
    flat_batch = [jax.device_put(x, shd) for x in flat_batch]
    new_leaves, stats = rt.call(flat_state, flat_batch)
    loss = float(stats["loss"])
    print(f"replay ok: loss={loss:.4f}")


if __name__ == "__main__":
    main()
