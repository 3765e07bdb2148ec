import os
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from centerpoly_tpu.configs import Config
from centerpoly_tpu.models import create_model
from centerpoly_tpu.losses import PolydetLossConfig
from centerpoly_tpu.train import (
    create_train_state, make_train_step, make_eval_step, make_mesh,
    shard_batch, replicate, lr_schedule,
)


def tiny_batch(b=2, h=8, w=16, c=3, k=8, n=4, num_classes=2):
    rng = np.random.RandomState(0)
    batch = {
        "input": rng.randn(b, h * 4, w * 4, 3).astype(np.float32),
        "hm": np.zeros((b, h, w, num_classes), np.float32),
        "reg_mask": (rng.rand(b, k) > 0.5).astype(np.float32),
        "ind": rng.randint(0, h * w, (b, k)).astype(np.int32),
        "poly": rng.randn(b, k, 2 * n).astype(np.float32),
        "pseudo_depth": rng.rand(b, k, 1).astype(np.float32),
        "reg": rng.rand(b, k, 2).astype(np.float32),
    }
    batch["hm"][:, 2, 2, 0] = 1.0
    return batch


def make_tiny_model():
    heads = {"hm": 2, "poly": 8, "pseudo_depth": 1, "reg": 2}
    return create_model("res_18", heads, head_conv=32)


class TestLrSchedule:
    def test_step_decay(self):
        import pytest
        sched = lr_schedule(1e-3, (2, 4), steps_per_epoch=10)
        assert float(sched(0)) == pytest.approx(1e-3, rel=1e-5)
        assert float(sched(25)) == pytest.approx(1e-4, rel=1e-5)
        assert float(sched(45)) == pytest.approx(1e-5, rel=1e-5)


class TestTrainStep:
    @pytest.mark.slow
    def test_single_device_loss_decreases(self):
        model = make_tiny_model()
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   (1, 32, 64, 3), base_lr=1e-3)
        step = make_train_step(PolydetLossConfig())
        batch = {k: jnp.asarray(v) for k, v in tiny_batch().items()}
        losses = []
        for _ in range(5):
            state, stats = step(state, batch)
            losses.append(float(stats["loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]

    @pytest.mark.slow
    def test_multidevice_mesh(self):
        n = min(8, len(jax.devices()))
        mesh = make_mesh(n)
        model = make_tiny_model()
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   (1, 32, 64, 3), base_lr=1e-3)
        state = replicate(state, mesh)
        step = make_train_step(PolydetLossConfig(), mesh=mesh)
        batch = shard_batch(tiny_batch(b=n), mesh)
        state, stats = step(state, batch)
        assert np.isfinite(float(stats["loss"]))
        # second step re-uses the compiled program with sharded inputs
        batch = shard_batch(tiny_batch(b=n), mesh)
        state, stats2 = step(state, batch)
        assert np.isfinite(float(stats2["loss"]))

    @pytest.mark.slow
    def test_multidevice_matches_single(self):
        """DP over the mesh must give the same loss as one device."""
        n = min(4, len(jax.devices()))
        model = make_tiny_model()
        batch_host = tiny_batch(b=n)

        state1 = create_train_state(model, jax.random.PRNGKey(0),
                                    (1, 32, 64, 3), base_lr=1e-3)
        step1 = make_train_step(PolydetLossConfig())
        _, stats1 = step1(state1, {k: jnp.asarray(v)
                                   for k, v in batch_host.items()})

        mesh = make_mesh(n)
        state2 = create_train_state(model, jax.random.PRNGKey(0),
                                    (1, 32, 64, 3), base_lr=1e-3)
        state2 = replicate(state2, mesh)
        step2 = make_train_step(PolydetLossConfig(), mesh=mesh)
        _, stats2 = step2(state2, shard_batch(batch_host, mesh))
        np.testing.assert_allclose(float(stats1["loss"]),
                                   float(stats2["loss"]), rtol=1e-4)

    @pytest.mark.slow
    def test_grad_bucket_matches_pjit_on_tiled_batch(self):
        """grad_bucket (one flattened pmean, reference-DataParallel
        semantics: per-replica stats then flat mean) must agree with
        the pjit path whenever per-replica == global statistics — e.g.
        a batch that tiles the SAME sample onto every replica."""
        n = min(4, len(jax.devices()))
        mesh = make_mesh(n)
        model = make_tiny_model()
        b1 = tiny_batch(b=1)
        tiled = {k: np.repeat(v, n, axis=0) for k, v in b1.items()}

        results = {}
        for bucket in (False, True):
            state = create_train_state(model, jax.random.PRNGKey(0),
                                       (1, 32, 64, 3), base_lr=1e-3)
            state = replicate(state, mesh)
            step = make_train_step(PolydetLossConfig(), mesh=mesh,
                                   grad_bucket=bucket)
            state, stats = step(state, shard_batch(tiled, mesh))
            results[bucket] = (float(stats["loss"]), state.params)

        np.testing.assert_allclose(results[False][0], results[True][0],
                                   rtol=1e-4)
        flat_a = jax.tree.leaves(results[False][1])
        flat_b = jax.tree.leaves(results[True][1])
        for a, c in zip(flat_a, flat_b):
            # Adam divides by sqrt(v)+eps, so where a gradient is ~0 the
            # update direction is float-reduction-order noise; atol set
            # above the lr (1e-3) absorbs those few elements
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       rtol=5e-3, atol=2e-3)


class TestMixedPrecision:
    @pytest.mark.slow
    def test_bf16_train_step_finite_and_close_to_f32(self):
        # cfg.train_dtype=bfloat16: bf16 activations, f32 params/optimizer,
        # loss math upcast to f32 in make_train_step.loss_fn
        heads = {"hm": 2, "poly": 8, "pseudo_depth": 1, "reg": 2}
        batch = {k: jnp.asarray(v) for k, v in tiny_batch().items()}
        losses = {}
        for dtype in (jnp.float32, jnp.bfloat16):
            model = create_model("res_18", heads, head_conv=32, dtype=dtype)
            state = create_train_state(model, jax.random.PRNGKey(0),
                                       (1, 32, 64, 3), base_lr=1e-3)
            step = make_train_step(PolydetLossConfig())
            state, stats = step(state, batch)
            assert jax.tree_util.tree_all(jax.tree.map(
                lambda a: a.dtype != jnp.bfloat16, state.params)), \
                "params must stay f32 under bf16 activations"
            losses[dtype] = float(stats["loss"])
        assert np.isfinite(losses[jnp.bfloat16])
        assert abs(losses[jnp.bfloat16] - losses[jnp.float32]) < 0.05 * (
            1 + abs(losses[jnp.float32]))

    def test_dcn_remat_gate(self):
        import os
        from centerpoly_tpu.models.deform_conv import _dcn_remat_on
        assert not _dcn_remat_on(1, 64, 128, 256)       # small: no remat
        assert _dcn_remat_on(8, 128, 256, 64)           # paper-scale: remat
        os.environ["CENTERPOLY_DCN_REMAT"] = "0"
        try:
            assert not _dcn_remat_on(8, 128, 256, 64)
        finally:
            del os.environ["CENTERPOLY_DCN_REMAT"]

    @pytest.mark.slow
    def test_tapwise_dcn_matches_fused(self):
        # the training-scale formulation must match values AND grads
        from centerpoly_tpu.models.deform_conv import (
            deform_conv2d, deform_conv2d_tapwise)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 8, 10, 4), jnp.float32)
        off = jnp.asarray(rng.randn(2, 8, 10, 18) * 2, jnp.float32)
        mask = jnp.asarray(rng.rand(2, 8, 10, 9), jnp.float32)
        w = jnp.asarray(rng.randn(3, 3, 4, 6) * 0.1, jnp.float32)
        b = jnp.asarray(rng.randn(6) * 0.1, jnp.float32)
        y1 = deform_conv2d(x, off, mask, w, b)
        y2 = deform_conv2d_tapwise(x, off, mask, w, b)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                                   rtol=1e-5, atol=1e-5)
        f = lambda fn: lambda *a: jnp.sum(fn(*a) ** 2)
        g1 = jax.grad(f(deform_conv2d), argnums=(0, 1, 2, 3, 4))(
            x, off, mask, w, b)
        g2 = jax.grad(f(deform_conv2d_tapwise), argnums=(0, 1, 2, 3, 4))(
            x, off, mask, w, b)
        for a, c in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       rtol=1e-4, atol=1e-5)

    def test_pairs_dcn_matches_fused(self):
        # edge-clamped pairwise corner gathers must reproduce the exact
        # zero-padding semantics, including samples off every image edge
        from centerpoly_tpu.models.deform_conv import (
            deform_conv2d, deform_conv2d_pairs)
        rng = np.random.RandomState(1)
        for (b, h, w, c, co) in [(2, 8, 10, 4, 6), (1, 5, 7, 8, 3)]:
            x = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
            off = jnp.asarray(rng.randn(b, h, w, 18) * 3, jnp.float32)
            mask = jnp.asarray(rng.rand(b, h, w, 9), jnp.float32)
            wt = jnp.asarray(rng.randn(3, 3, c, co) * 0.1, jnp.float32)
            bs = jnp.asarray(rng.randn(co) * 0.1, jnp.float32)
            np.testing.assert_allclose(
                np.asarray(deform_conv2d(x, off, mask, wt, bs)),
                np.asarray(deform_conv2d_pairs(x, off, mask, wt, bs)),
                rtol=1e-5, atol=1e-5)

    @pytest.mark.slow
    def test_quad_dcn_matches_fused(self):
        # quad-view single-gather formulation: values bit-exact, grads
        # equal, across odd/even dims and far out-of-image offsets
        from centerpoly_tpu.models.deform_conv import (
            deform_conv2d, deform_conv2d_quad)
        rng = np.random.RandomState(2)
        for (b, h, w, c, co), sc in [((2, 8, 10, 4, 6), 3),
                                     ((1, 5, 7, 8, 3), 3),
                                     ((1, 9, 11, 4, 2), 12),
                                     ((2, 4, 4, 2, 2), 2)]:
            x = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
            off = jnp.asarray(rng.randn(b, h, w, 18) * sc, jnp.float32)
            mask = jnp.asarray(rng.rand(b, h, w, 9), jnp.float32)
            wt = jnp.asarray(rng.randn(3, 3, c, co) * 0.1, jnp.float32)
            bs = jnp.asarray(rng.randn(co) * 0.1, jnp.float32)
            np.testing.assert_allclose(
                np.asarray(deform_conv2d(x, off, mask, wt, bs)),
                np.asarray(deform_conv2d_quad(x, off, mask, wt, bs)),
                rtol=1e-6, atol=1e-6)
        f = lambda fn: lambda *a: jnp.sum(fn(*a) ** 2)
        g1 = jax.grad(f(deform_conv2d), argnums=(0, 1, 2, 3))(
            x, off, mask, wt, bs)
        g2 = jax.grad(f(deform_conv2d_quad), argnums=(0, 1, 2, 3))(
            x, off, mask, wt, bs)
        for a, cg in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(cg),
                                       rtol=1e-5, atol=1e-6)

    def test_quad_tapwise_dcn_matches_fused(self):
        from centerpoly_tpu.models.deform_conv import (
            deform_conv2d, deform_conv2d_quad_tapwise)
        rng = np.random.RandomState(3)
        b, h, w, c, co = 2, 8, 10, 4, 6
        x = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
        off = jnp.asarray(rng.randn(b, h, w, 18) * 3, jnp.float32)
        mask = jnp.asarray(rng.rand(b, h, w, 9), jnp.float32)
        wt = jnp.asarray(rng.randn(3, 3, c, co) * 0.1, jnp.float32)
        bs = jnp.asarray(rng.randn(co) * 0.1, jnp.float32)
        np.testing.assert_allclose(
            np.asarray(deform_conv2d(x, off, mask, wt, bs)),
            np.asarray(deform_conv2d_quad_tapwise(x, off, mask, wt, bs)),
            rtol=1e-5, atol=1e-6)
        f = lambda fn: lambda *a: jnp.sum(fn(*a) ** 2)
        g1 = jax.grad(f(deform_conv2d), argnums=(0, 1, 2, 3, 4))(
            x, off, mask, wt, bs)
        g2 = jax.grad(f(deform_conv2d_quad_tapwise),
                      argnums=(0, 1, 2, 3, 4))(x, off, mask, wt, bs)
        for a, cg in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(cg),
                                       rtol=1e-4, atol=1e-6)

    def test_duo_dcn_matches_fused(self):
        # duo-view pair-gather formulation (the 2*Cin midpoint of the
        # chunk-size ladder): values bit-exact, grads equal, across
        # odd/even widths and far out-of-image offsets
        from centerpoly_tpu.models.deform_conv import (
            deform_conv2d, deform_conv2d_duo)
        rng = np.random.RandomState(4)
        for (b, h, w, c, co), sc in [((2, 8, 10, 4, 6), 3),
                                     ((1, 5, 7, 8, 3), 3),
                                     ((1, 9, 11, 4, 2), 12),
                                     ((2, 4, 4, 2, 2), 2),
                                     ((1, 3, 3, 2, 2), 2)]:
            x = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
            off = jnp.asarray(rng.randn(b, h, w, 18) * sc, jnp.float32)
            mask = jnp.asarray(rng.rand(b, h, w, 9), jnp.float32)
            wt = jnp.asarray(rng.randn(3, 3, c, co) * 0.1, jnp.float32)
            bs = jnp.asarray(rng.randn(co) * 0.1, jnp.float32)
            np.testing.assert_allclose(
                np.asarray(deform_conv2d(x, off, mask, wt, bs)),
                np.asarray(deform_conv2d_duo(x, off, mask, wt, bs)),
                rtol=1e-6, atol=1e-6)
        f = lambda fn: lambda *a: jnp.sum(fn(*a) ** 2)
        g1 = jax.grad(f(deform_conv2d), argnums=(0, 1, 2, 3))(
            x, off, mask, wt, bs)
        g2 = jax.grad(f(deform_conv2d_duo), argnums=(0, 1, 2, 3))(
            x, off, mask, wt, bs)
        for a, cg in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(cg),
                                       rtol=1e-5, atol=1e-6)

    def test_duo_tapwise_dcn_matches_fused(self):
        from centerpoly_tpu.models.deform_conv import (
            deform_conv2d, deform_conv2d_duo_tapwise)
        rng = np.random.RandomState(5)
        b, h, w, c, co = 2, 8, 10, 4, 6
        x = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
        off = jnp.asarray(rng.randn(b, h, w, 18) * 3, jnp.float32)
        mask = jnp.asarray(rng.rand(b, h, w, 9), jnp.float32)
        wt = jnp.asarray(rng.randn(3, 3, c, co) * 0.1, jnp.float32)
        bs = jnp.asarray(rng.randn(co) * 0.1, jnp.float32)
        np.testing.assert_allclose(
            np.asarray(deform_conv2d(x, off, mask, wt, bs)),
            np.asarray(deform_conv2d_duo_tapwise(x, off, mask, wt, bs)),
            rtol=1e-5, atol=1e-6)
        f = lambda fn: lambda *a: jnp.sum(fn(*a) ** 2)
        g1 = jax.grad(f(deform_conv2d), argnums=(0, 1, 2, 3, 4))(
            x, off, mask, wt, bs)
        g2 = jax.grad(f(deform_conv2d_duo_tapwise),
                      argnums=(0, 1, 2, 3, 4))(x, off, mask, wt, bs)
        for a, cg in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(cg),
                                       rtol=1e-4, atol=1e-6)

    def test_measure_device_time_scales(self):
        # scan-differencing must scale ~linearly with per-call work
        from centerpoly_tpu.utils.timing import measure_device_time
        x = jnp.ones((256, 256), jnp.float32)

        def one(eps, x):
            return jnp.sum((x + eps) @ x)

        def four(eps, x):
            y = x + eps
            for _ in range(4):
                y = y @ x
            return jnp.sum(y)

        # single-core CPU host under suite load is noisy: retry up to 3x
        # before declaring the scaling broken (median-of-reps can still
        # land on a descheduled lap)
        for attempt in range(3):
            t1 = measure_device_time(one, (x,), reps=3)
            t4 = measure_device_time(four, (x,), reps=3)
            if t4 > 2 * t1:
                return
        assert t4 > 2 * t1, (t1, t4)

    def test_remat_dcn_grads_match_no_remat(self):
        # jax.checkpoint must not change values or grads
        from centerpoly_tpu.models.deform_conv import deform_conv2d
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(1, 8, 8, 4), jnp.float32)
        off = jnp.asarray(rng.randn(1, 8, 8, 18), jnp.float32)
        mask = jnp.asarray(rng.rand(1, 8, 8, 9), jnp.float32)
        w = jnp.asarray(rng.randn(3, 3, 4, 6) * 0.1, jnp.float32)
        b = jnp.zeros((6,), jnp.float32)
        f = lambda fn, *a: jnp.sum(fn(*a) ** 2)
        g1 = jax.grad(lambda *a: f(deform_conv2d, *a), argnums=(0, 1, 2, 3))(
            x, off, mask, w, b)
        g2 = jax.grad(lambda *a: f(jax.checkpoint(deform_conv2d), *a),
                      argnums=(0, 1, 2, 3))(x, off, mask, w, b)
        for a, c in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       rtol=1e-5, atol=1e-5)


class TestFormulationSelection:
    def test_env_overrides_everything(self, monkeypatch):
        from centerpoly_tpu.models import deform_conv as dc
        monkeypatch.setenv("CENTERPOLY_DCN_FORMULATION", "quad")
        assert dc.resolve_formulation(1, 128, 256, 64, False) == "quad"

    def test_typo_env_raises(self, monkeypatch):
        """An explicit-but-mistyped selection must fail loudly, not
        silently fall back to 'auto' (round-3 advisor)."""
        import pytest
        from centerpoly_tpu.models import deform_conv as dc
        for bad in ("quad-tapwise", "rowband", "fussed"):
            monkeypatch.setenv("CENTERPOLY_DCN_FORMULATION", bad)
            with pytest.raises(ValueError, match="not a known"):
                dc.resolve_formulation(1, 128, 256, 64, False)

    def test_measured_table_wins_over_heuristic(self, monkeypatch,
                                                tmp_path):
        from centerpoly_tpu.models import deform_conv as dc
        monkeypatch.delenv("CENTERPOLY_DCN_FORMULATION", raising=False)
        table = tmp_path / "table.json"
        table.write_text('{"1,128,256,64,0": "quad", '
                         '"8,128,256,64,1": "quad_tapwise", '
                         '"1,2,2,2,0": "bogus_name"}')
        monkeypatch.setenv("CENTERPOLY_DCN_AUTO_TABLE", str(table))
        monkeypatch.setattr(dc, "_AUTO_TABLE", None)  # bust the cache
        assert dc.resolve_formulation(1, 128, 256, 64, False) == "quad"
        assert dc.resolve_formulation(
            8, 128, 256, 64, True) == "quad_tapwise"
        # invalid names are dropped at load -> heuristic fallback
        assert dc.resolve_formulation(1, 2, 2, 2, False) == "fused"
        monkeypatch.setattr(dc, "_AUTO_TABLE", None)

    def test_batch_relaxed_lookup(self, monkeypatch, tmp_path):
        """A b=1 measured winner generalizes to other batch sizes of
        the same (h,w,cin) class; remat coercion still protects HBM."""
        from centerpoly_tpu.models import deform_conv as dc
        monkeypatch.delenv("CENTERPOLY_DCN_FORMULATION", raising=False)
        table = tmp_path / "table.json"
        table.write_text('{"1,32,64,256,0": "quad", '
                         '"1,64,128,128,1": "quad"}')
        monkeypatch.setenv("CENTERPOLY_DCN_AUTO_TABLE", str(table))
        monkeypatch.setattr(dc, "_AUTO_TABLE", None)
        assert dc.resolve_formulation(8, 32, 64, 256, False) == "quad"
        # train-time relaxed hit is coerced to the checkpointed sibling
        # whenever the remat guard fires for the bigger batch
        got = dc.resolve_formulation(8, 64, 128, 128, True)
        assert got in ("quad", "quad_tapwise")
        # exact b hit still beats the relaxed one
        table.write_text('{"1,32,64,256,0": "quad", '
                         '"8,32,64,256,0": "tapwise"}')
        monkeypatch.setattr(dc, "_AUTO_TABLE", None)
        assert dc.resolve_formulation(8, 32, 64, 256, False) == "tapwise"
        monkeypatch.setattr(dc, "_AUTO_TABLE", None)

    def test_heuristic_fallback(self, monkeypatch, tmp_path):
        from centerpoly_tpu.models import deform_conv as dc
        monkeypatch.delenv("CENTERPOLY_DCN_FORMULATION", raising=False)
        monkeypatch.setenv("CENTERPOLY_DCN_AUTO_TABLE",
                           str(tmp_path / "missing.json"))
        monkeypatch.setattr(dc, "_AUTO_TABLE", None)
        # big inference shapes default to `duo` (round-4 on-chip
        # full-model A/B: duo 35.0 ms vs tapwise 61.1 ms per frame)
        assert dc.resolve_formulation(1, 128, 256, 64, False) == "duo"
        assert dc.resolve_formulation(1, 8, 8, 8, False) == "fused"
        # remat-needing training shapes use the checkpointed sibling
        assert dc.resolve_formulation(
            8, 128, 256, 64, True) == "duo_tapwise"
        monkeypatch.setattr(dc, "_AUTO_TABLE", None)

    def test_formulations_registry_complete(self):
        from centerpoly_tpu.models.deform_conv import FORMULATIONS
        assert set(FORMULATIONS) == {"fused", "tapwise", "quad",
                                     "quad_tapwise", "duo", "duo_tapwise"}

    @pytest.mark.slow
    def test_auto_table_keys_cover_dla34_inference(self, monkeypatch):
        """The committed dcn_auto_table.json keys (and the keys
        profile_inference.py --write_table / bench.py priming write)
        must be EXACTLY the shape classes resolve_formulation is asked
        for when tracing DLA-34 at the 512x1024 inference config —
        otherwise `auto` silently falls to the heuristic for some
        layer and the model-level selection guarantee breaks."""
        import json
        import os
        import jax
        import jax.numpy as jnp
        from centerpoly_tpu.configs import Config
        from centerpoly_tpu.models import create_model
        from centerpoly_tpu.models import deform_conv as dc

        monkeypatch.delenv("CENTERPOLY_DCN_FORMULATION", raising=False)
        seen = set()
        orig = dc.resolve_formulation

        def spy(b, h, w, cin, train):
            seen.add(f"{b},{h},{w},{cin},{int(bool(train))}")
            return orig(b, h, w, cin, train)

        monkeypatch.setattr(dc, "resolve_formulation", spy)
        cfg = Config(task="polydet", dataset="cityscapes", arch="dla_34",
                     input_h=512, input_w=1024)
        model = create_model(cfg.arch, cfg.heads, cfg.head_conv,
                             dtype=jnp.bfloat16)
        x = jnp.zeros((1, cfg.input_h, cfg.input_w, 3), jnp.float32)
        variables = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), x, train=False))
        jax.eval_shape(lambda v: model.apply(v, x, train=False), variables)

        table_path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "experiments",
            "dcn_auto_table.json")
        with open(table_path) as f:
            committed = set(json.load(f))
        assert seen, "no DCN resolution happened during the trace"
        # The table also carries train-mode rows (",1" keys, written by
        # the bench_train_iou full-model A/B); the inference trace never
        # queries those — compare the inference keys exactly.
        committed_inference = {k for k in committed if k.endswith(",0")}
        assert seen == committed_inference, (
            f"trace queried {sorted(seen)} but the committed table has "
            f"{sorted(committed_inference)}")
        for key in committed - committed_inference:
            assert key.endswith(",1"), f"malformed table key {key}"


class TestDcnKernelConfig:
    """Config.dcn_kernel mirrors dcn_form's owned-env contract for the
    Pallas kernel gate (CENTERPOLY_PALLAS_DCN)."""

    def test_sets_and_restores_env(self, monkeypatch):
        from centerpoly_tpu.configs import Config, config as cfgmod
        # pretend the user exported a value before any Config existed
        monkeypatch.setenv("CENTERPOLY_PALLAS_DCN", "halo:3")
        monkeypatch.setattr(cfgmod, "_CONFIG_OWNED_ENV", {})
        Config(task="polydet", dcn_kernel="rowband:6")
        assert os.environ["CENTERPOLY_PALLAS_DCN"] == "rowband:6"
        # reverting to auto restores the user export, not 'auto'
        Config(task="polydet")
        assert os.environ["CENTERPOLY_PALLAS_DCN"] == "halo:3"

    def test_config_value_reaches_rowband_gate(self, monkeypatch):
        from centerpoly_tpu.configs import Config, config as cfgmod
        from centerpoly_tpu.models import deform_conv as dc
        monkeypatch.delenv("CENTERPOLY_PALLAS_DCN", raising=False)
        monkeypatch.setattr(cfgmod, "_CONFIG_OWNED_ENV", {})
        Config(task="polydet", dcn_kernel="rowband:6")
        use, r = dc.rowband_dcn_mode(64, 128, 32, 32)
        assert r == 6  # mode requested with the config's R
        Config(task="polydet")  # restore

    def test_typo_raises_at_construction(self):
        import pytest
        from centerpoly_tpu.configs import Config
        with pytest.raises(ValueError, match="dcn_kernel"):
            Config(task="polydet", dcn_kernel="rowbnad:4")


class TestInferenceDcnDefault:
    """Inference entrypoints default DCN archs onto the rowband kernel
    (Config.prefer_fast_inference_dcn); training never does."""

    def _clean(self, monkeypatch):
        from centerpoly_tpu.configs import config as cfgmod
        monkeypatch.delenv("CENTERPOLY_PALLAS_DCN", raising=False)
        monkeypatch.setattr(cfgmod, "_CONFIG_OWNED_ENV", {})

    def test_defaults_on_dcn_arch(self, monkeypatch):
        from centerpoly_tpu.configs import Config, config as cfgmod
        self._clean(monkeypatch)
        cfg = Config(task="polydet", arch="dla_34")
        assert cfg.prefer_fast_inference_dcn()
        assert cfg.dcn_kernel == cfgmod.INFERENCE_DCN_KERNEL_DEFAULT
        assert (os.environ["CENTERPOLY_PALLAS_DCN"]
                == cfgmod.INFERENCE_DCN_KERNEL_DEFAULT)
        Config(task="polydet")  # restore owned env

    def test_user_env_wins(self, monkeypatch):
        from centerpoly_tpu.configs import Config
        self._clean(monkeypatch)
        monkeypatch.setenv("CENTERPOLY_PALLAS_DCN", "off")
        cfg = Config(task="polydet", arch="dla_34")
        assert not cfg.prefer_fast_inference_dcn()
        assert os.environ["CENTERPOLY_PALLAS_DCN"] == "off"

    def test_explicit_flag_wins(self, monkeypatch):
        from centerpoly_tpu.configs import Config
        self._clean(monkeypatch)
        cfg = Config(task="polydet", arch="dla_34", dcn_kernel="off")
        assert not cfg.prefer_fast_inference_dcn()
        assert cfg.dcn_kernel == "off"
        Config(task="polydet")  # restore owned env

    def test_noop_on_dcn_free_archs(self, monkeypatch):
        from centerpoly_tpu.configs import Config
        self._clean(monkeypatch)
        for arch in ("smallhourglass", "dlav0_34", "res_18"):
            cfg = Config(task="polydet", arch=arch)
            assert not cfg.prefer_fast_inference_dcn(), arch
            assert os.environ.get("CENTERPOLY_PALLAS_DCN") is None


class TestEvalStep:
    def test_eval(self):
        model = make_tiny_model()
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   (1, 32, 64, 3))
        step = make_eval_step(PolydetLossConfig())
        batch = {k: jnp.asarray(v) for k, v in tiny_batch().items()}
        out, stats = step(state, batch)
        assert out["hm"].shape == (2, 8, 16, 2)
        assert np.isfinite(float(stats["loss"]))


@pytest.mark.slow
def test_graft_entry_multichip():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(min(8, len(jax.devices())))


class TestDryrunBlobBinding:
    """The committed AOT dryrun blob must be bound to the source it was
    traced from (round-4 advisor, severity high): editing the model,
    losses, or train step must make the dryrun live-trace instead of
    silently replaying the stale export."""

    def test_hash_changes_with_source(self, tmp_path):
        import __graft_entry__ as ge
        pkg = tmp_path / "pkg"
        for d in ge._DRYRUN_SOURCE_DIRS:
            (pkg / d).mkdir(parents=True)
            (pkg / d / "m.py").write_text(f"X = '{d}'\n")
        h1 = ge.dryrun_source_hash(str(pkg))
        assert h1 == ge.dryrun_source_hash(str(pkg))  # deterministic
        (pkg / "losses" / "m.py").write_text("X = 'edited loss'\n")
        assert ge.dryrun_source_hash(str(pkg)) != h1
        # a NEW file must also change the hash
        (pkg / "models" / "extra.py").write_text("Y = 1\n")
        h3 = ge.dryrun_source_hash(str(pkg))
        assert h3 != h1

    def test_committed_blob_is_fresh(self):
        """CI freshness check: the committed manifest's source_hash must
        match the current tree. If this fails you edited a module the
        dryrun traces through — regenerate with
          _CENTERPOLY_DRYRUN_CHILD= JAX_PLATFORMS=cpu \\
          XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
          python experiments/export_dryrun_step.py"""
        import json
        import __graft_entry__ as ge
        man = os.path.join(os.path.dirname(os.path.abspath(ge.__file__)),
                           "experiments", "dryrun_step_8.json")
        with open(man) as f:
            manifest = json.load(f)
        assert manifest.get("source_hash") == ge.dryrun_source_hash(), (
            "dryrun_step_8.jaxexport is stale vs the current source — "
            "regenerate (see docstring)")
        assert manifest.get("jax_version") == jax.__version__

    def test_stale_hash_triggers_live_trace(self, monkeypatch):
        """An edited traced-through module (simulated by a diverging
        source hash) must raise _BlobMismatch so dryrun_multichip falls
        through to the live trace."""
        import __graft_entry__ as ge
        monkeypatch.setattr(ge, "dryrun_source_hash", lambda *a: "beef")
        with pytest.raises(ge._BlobMismatch):
            ge._dryrun_replay_exported(8, lambda m: None)


class TestDistributed:
    """Multi-host hook (SURVEY §2.7). Only process-count=1 behavior can be
    exercised here; a real pod launch passes explicit coordinator args."""

    def test_single_process_noop(self):
        from centerpoly_tpu.train.mesh import initialize_distributed
        # explicit single-process launch must not touch the runtime
        assert initialize_distributed(num_processes=1) is False
        import jax
        assert jax.process_count() == 1

    def test_shard_batch_single_process_path(self):
        import jax
        import numpy as np
        from centerpoly_tpu.train.mesh import make_mesh, shard_batch
        mesh = make_mesh(4)
        batch = {"x": np.arange(16, dtype=np.float32).reshape(8, 2)}
        out = shard_batch(batch, mesh)
        assert out["x"].sharding.spec == jax.sharding.PartitionSpec("data")
        np.testing.assert_array_equal(np.asarray(out["x"]), batch["x"])

    def test_config_flags_roundtrip(self):
        from centerpoly_tpu.configs import Config
        cfg = Config.from_args([
            "polydet", "--distributed", "--coordinator_address",
            "10.0.0.1:1234", "--num_processes", "4", "--process_id", "2"])
        assert cfg.distributed and cfg.num_processes == 4
        assert cfg.coordinator_address == "10.0.0.1:1234"
        assert cfg.process_id == 2
