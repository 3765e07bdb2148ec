"""Secondary-task (ctdet) stack: sampler contract, loss formulas,
train step, detector decode round-trip."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from centerpoly_tpu.configs import Config
from centerpoly_tpu.data import CocoPolyAnnotations, CtdetSampler, \
    CityscapesMeta
from centerpoly_tpu.losses import (
    CtdetLossConfig, ctdet_loss, norm_reg_l1_loss, reg_weighted_l1_loss,
    dense_l1_loss, bin_rot_loss)
from centerpoly_tpu.ops.decode import ctdet_decode

from test_data import synthetic_coco


def _cfg(**kw):
    kw.setdefault("task", "ctdet")
    kw.setdefault("dataset", "cityscapes")
    kw.setdefault("input_h", 128)
    kw.setdefault("input_w", 256)
    return Config(**kw)


class TestCtdetSampler:
    def _sampler(self, tmp_path, split="train", **kw):
        path = synthetic_coco(tmp_path)
        cfg = _cfg(**kw)
        meta = CityscapesMeta(str(tmp_path))
        return CtdetSampler(cfg, meta, CocoPolyAnnotations(path),
                            split=split), cfg

    def test_output_contract(self, tmp_path):
        sampler, cfg = self._sampler(tmp_path)
        s = sampler(0)
        oh, ow = cfg.output_h, cfg.output_w
        assert s["input"].shape == (cfg.input_h, cfg.input_w, 3)
        assert s["hm"].shape == (oh, ow, cfg.num_classes)
        assert s["wh"].shape == (cfg.max_objs, 2)
        assert s["reg"].shape == (cfg.max_objs, 2)
        assert s["ind"].shape == (cfg.max_objs,)
        assert s["reg_mask"].sum() > 0
        assert s["hm"].max() == pytest.approx(1.0)
        # peaks land where ind points
        k = int(np.argmax(s["reg_mask"]))
        iy, ix = divmod(int(s["ind"][k]), ow)
        assert s["hm"][iy, ix].max() > 0.9

    def test_val_meta(self, tmp_path):
        sampler, cfg = self._sampler(tmp_path, split="val")
        s = sampler(0)
        assert "meta" in s and "gt_det" in s["meta"]

    def test_cat_spec(self, tmp_path):
        sampler, cfg = self._sampler(tmp_path, cat_spec_wh=True)
        s = sampler(0)
        assert "cat_spec_wh" in s and "wh" not in s
        assert s["cat_spec_mask"].sum() > 0

    def test_dense_wh(self, tmp_path):
        sampler, cfg = self._sampler(tmp_path, dense_wh=True)
        s = sampler(0)
        assert "dense_wh" in s and "wh" not in s
        assert s["dense_wh_mask"].shape == s["dense_wh"].shape


def _fake_batch(b=2, h=16, w=32, c=4, k=8, seed=0):
    rng = np.random.RandomState(seed)
    batch = {
        "hm": np.zeros((b, h, w, c), np.float32),
        "reg_mask": (rng.rand(b, k) > 0.3).astype(np.float32),
        "ind": rng.randint(0, h * w, (b, k)).astype(np.int32),
        "wh": rng.rand(b, k, 2).astype(np.float32) * 10,
        "reg": rng.rand(b, k, 2).astype(np.float32),
    }
    batch["hm"][:, 3, 5, 1] = 1.0
    return batch


class TestCtdetLoss:
    def test_total_composition(self):
        b, h, w, c, k = 2, 16, 32, 4, 8
        rng = np.random.RandomState(1)
        batch = _fake_batch(b, h, w, c, k)
        out = {
            "hm": jnp.asarray(rng.randn(b, h, w, c).astype(np.float32)),
            "wh": jnp.asarray(rng.rand(b, h, w, 2).astype(np.float32)),
            "reg": jnp.asarray(rng.rand(b, h, w, 2).astype(np.float32)),
        }
        cfg = CtdetLossConfig()
        loss, stats = ctdet_loss([out], batch, cfg)
        expect = (cfg.hm_weight * stats["hm_l"]
                  + cfg.wh_weight * stats["wh_l"]
                  + cfg.off_weight * stats["off_l"])
        assert np.allclose(float(loss), float(expect), rtol=1e-6)
        assert np.isfinite(float(loss))

    def test_norm_and_weighted_variants(self):
        rng = np.random.RandomState(2)
        out = jnp.asarray(rng.rand(1, 8, 8, 2).astype(np.float32))
        ind = jnp.asarray(rng.randint(0, 64, (1, 4)).astype(np.int32))
        tgt = jnp.asarray(rng.rand(1, 4, 2).astype(np.float32) + 0.5)
        mask = jnp.ones((1, 4), jnp.float32)
        n = float(norm_reg_l1_loss(out, mask, ind, tgt))
        assert np.isfinite(n)
        m2 = jnp.ones((1, 4, 2), jnp.float32)
        wsum = float(reg_weighted_l1_loss(out, m2, ind, tgt))
        assert np.isfinite(wsum)
        # weighted with full mask == plain masked L1 with same normalizer
        from centerpoly_tpu.losses import reg_l1_loss
        assert np.allclose(
            wsum, float(reg_l1_loss(out, mask, ind, tgt)), rtol=1e-5)

    def test_dense_l1(self):
        pred = jnp.ones((1, 4, 4, 2))
        tgt = jnp.zeros((1, 4, 4, 2))
        mask = jnp.zeros((1, 4, 4, 2)).at[0, 1, 1, :].set(1.0)
        v = float(dense_l1_loss(pred, mask, tgt))
        assert v == pytest.approx(2.0 / (2.0 + 1e-4), rel=1e-5)

    def test_bin_rot_loss_finite_and_masked(self):
        rng = np.random.RandomState(3)
        out = jnp.asarray(rng.randn(1, 8, 8, 8).astype(np.float32))
        ind = jnp.asarray(rng.randint(0, 64, (1, 4)).astype(np.int32))
        rotbin = jnp.asarray(rng.randint(0, 2, (1, 4, 2)).astype(np.int32))
        rotres = jnp.asarray(rng.randn(1, 4, 2).astype(np.float32))
        mask = jnp.ones((1, 4), jnp.float32)
        v = float(bin_rot_loss(out, mask, ind, rotbin, rotres))
        assert np.isfinite(v)
        # all-zero bins -> no residual term, only the two CE terms
        v0 = float(bin_rot_loss(out, mask, ind, jnp.zeros_like(rotbin),
                                rotres))
        assert np.isfinite(v0)


class TestCtdetTrainStep:
    def test_one_step_decreases_nothing_nan(self, tmp_path):
        from centerpoly_tpu.train import create_train_state, make_train_step
        from centerpoly_tpu.train.step import loss_fn_for_task
        from centerpoly_tpu.models import create_model

        cfg = _cfg(arch="res_18", input_h=64, input_w=64, batch_size=2)
        model = create_model(cfg.arch, cfg.heads, cfg.head_conv)
        state = create_train_state(
            model, jax.random.PRNGKey(0), (1, 64, 64, 3),
            base_lr=1e-4, lr_steps=(90,), steps_per_epoch=10)
        from centerpoly_tpu.train.trainer import loss_config_for
        step = make_train_step(loss_config_for(cfg),
                               loss_callable=loss_fn_for_task("ctdet"))
        batch = _fake_batch(b=2, h=16, w=16, c=cfg.num_classes, k=8)
        batch["input"] = np.random.RandomState(0).randn(
            2, 64, 64, 3).astype(np.float32)
        state, stats = step(state, batch)
        assert np.isfinite(float(stats["loss"]))


class TestCtdetDecode:
    def test_round_trip(self):
        b, h, w, c = 1, 32, 32, 4
        hm = np.zeros((b, h, w, c), np.float32)
        hm[0, 10, 20, 2] = 0.9
        wh = np.zeros((b, h, w, 2), np.float32)
        wh[0, 10, 20] = (8.0, 6.0)
        reg = np.zeros((b, h, w, 2), np.float32)
        reg[0, 10, 20] = (0.25, 0.5)
        dets = np.asarray(ctdet_decode(
            jnp.asarray(hm), jnp.asarray(wh), reg=jnp.asarray(reg), k=4))
        top = dets[0, 0]
        assert top[4] == pytest.approx(0.9, rel=1e-5)
        assert top[5] == 2
        cx, cy = 20 + 0.25, 10 + 0.5
        assert top[:4] == pytest.approx(
            [cx - 4, cy - 3, cx + 4, cy + 3], rel=1e-5)


class TestCtdetDetector:
    def test_detector_runs(self):
        from centerpoly_tpu.infer.detector import CtdetDetector
        cfg = _cfg(arch="res_18", input_h=64, input_w=64, K=8)
        det = CtdetDetector(cfg)
        img = (np.random.RandomState(0).rand(96, 128, 3) * 255).astype(
            np.uint8)
        ret = det.run(img)
        assert set(ret["results"].keys()) == set(
            range(1, cfg.num_classes + 1))
        for j, rows in ret["results"].items():
            assert rows.shape[1] == 5
        assert ret["tot"] > 0
