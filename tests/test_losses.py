"""Loss unit tests, cross-checked against the reference formulas.

The torch cross-checks re-implement the reference math inline (from the
documented formulas in SURVEY.md §2.3) rather than importing reference code.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from centerpoly_tpu.losses import (
    clamped_sigmoid,
    focal_loss,
    reg_l1_loss,
    poly_loss,
    order_loss,
    poly_iou_loss,
    PolydetLossConfig,
    polydet_loss,
)
from centerpoly_tpu.losses.poly import poly_l1_loss, _unwrap_angles


def torch_focal_reference(pred, gt):
    """Reference CornerNet focal (losses.py:146-171 formula)."""
    import torch
    pred = torch.tensor(pred)
    gt = torch.tensor(gt)
    pos_inds = gt.eq(1).float()
    neg_inds = gt.lt(1).float()
    neg_weights = torch.pow(1 - gt, 4)
    pos_loss = torch.log(pred) * torch.pow(1 - pred, 2) * pos_inds
    neg_loss = torch.log(1 - pred) * torch.pow(pred, 2) * neg_weights * neg_inds
    num_pos = pos_inds.sum()
    if num_pos == 0:
        return float(-neg_loss.sum())
    return float(-(pos_loss.sum() + neg_loss.sum()) / num_pos)


class TestFocal:
    def test_matches_reference_formula(self):
        rng = np.random.RandomState(0)
        gt = np.zeros((2, 8, 8, 3), np.float32)
        gt[0, 2, 2, 0] = 1.0
        gt[1, 5, 5, 1] = 1.0
        gt[0, 2, 3, 0] = 0.6  # penalty-reduced neighbor
        pred = np.clip(rng.rand(2, 8, 8, 3).astype(np.float32), 1e-4, 1 - 1e-4)
        ours = float(focal_loss(jnp.asarray(pred), jnp.asarray(gt)))
        ref = torch_focal_reference(pred, gt)
        # XLA-CPU f32 log is a fast approximation (~1e-4 rel vs libm)
        assert ours == pytest.approx(ref, rel=1e-3)

    def test_no_positives(self):
        pred = np.full((1, 4, 4, 1), 0.3, np.float32)
        gt = np.zeros((1, 4, 4, 1), np.float32)
        ours = float(focal_loss(jnp.asarray(pred), jnp.asarray(gt)))
        ref = torch_focal_reference(pred, gt)
        # XLA-CPU f32 log is a fast approximation (~1e-4 rel vs libm)
        assert ours == pytest.approx(ref, rel=1e-3)

    def test_clamped_sigmoid(self):
        x = jnp.asarray([-100.0, 0.0, 100.0])
        y = np.asarray(clamped_sigmoid(x))
        assert y[0] == pytest.approx(1e-4)
        assert y[1] == pytest.approx(0.5)
        assert y[2] == pytest.approx(1 - 1e-4)


class TestRegL1:
    def test_matches_reference_formula(self):
        rng = np.random.RandomState(1)
        b, h, w, d, k = 2, 8, 8, 2, 5
        out = rng.randn(b, h, w, d).astype(np.float32)
        ind = rng.randint(0, h * w, (b, k))
        target = rng.randn(b, k, d).astype(np.float32)
        mask = (rng.rand(b, k) > 0.4).astype(np.float32)
        ours = float(reg_l1_loss(jnp.asarray(out), jnp.asarray(mask),
                                 jnp.asarray(ind), jnp.asarray(target)))
        # reference: gather, expand mask, sum L1 / (expanded mask sum + 1e-4)
        flat = out.reshape(b, h * w, d)
        pred = np.stack([flat[i, ind[i]] for i in range(b)])
        m = np.repeat(mask[..., None], d, axis=-1)
        ref = np.abs(pred * m - target * m).sum() / (m.sum() + 1e-4)
        assert ours == pytest.approx(ref, rel=1e-5)


class TestPolyL1:
    def _mk(self, rep, n=4, b=2, k=3):
        rng = np.random.RandomState(2)
        pred = rng.randn(b, k, 2 * n).astype(np.float32)
        tgt = rng.randn(b, k, 2 * n).astype(np.float32)
        mask = (rng.rand(b, k) > 0.3).astype(np.float32)
        return pred, tgt, mask

    def test_cartesian(self):
        pred, tgt, mask = self._mk("cartesian")
        ours = float(poly_l1_loss(jnp.asarray(pred), jnp.asarray(tgt),
                                  jnp.asarray(mask), "cartesian"))
        m = np.repeat(mask[..., None], pred.shape[-1], -1)
        ref = np.abs(pred * m - tgt * m).sum() / (m.sum() + 1e-6)
        assert ours == pytest.approx(ref, rel=1e-5)

    def test_polar(self):
        pred, tgt, mask = self._mk("polar")
        ours = float(poly_l1_loss(jnp.asarray(pred), jnp.asarray(tgt),
                                  jnp.asarray(mask), "polar"))
        m = np.repeat(mask[..., None], pred.shape[-1], -1)
        ma = np.zeros(pred.shape[-1]); ma[0::2] = 1
        ref = np.abs(pred * m * ma - tgt * m * ma).sum()
        ref += np.sum(1 - np.cos(pred * m * (1 - ma) - tgt * m * (1 - ma)))
        ref /= m.sum() + 1e-6
        assert ours == pytest.approx(ref, rel=1e-4)

    def test_polar_fixed_radii_only(self):
        pred, tgt, mask = self._mk("polar_fixed")
        ours = float(poly_l1_loss(jnp.asarray(pred), jnp.asarray(tgt),
                                  jnp.asarray(mask), "polar_fixed"))
        m = np.repeat(mask[..., None], pred.shape[-1], -1)
        ma = np.zeros(pred.shape[-1]); ma[0::2] = 1
        ref = np.abs(pred * m * ma - tgt * m * ma).sum() / (m.sum() + 1e-6)
        assert ours == pytest.approx(ref, rel=1e-5)

    def test_deadzone(self):
        pred, tgt, mask = self._mk("cartesian")
        pred *= 50  # make some errors exceed alpha=20
        ours = float(poly_l1_loss(jnp.asarray(pred), jnp.asarray(tgt),
                                  jnp.asarray(mask), "cartesian",
                                  deadzone=20.0))
        m = np.repeat(mask[..., None], pred.shape[-1], -1)
        err = np.abs(pred * m - tgt * m)
        err = err * (err >= 20.0)
        ref = err.sum() / (m.sum() + 1e-6)
        assert ours == pytest.approx(ref, rel=1e-5)


class TestPolyLossDispatch:
    """poly_loss kind/rep routing (losses/poly.py poly_loss)."""

    def _args(self):
        rng = np.random.RandomState(0)
        b, k, h, w, n2 = 1, 4, 8, 8, 8
        out = jnp.asarray(rng.randn(b, h, w, n2), jnp.float32)
        mask = jnp.ones((b, k), jnp.float32)
        ind = jnp.asarray(rng.randint(0, h * w, (b, k)), jnp.int32)
        tgt = jnp.asarray(rng.randn(b, k, n2) * 5, jnp.float32)
        return out, mask, ind, tgt

    def test_relu_cartesian_is_pure_deadzone(self):
        """relu + cartesian must NOT add the IoU term: poly_iou_loss
        interprets pairs as (r, theta); only the deadzone L1 applies
        (the reference's relu+cartesian main term, losses.py:913-918)."""
        out, mask, ind, tgt = self._args()
        got = float(poly_loss(out, mask, ind, tgt, rep="cartesian",
                              kind="relu"))
        from centerpoly_tpu.losses.poly import poly_l1_loss
        from centerpoly_tpu.ops.gather import gather_feat_nhwc
        pred = gather_feat_nhwc(out, ind)
        want = float(poly_l1_loss(pred, tgt, mask, "cartesian",
                                  deadzone=20.0))
        assert got == pytest.approx(want, rel=1e-6)

    def test_relu_polar_includes_iou(self):
        """relu + polar = IoU + plain polar L1 (ref losses.py:871-908:
        the IoU branch runs for relu; the deadzone applies only to
        cartesian)."""
        out, mask, ind, tgt = self._args()
        got = float(poly_loss(out, mask, ind, tgt, rep="polar",
                              kind="relu"))
        from centerpoly_tpu.losses.poly import poly_iou_loss, poly_l1_loss
        from centerpoly_tpu.ops.gather import gather_feat_nhwc
        pred = gather_feat_nhwc(out, ind)
        want = float(poly_iou_loss(pred, tgt, mask)
                     + poly_l1_loss(pred, tgt, mask, "polar"))
        assert got == pytest.approx(want, rel=1e-6)

    def test_iou_cartesian_rejected(self):
        out, mask, ind, tgt = self._args()
        with pytest.raises(ValueError, match="polar"):
            poly_loss(out, mask, ind, tgt, rep="cartesian", kind="iou")

    def test_iou_cartesian_rejected_at_config_time(self):
        """The kind/rep incompatibility must surface at Config
        construction with a clear message, not mid-trace (round-3
        advisor)."""
        from centerpoly_tpu.configs import Config
        for kind in ("iou", "l1+iou"):
            with pytest.raises(ValueError, match="polar"):
                Config(task="polydet", dataset="cityscapes",
                       poly_loss=kind, rep="cartesian")
        # polar reps stay constructible
        Config(task="polydet", dataset="cityscapes",
               poly_loss="l1+iou", rep="polar")


class TestOrderLoss:
    def test_unwrap(self):
        # negative before any positive stays; negative after positive +2*3.14
        a = jnp.asarray([[-0.5, 0.3, -0.2, 1.0]])
        out = np.asarray(_unwrap_angles(a))[0]
        np.testing.assert_allclose(
            out, [-0.5, 0.3, -0.2 + 6.28, 1.0], rtol=1e-6)

    def test_ordered_angles_zero_loss(self):
        n = 8
        angles = np.sort(np.random.RandomState(0).rand(1, 1, n) * 6.0, -1)
        poly = np.zeros((1, 1, 2 * n), np.float32)
        poly[..., 1::2] = angles
        poly[..., 0::2] = 5.0
        mask = np.ones((1, 1), np.float32)
        loss = float(order_loss(jnp.asarray(poly), jnp.asarray(mask)))
        assert loss == pytest.approx(0.0, abs=1e-6)

    def test_inverted_angles_penalized(self):
        n = 4
        poly = np.zeros((1, 1, 2 * n), np.float32)
        poly[..., 1::2] = [3.0, 2.0, 1.0, 0.5]  # strictly decreasing
        mask = np.ones((1, 1), np.float32)
        loss = float(order_loss(jnp.asarray(poly), jnp.asarray(mask)))
        # sum of all positive (a_j - a_k), j<k = (1+2+2.5)+(1+1.5)+(0.5)=8.5
        assert loss == pytest.approx(8.5 / (10 * 1 + 1e-4), rel=1e-4)


class TestPolyIoU:
    def test_perfect_prediction_zero_loss(self):
        rng = np.random.RandomState(5)
        n, b, k = 8, 1, 2
        ang = np.sort(rng.rand(b, k, n) * 2 * np.pi, -1)
        rad = rng.rand(b, k, n) * 10 + 2
        poly = np.zeros((b, k, 2 * n), np.float32)
        poly[..., 0::2] = rad
        poly[..., 1::2] = ang
        mask = np.ones((b, k), np.float32)
        loss = float(poly_iou_loss(jnp.asarray(poly), jnp.asarray(poly),
                                   jnp.asarray(mask)))
        assert loss == pytest.approx(0.0, abs=1e-3)

    def test_worse_prediction_higher_loss(self):
        rng = np.random.RandomState(6)
        n, b, k = 8, 1, 2
        ang = np.sort(rng.rand(b, k, n) * 2 * np.pi, -1)
        rad = rng.rand(b, k, n) * 10 + 2
        gt = np.zeros((b, k, 2 * n), np.float32)
        gt[..., 0::2] = rad
        gt[..., 1::2] = ang
        mask = np.ones((b, k), np.float32)

        near = gt.copy(); near[..., 0::2] += 0.5
        far = gt.copy(); far[..., 0::2] += 4.0
        l_near = float(poly_iou_loss(jnp.asarray(near), jnp.asarray(gt),
                                     jnp.asarray(mask)))
        l_far = float(poly_iou_loss(jnp.asarray(far), jnp.asarray(gt),
                                    jnp.asarray(mask)))
        assert 0 < l_near < l_far < 1

    def test_masked_objects_ignored(self):
        rng = np.random.RandomState(7)
        n = 8
        ang = np.sort(rng.rand(1, 2, n) * 2 * np.pi, -1)
        rad = rng.rand(1, 2, n) * 10 + 2
        gt = np.zeros((1, 2, 2 * n), np.float32)
        gt[..., 0::2] = rad
        gt[..., 1::2] = ang
        pred = gt.copy()
        pred[0, 1] = 0.0  # garbage in masked slot
        mask = np.array([[1.0, 0.0]], np.float32)
        loss = float(poly_iou_loss(jnp.asarray(pred), jnp.asarray(gt),
                                   jnp.asarray(mask)))
        assert loss == pytest.approx(0.0, abs=1e-3)

    @pytest.mark.slow
    def test_gradient_flows(self):
        rng = np.random.RandomState(8)
        n = 8
        ang = np.sort(rng.rand(1, 1, n) * 2 * np.pi, -1)
        rad = rng.rand(1, 1, n) * 10 + 2
        gt = np.zeros((1, 1, 2 * n), np.float32)
        gt[..., 0::2] = rad
        gt[..., 1::2] = ang
        pred = gt + 0.3
        mask = np.ones((1, 1), np.float32)
        g = jax.grad(lambda p: poly_iou_loss(p, jnp.asarray(gt),
                                             jnp.asarray(mask)))(
            jnp.asarray(pred))
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g).sum()) > 0


class TestPolydetLoss:
    def _batch(self, rep="cartesian", n=4, b=2, k=6, h=16, w=16, c=3):
        rng = np.random.RandomState(9)
        batch = {
            "hm": np.zeros((b, h, w, c), np.float32),
            "reg_mask": (rng.rand(b, k) > 0.5).astype(np.float32),
            "ind": rng.randint(0, h * w, (b, k)),
            "poly": rng.randn(b, k, 2 * n).astype(np.float32),
            "pseudo_depth": rng.rand(b, k, 1).astype(np.float32),
            "reg": rng.rand(b, k, 2).astype(np.float32),
        }
        batch["hm"][0, 3, 3, 0] = 1.0
        if rep != "cartesian":
            batch["poly"][..., 0::2] = np.abs(batch["poly"][..., 0::2]) * 5
            batch["poly"][..., 1::2] = np.sort(
                rng.rand(b, k, n) * 2 * np.pi, -1)
        out = {
            "hm": rng.randn(b, h, w, c).astype(np.float32),
            "poly": rng.randn(b, h, w, 2 * n).astype(np.float32),
            "pseudo_depth": rng.rand(b, h, w, 1).astype(np.float32),
            "reg": rng.rand(b, h, w, 2).astype(np.float32),
        }
        return {k_: jnp.asarray(v) for k_, v in out.items()}, \
               {k_: jnp.asarray(v) for k_, v in batch.items()}

    def test_l1_config(self):
        out, batch = self._batch()
        cfg = PolydetLossConfig()
        loss, stats = polydet_loss([out], batch, cfg)
        assert np.isfinite(float(loss))
        assert set(stats) == {"loss", "hm_l", "off_l", "poly_l", "depth_l"}
        expected = (stats["hm_l"] + stats["off_l"] + stats["poly_l"]
                    + 0.1 * stats["depth_l"])
        assert float(loss) == pytest.approx(float(expected), rel=1e-5)

    def test_full_paper_config(self):
        # polar + iou + order: the v2 paper loss
        out, batch = self._batch(rep="polar")
        cfg = PolydetLossConfig(rep="polar", poly_loss="iou", poly_order=True)
        loss, stats = polydet_loss([out], batch, cfg)
        assert np.isfinite(float(loss))
        assert "order_l" in stats

    def test_two_stacks_average(self):
        out, batch = self._batch()
        cfg = PolydetLossConfig()
        l1, _ = polydet_loss([out], batch, cfg)
        l2, _ = polydet_loss([out, out], batch, cfg)
        assert float(l1) == pytest.approx(float(l2), rel=1e-5)

    def test_gradable(self):
        out, batch = self._batch()
        cfg = PolydetLossConfig()

        def f(hm):
            o = dict(out); o["hm"] = hm
            return polydet_loss([o], batch, cfg)[0]

        g = jax.grad(f)(out["hm"])
        assert np.all(np.isfinite(np.asarray(g)))
