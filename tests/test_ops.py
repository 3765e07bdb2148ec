import numpy as np
import jax.numpy as jnp
import pytest

from centerpoly_tpu.ops import (
    gather_feat_nhwc,
    pseudo_nms,
    topk_heatmap,
    polydet_decode,
    ctdet_decode,
    soft_nms,
    soft_nms_batch,
)


class TestGather:
    def test_gather_nhwc(self):
        rng = np.random.RandomState(0)
        feat = jnp.asarray(rng.rand(2, 4, 6, 3).astype(np.float32))
        ind = jnp.asarray([[0, 5, 23], [1, 2, 3]])
        out = np.asarray(gather_feat_nhwc(feat, ind))
        f = np.asarray(feat).reshape(2, 24, 3)
        for b in range(2):
            for k, i in enumerate(np.asarray(ind)[b]):
                np.testing.assert_allclose(out[b, k], f[b, i])


class TestPseudoNms:
    def test_keeps_only_local_maxima(self):
        hm = np.zeros((1, 8, 8, 1), np.float32)
        hm[0, 3, 3, 0] = 0.9
        hm[0, 3, 4, 0] = 0.5  # adjacent, suppressed
        hm[0, 6, 6, 0] = 0.7  # far, kept
        out = np.asarray(pseudo_nms(jnp.asarray(hm)))
        assert out[0, 3, 3, 0] == pytest.approx(0.9)
        assert out[0, 3, 4, 0] == 0.0
        assert out[0, 6, 6, 0] == pytest.approx(0.7)


class TestTopK:
    def test_positions_and_classes(self):
        hm = np.zeros((1, 8, 8, 3), np.float32)
        peaks = [(2, 3, 0, 0.9), (5, 6, 2, 0.8), (7, 1, 1, 0.7)]
        for y, x, c, v in peaks:
            hm[0, y, x, c] = v
        scores, inds, clses, ys, xs = topk_heatmap(jnp.asarray(hm), 3)
        scores, clses = np.asarray(scores)[0], np.asarray(clses)[0]
        ys, xs = np.asarray(ys)[0], np.asarray(xs)[0]
        np.testing.assert_allclose(scores, [0.9, 0.8, 0.7])
        np.testing.assert_allclose(clses, [0, 2, 1])
        np.testing.assert_allclose(ys, [2, 5, 7])
        np.testing.assert_allclose(xs, [3, 6, 1])
        # flat inds decode to (y, x)
        inds = np.asarray(inds)[0]
        np.testing.assert_allclose(inds // 8, ys)
        np.testing.assert_allclose(inds % 8, xs)


def make_polydet_maps(rep="cartesian", n=4, h=16, w=16, c=2):
    """One clear peak with a known polygon."""
    rng = np.random.RandomState(42)
    hm = np.zeros((1, h, w, c), np.float32)
    hm[0, 5, 7, 1] = 0.95
    poly = rng.randn(1, h, w, 2 * n).astype(np.float32)
    depth = rng.rand(1, h, w, 1).astype(np.float32)
    reg = rng.rand(1, h, w, 2).astype(np.float32) * 0.5
    if rep != "cartesian":
        # radii positive, angles sorted per position for realism
        poly[..., 0::2] = np.abs(poly[..., 0::2]) * 3
        poly[..., 1::2] = np.sort(rng.rand(1, h, w, n) * 2 * np.pi, axis=-1)
    return hm, poly, depth, reg


class TestPolydetDecode:
    def test_cartesian_layout(self):
        n = 4
        hm, poly, depth, reg = make_polydet_maps(n=n)
        dets = np.asarray(polydet_decode(
            jnp.asarray(hm), jnp.asarray(poly), jnp.asarray(depth),
            jnp.asarray(reg), k=5))
        assert dets.shape == (1, 5, 6 + 2 * n + 1)
        top = dets[0, 0]
        assert top[4] == pytest.approx(0.95)  # score
        assert top[5] == 1  # class
        # center = (x + reg_x, y + reg_y)
        cx = 7 + reg[0, 5, 7, 0]
        cy = 5 + reg[0, 5, 7, 1]
        expect_x = poly[0, 5, 7, 0::2] + cx
        expect_y = poly[0, 5, 7, 1::2] + cy
        np.testing.assert_allclose(top[6:-1:2], expect_x, rtol=1e-5)
        np.testing.assert_allclose(top[7::2], expect_y, rtol=1e-5)
        # bbox = min/max of vertices
        np.testing.assert_allclose(top[0], expect_x.min(), rtol=1e-5)
        np.testing.assert_allclose(top[3], expect_y.max(), rtol=1e-5)
        # depth passthrough
        assert top[-1] == pytest.approx(depth[0, 5, 7, 0])

    def test_polar(self):
        n = 4
        hm, poly, depth, reg = make_polydet_maps(rep="polar", n=n)
        dets = np.asarray(polydet_decode(
            jnp.asarray(hm), jnp.asarray(poly), jnp.asarray(depth),
            jnp.asarray(reg), k=3, rep="polar"))
        top = dets[0, 0]
        cx = 7 + reg[0, 5, 7, 0]
        cy = 5 + reg[0, 5, 7, 1]
        r = poly[0, 5, 7, 0::2]
        t = poly[0, 5, 7, 1::2]
        np.testing.assert_allclose(top[6:-1:2], r * np.cos(t) + cx, rtol=1e-4)
        np.testing.assert_allclose(top[7::2], r * np.sin(t) + cy, rtol=1e-4)

    def test_polar_fixed_angle_table(self):
        n = 4
        hm, poly, depth, reg = make_polydet_maps(rep="polar", n=n)
        dets = np.asarray(polydet_decode(
            jnp.asarray(hm), jnp.asarray(poly), jnp.asarray(depth),
            jnp.asarray(reg), k=3, rep="polar_fixed"))
        top = dets[0, 0]
        cx = 7 + reg[0, 5, 7, 0]
        r = poly[0, 5, 7, 0::2]
        fixed = 2 * 3.14 - (2 * 3.14 / (2 * n)) * np.arange(0, 2 * n, 2)
        np.testing.assert_allclose(top[6:-1:2], r * np.cos(fixed) + cx,
                                   rtol=1e-4)

    def test_no_reg_adds_half(self):
        n = 4
        hm, poly, depth, _ = make_polydet_maps(n=n)
        dets = np.asarray(polydet_decode(
            jnp.asarray(hm), jnp.asarray(poly), jnp.asarray(depth),
            None, k=3))
        top = dets[0, 0]
        np.testing.assert_allclose(
            top[6], poly[0, 5, 7, 0] + 7.5, rtol=1e-5)


class TestCtdetDecode:
    def test_boxes(self):
        hm = np.zeros((1, 8, 8, 2), np.float32)
        hm[0, 4, 4, 0] = 0.9
        wh = np.zeros((1, 8, 8, 2), np.float32)
        wh[0, 4, 4] = [4.0, 2.0]
        dets = np.asarray(ctdet_decode(jnp.asarray(hm), jnp.asarray(wh), k=2))
        top = dets[0, 0]
        np.testing.assert_allclose(top[:4], [4.5 - 2, 4.5 - 1, 4.5 + 2, 4.5 + 1])
        assert top[4] == pytest.approx(0.9)
        assert top[5] == 0


class TestSoftNms:
    def test_gaussian_decay(self):
        dets = np.array([
            [0, 0, 10, 10, 0.9],
            [1, 1, 11, 11, 0.8],   # heavy overlap -> decayed
            [50, 50, 60, 60, 0.7],  # disjoint -> untouched
        ], dtype=np.float32)
        keep = soft_nms(dets, method=2)
        assert 0 in keep and 2 in keep
        assert dets[2, 4] == pytest.approx(0.7)
        assert dets[1, 4] < 0.8  # decayed

    def test_hard_nms_suppresses(self):
        dets = np.array([
            [0, 0, 10, 10, 0.9],
            [0, 0, 10, 10, 0.8],
        ], dtype=np.float32)
        keep = soft_nms(dets, method=0, thresh=0.01)
        assert list(keep) == [0]

    def test_device_variant_matches_host(self):
        rng = np.random.RandomState(3)
        xy = rng.rand(16, 2) * 50
        wh = rng.rand(16, 2) * 20 + 5
        boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
        scores = rng.rand(16).astype(np.float32)
        host = np.concatenate([boxes, scores[:, None]], axis=1)
        soft_nms(host, method=2, thresh=0.0)
        dev = np.asarray(soft_nms_batch(jnp.asarray(boxes),
                                        jnp.asarray(scores), thresh=0.0))
        np.testing.assert_allclose(np.sort(dev), np.sort(host[:, 4]),
                                   rtol=1e-4)


def test_hard_nms_batch_matches_greedy():
    import jax.numpy as jnp
    from centerpoly_tpu.ops.nms import hard_nms_batch

    rng = np.random.RandomState(0)
    n = 32
    centers = rng.rand(n, 2) * 100
    wh = rng.rand(n, 2) * 20 + 5
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2],
                           1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    keep = np.asarray(hard_nms_batch(jnp.asarray(boxes),
                                     jnp.asarray(scores), 0.5))

    def ref_nms(boxes, scores, t):
        order = np.argsort(-scores)
        kept = np.zeros(len(scores), bool)
        chosen = []
        for i in order:
            ok = True
            for j in chosen:
                x1 = max(boxes[i, 0], boxes[j, 0])
                y1 = max(boxes[i, 1], boxes[j, 1])
                x2 = min(boxes[i, 2], boxes[j, 2])
                y2 = min(boxes[i, 3], boxes[j, 3])
                inter = max(x2 - x1, 0) * max(y2 - y1, 0)
                a1 = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
                a2 = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
                if inter / (a1 + a2 - inter) > t:
                    ok = False
                    break
            if ok:
                kept[i] = True
                chosen.append(i)
        return kept

    assert (keep == ref_nms(boxes, scores, 0.5)).all()
