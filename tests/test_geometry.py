import numpy as np
import jax
import jax.numpy as jnp
import pytest

from centerpoly_tpu.geometry import (
    get_affine_transform,
    affine_transform_points,
    transform_preds,
    warp_affine,
    gaussian_radius,
    splat_gaussian,
    splat_ellipse_gaussian,
    polar_to_cartesian,
    cartesian_to_polar,
    polygon_area,
    clip_convex,
    polygon_area_masked,
    polygon_intersection_area,
    polygon_iou,
)


def rasterized_intersection(p, q, res=512, pad=0.5):
    """Trusted slow reference: rasterize both polygons, count overlap."""
    from PIL import Image, ImageDraw

    allpts = np.concatenate([p, q], axis=0)
    lo = allpts.min(axis=0) - pad
    hi = allpts.max(axis=0) + pad
    scale = res / max(hi - lo)

    def mask(poly):
        img = Image.new("L", (res, res), 0)
        pts = [(float((x - lo[0]) * scale), float((y - lo[1]) * scale))
               for x, y in poly]
        ImageDraw.Draw(img).polygon(pts, outline=1, fill=1)
        return np.array(img)

    inter_px = np.sum(mask(p) & mask(q))
    return inter_px / (scale * scale)


class TestAffine:
    def test_identity_roundtrip(self):
        c = np.array([100.0, 60.0])
        t_fwd = get_affine_transform(c, 200.0, 0, (128, 128))
        t_inv = get_affine_transform(c, 200.0, 0, (128, 128), inv=True)
        pts = np.array([[10.0, 20.0], [50.0, 90.0], [0.0, 0.0]])
        out = affine_transform_points(affine_transform_points(pts, t_fwd), t_inv)
        np.testing.assert_allclose(out, pts, atol=1e-3)

    def test_center_maps_to_canvas_center(self):
        c = np.array([512.0, 256.0])
        t = get_affine_transform(c, 1024.0, 0, (256, 128))
        out = affine_transform_points(np.array([c]), t)[0]
        np.testing.assert_allclose(out, [128.0, 64.0], atol=1e-3)

    def test_scale(self):
        # A window of side s maps to output width: dx of s/2 -> half canvas.
        c = np.array([0.0, 0.0])
        t = get_affine_transform(c, 100.0, 0, (200, 200))
        p0 = affine_transform_points(np.array([[0.0, 0.0]]), t)[0]
        p1 = affine_transform_points(np.array([[50.0, 0.0]]), t)[0]
        np.testing.assert_allclose(p1[0] - p0[0], 100.0, atol=1e-3)

    def test_transform_preds_matches_inverse(self):
        c = np.array([1024.0, 512.0])
        s = 2048.0
        coords = np.array([[10.0, 20.0], [200.0, 100.0]])
        out = transform_preds(coords, c, s, (512, 256))
        t_inv = get_affine_transform(c, s, 0, (512, 256), inv=True)
        expected = affine_transform_points(coords, t_inv)
        np.testing.assert_allclose(out, expected, atol=1e-3)

    def test_warp_affine_identity(self):
        img = jnp.arange(48.0).reshape(4, 4, 3)
        t = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        out = warp_affine(img, t, (4, 4))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)

    def test_warp_affine_matches_cv2(self):
        cv2 = pytest.importorskip("cv2")
        rng = np.random.RandomState(0)
        img = rng.rand(32, 48, 3).astype(np.float32)
        c = np.array([24.0, 16.0])
        t = get_affine_transform(c, 40.0, 0, (64, 32))
        ours = np.asarray(warp_affine(jnp.asarray(img), t, (32, 64)))
        ref = cv2.warpAffine(img, t.astype(np.float32), (64, 32),
                             flags=cv2.INTER_LINEAR)
        # cv2 uses fixed-point bilinear (1/32-px coefficient quantization);
        # our float warp is more accurate, so compare loosely.
        diff = np.abs(ours[2:-2, 2:-2] - ref[2:-2, 2:-2])
        assert diff.max() < 0.1
        assert diff.mean() < 0.02


class TestGaussian:
    def test_radius_positive_and_monotone(self):
        r_small = gaussian_radius((10, 10))
        r_big = gaussian_radius((100, 100))
        assert 0 < r_small < r_big

    def test_splat_peak_at_center(self):
        hm = np.zeros((64, 64), np.float32)
        splat_gaussian(hm, (32, 20), 5)
        assert hm[20, 32] == pytest.approx(1.0)
        assert hm[20, 38] == 0.0  # outside radius box
        assert hm.max() == pytest.approx(1.0)

    def test_splat_max_merge(self):
        hm = np.zeros((64, 64), np.float32)
        splat_gaussian(hm, (30, 30), 6)
        before = hm.copy()
        splat_gaussian(hm, (34, 30), 6)
        assert np.all(hm >= before - 1e-7)

    def test_ellipse_splat(self):
        hm = np.zeros((64, 64), np.float32)
        splat_ellipse_gaussian(hm, (32, 32), radius_x=10, radius_y=4)
        assert hm[32, 32] == pytest.approx(1.0)
        # wider along x than y
        assert hm[32, 40] > hm[40, 32]

    def test_splat_near_border(self):
        hm = np.zeros((32, 32), np.float32)
        splat_gaussian(hm, (0, 0), 5)
        splat_gaussian(hm, (31, 31), 5)
        assert hm[0, 0] == pytest.approx(1.0)
        assert hm[31, 31] == pytest.approx(1.0)


class TestPolarCart:
    def test_roundtrip(self):
        rng = np.random.RandomState(1)
        xy = jnp.asarray(rng.randn(20, 2) * 10)
        rt = cartesian_to_polar(xy)
        back = polar_to_cartesian(rt)
        np.testing.assert_allclose(np.asarray(back), np.asarray(xy), atol=1e-4)

    def test_quadrants(self):
        # reference quadrant fix: theta in [0, 2pi)
        pts = jnp.asarray([[1.0, 1.0], [-1.0, 1.0], [-1.0, -1.0], [1.0, -1.0]])
        rt = np.asarray(cartesian_to_polar(pts))
        np.testing.assert_allclose(
            rt[:, 1], [np.pi / 4, 3 * np.pi / 4, 5 * np.pi / 4, 7 * np.pi / 4],
            atol=1e-4)


def square(cx, cy, half):
    return jnp.asarray([
        [cx - half, cy - half], [cx + half, cy - half],
        [cx + half, cy + half], [cx - half, cy + half]], dtype=jnp.float32)


class TestPolygonArea:
    def test_unit_square(self):
        assert float(polygon_area(square(0, 0, 0.5))) == pytest.approx(1.0)

    def test_orientation_invariant(self):
        sq = square(3, -2, 2.0)
        assert float(polygon_area(sq[::-1])) == pytest.approx(16.0)

    def test_triangle(self):
        tri = jnp.asarray([[0.0, 0.0], [4.0, 0.0], [0.0, 3.0]])
        assert float(polygon_area(tri)) == pytest.approx(6.0)


class TestClipConvex:
    def test_fully_inside(self):
        inner = square(0, 0, 1.0)
        outer = square(0, 0, 5.0)
        poly, valid = clip_convex(inner, outer)
        a = float(polygon_area_masked(poly, valid.astype(jnp.float32)))
        assert a == pytest.approx(4.0, rel=1e-5)

    def test_half_overlap(self):
        a = square(0, 0, 1.0)      # [-1,1]^2, area 4
        b = square(1, 0, 1.0)      # [0,2]x[-1,1]
        poly, valid = clip_convex(a, b)
        ar = float(polygon_area_masked(poly, valid.astype(jnp.float32)))
        assert ar == pytest.approx(2.0, rel=1e-5)

    def test_no_overlap(self):
        a = square(0, 0, 1.0)
        b = square(10, 10, 1.0)
        poly, valid = clip_convex(a, b)
        ar = float(polygon_area_masked(poly, valid.astype(jnp.float32)))
        assert ar == pytest.approx(0.0, abs=1e-6)


class TestIntersectionArea:
    def test_identical(self):
        sq = square(1, 1, 2.0)
        a = float(polygon_intersection_area(sq, sq))
        assert a == pytest.approx(16.0, rel=1e-4)

    def test_half_overlap_squares(self):
        a = float(polygon_intersection_area(square(0, 0, 1.0), square(1, 0, 1.0)))
        assert a == pytest.approx(2.0, rel=1e-4)

    def test_contained(self):
        a = float(polygon_intersection_area(square(0, 0, 3.0), square(0.5, 0.5, 1.0)))
        assert a == pytest.approx(4.0, rel=1e-4)

    def test_disjoint(self):
        a = float(polygon_intersection_area(square(0, 0, 1.0), square(5, 5, 1.0)))
        assert a == pytest.approx(0.0, abs=1e-5)

    def test_nonconvex_L_shape(self):
        # L-shape: 6 vertices, concave
        l_shape = jnp.asarray([
            [0.0, 0.0], [2.0, 0.0], [2.0, 1.0],
            [1.0, 1.0], [1.0, 2.0], [0.0, 2.0]])
        sq = square(1.0, 1.0, 1.0)  # [0,2]^2 area 4
        a = float(polygon_intersection_area(l_shape, sq))
        # L area = 3, fully inside the square
        assert a == pytest.approx(3.0, rel=1e-4)

    def test_random_convex_pairs_vs_raster(self):
        rng = np.random.RandomState(7)
        for _ in range(5):
            # random star-shaped (sorted-by-angle) polygons, like the loss sees
            n = 8
            ang1 = np.sort(rng.uniform(0, 2 * np.pi, n))
            ang2 = np.sort(rng.uniform(0, 2 * np.pi, n))
            r1 = rng.uniform(1.0, 3.0, n)
            r2 = rng.uniform(1.0, 3.0, n)
            p = np.stack([r1 * np.cos(ang1), r1 * np.sin(ang1)], -1)
            q = np.stack([r2 * np.cos(ang2), r2 * np.sin(ang2)], -1) + 0.5
            ours = float(polygon_intersection_area(jnp.asarray(p), jnp.asarray(q)))
            ref = rasterized_intersection(p, q)
            assert ours == pytest.approx(ref, rel=0.05, abs=0.05)

    def test_differentiable(self):
        p = square(0, 0, 1.0)
        q = square(0.5, 0.0, 1.0)

        def f(q):
            return polygon_intersection_area(p, q)

        g = jax.grad(f)(q)
        assert np.all(np.isfinite(np.asarray(g)))
        # moving q's right edge right should not change intersection;
        # moving left edge left increases it -> d(area)/d(x_left) < 0
        assert float(g[0, 0]) < 0  # vertex at x=-0.5 (left edge)


class TestClosedFormVsScanOracle:
    """The loss-path intersection area is the closed-form Green's-segment
    formulation; `polygon_intersection_area_scan` keeps the original
    Sutherland-Hodgman scan as a slow oracle.  These pin their equivalence
    on the exact polygon families the loss sees."""

    def _batch(self, fn, P, Q):
        return np.asarray(jax.vmap(fn)(jnp.asarray(P), jnp.asarray(Q)))

    def test_random_polar_pairs(self):
        from centerpoly_tpu.geometry.polygon import (
            polygon_intersection_area_scan)
        rng = np.random.RandomState(3)
        n, b = 16, 64
        th1 = np.sort(rng.uniform(0, 2 * np.pi, (b, n)), axis=1)
        th2 = np.sort(rng.uniform(0, 2 * np.pi, (b, n)), axis=1)
        r1 = rng.uniform(0.5, 30.0, (b, n))
        r2 = rng.uniform(0.5, 30.0, (b, n))
        P = np.stack([r1 * np.cos(th1), r1 * np.sin(th1)], -1).astype(np.float32)
        Q = np.stack([r2 * np.cos(th2), r2 * np.sin(th2)], -1).astype(np.float32)
        fast = self._batch(polygon_intersection_area, P, Q)
        slow = self._batch(polygon_intersection_area_scan, P, Q)
        np.testing.assert_allclose(fast, slow, rtol=1e-4, atol=1e-3)

    def test_polar_fixed_shared_spokes(self):
        # polar_fixed rep: pred and GT vertices on the SAME fixed angles,
        # so every fan-triangle pair shares collinear spoke rays — the
        # structural coincident-edge case the half-weight rule must handle.
        from centerpoly_tpu.geometry.polygon import (
            polygon_intersection_area_scan)
        rng = np.random.RandomState(4)
        n, b = 16, 64
        th = np.tile(np.arange(n) * 2 * np.pi / n, (b, 1)).astype(np.float32)
        rp = rng.uniform(0.5, 30.0, (b, n)).astype(np.float32)
        rq = rng.uniform(0.5, 30.0, (b, n)).astype(np.float32)
        P = np.stack([rp * np.cos(th), rp * np.sin(th)], -1)
        Q = np.stack([rq * np.cos(th), rq * np.sin(th)], -1)
        fast = self._batch(polygon_intersection_area, P, Q)
        slow = self._batch(polygon_intersection_area_scan, P, Q)
        np.testing.assert_allclose(fast, slow, rtol=1e-4, atol=1e-3)

    def test_identical_polygons_count_once(self):
        # P cap P = P: every outer edge is coincident in both passes; the
        # half-weight rule must yield exactly one traversal (2x would be
        # a 100% area error, 0x would be 0).  Both implementations share
        # ~1% f32 fan-cancellation noise at this coordinate scale, so
        # compare fast vs the scan oracle tightly and vs shoelace loosely.
        from centerpoly_tpu.geometry.polygon import (
            polygon_intersection_area_scan)
        rng = np.random.RandomState(5)
        n, b = 16, 32
        th = np.sort(rng.uniform(0, 2 * np.pi, (b, n)), axis=1)
        r = rng.uniform(0.5, 30.0, (b, n))
        P = np.stack([r * np.cos(th), r * np.sin(th)], -1).astype(np.float32)
        fast = self._batch(polygon_intersection_area, P, P)
        slow = self._batch(polygon_intersection_area_scan, P, P)
        np.testing.assert_allclose(fast, slow, rtol=1e-3, atol=1e-3)
        true = np.asarray(polygon_area(jnp.asarray(P)))
        np.testing.assert_allclose(fast, true, rtol=0.02)

    def test_gradient_matches_finite_differences(self):
        # The closed-form area is piecewise-rational in the vertices;
        # away from the branch boundaries its autodiff gradient must
        # match central differences.  f64 so the FD noise floor is far
        # below the tolerance.
        import jax.numpy as jnp  # noqa: F811 - local for the x64 scope
        rng = np.random.RandomState(11)
        jax.config.update("jax_enable_x64", True)
        try:
            n = 8
            ang1 = np.sort(rng.uniform(0, 2 * np.pi, n))
            ang2 = np.sort(rng.uniform(0, 2 * np.pi, n))
            p = np.stack([3.0 * np.cos(ang1), 3.0 * np.sin(ang1)], -1)
            q = np.stack([2.5 * np.cos(ang2), 2.5 * np.sin(ang2)], -1) + 0.4
            p = jnp.asarray(p, jnp.float64)
            q = jnp.asarray(q, jnp.float64)

            f = lambda pp: polygon_intersection_area(pp, q)
            g = np.asarray(jax.grad(f)(p))
            eps = 1e-6
            for i in range(n):
                for c in range(2):
                    d = np.zeros((n, 2))
                    d[i, c] = eps
                    fd = (float(f(p + d)) - float(f(p - d))) / (2 * eps)
                    assert g[i, c] == pytest.approx(fd, rel=1e-4, abs=1e-6), (
                        f"grad mismatch at vertex {i} coord {c}")
        finally:
            jax.config.update("jax_enable_x64", False)

    def test_batched_leading_dims(self):
        # polygon_intersection_area now accepts leading batch dims directly
        # (the loss path relies on vmap; this pins the broadcast form).
        rng = np.random.RandomState(6)
        P = rng.uniform(-3, 3, (2, 5, 8, 2)).astype(np.float32)
        Q = rng.uniform(-3, 3, (2, 5, 8, 2)).astype(np.float32)
        batched = np.asarray(polygon_intersection_area(
            jnp.asarray(P), jnp.asarray(Q)))
        for i in range(2):
            for j in range(5):
                one = float(polygon_intersection_area(
                    jnp.asarray(P[i, j]), jnp.asarray(Q[i, j])))
                assert batched[i, j] == pytest.approx(one, rel=1e-5, abs=1e-5)


class TestPolygonIoU:
    def test_self_iou_is_one(self):
        sq = square(0, 0, 2.0)
        assert float(polygon_iou(sq, sq)) == pytest.approx(1.0, rel=1e-4)

    def test_symmetry(self):
        a = square(0, 0, 1.0)
        b = square(0.7, 0.3, 1.2)
        assert float(polygon_iou(a, b)) == pytest.approx(float(polygon_iou(b, a)), rel=1e-5)

    def test_known_value(self):
        a = square(0, 0, 1.0)
        b = square(1, 0, 1.0)
        # inter 2, union 4+4-2=6
        assert float(polygon_iou(a, b)) == pytest.approx(2.0 / 6.0, rel=1e-4)


class TestGetAlpha:
    def test_quadrants_and_cos_zero(self):
        """Multi-bin rot head -> alpha must use arctan2 (full quadrant),
        not arctan(sin/cos): cos < 0 flips by pi, cos == 0 divides by
        zero (regression: round-3 review finding)."""
        from centerpoly_tpu.geometry.ddd import get_alpha
        angles = np.array([0.3, 2.5, -2.5, np.pi / 2], np.float32)
        rot = np.zeros((4, 8), np.float32)
        rot[:, 1] = 1.0  # bin 1 active
        rot[:, 2] = np.sin(angles)
        rot[:, 3] = np.cos(angles)
        alpha = get_alpha(rot)
        assert np.all(np.isfinite(alpha))
        np.testing.assert_allclose(alpha, angles - 0.5 * np.pi, atol=1e-5)


class TestRenderHeatmap:
    def test_channel_last_matches_host_splat(self):
        """On-device render is channel-LAST (H, W, C) and matches the
        host elliptical splat."""
        import jax.numpy as jnp
        from centerpoly_tpu.geometry import render_heatmap
        from centerpoly_tpu.geometry.gaussian import splat_ellipse_gaussian

        h, w, c = 24, 32, 3
        centers = np.array([[10.0, 8.0], [25.0, 15.0]], np.float32)
        radii = np.array([[3.0, 2.0], [4.0, 4.0]], np.float32)
        cls = np.array([0, 2], np.int32)
        mask = np.array([1, 1], np.float32)
        out = np.asarray(render_heatmap(centers, radii, cls, mask, c,
                                        (h, w)))
        assert out.shape == (h, w, c)
        ref = np.zeros((h, w, c), np.float32)
        for i in range(2):
            plane = np.ascontiguousarray(ref[..., cls[i]])
            splat_ellipse_gaussian(plane, centers[i],
                                   int(radii[i][0]), int(radii[i][1]))
            ref[..., cls[i]] = plane
        np.testing.assert_allclose(out, ref, atol=1e-5)
