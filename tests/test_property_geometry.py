"""Property-based tests (hypothesis) for the geometry core.

Fixed shapes everywhere (N=16 vertices) so the whole file compiles each
jitted function once and replays it across examples — important on the
1-core CI host.
"""
import numpy as np
import pytest

hp = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st

import jax
import jax.numpy as jnp

from centerpoly_tpu.geometry.polygon import (
    polygon_iou, polygon_area, polar_to_cartesian, cartesian_to_polar)
from centerpoly_tpu.geometry.affine import (
    get_affine_transform, affine_transform_points, transform_preds)

N = 16
SET = settings(max_examples=25, deadline=None)

_iou = jax.jit(polygon_iou)
_area = jax.jit(polygon_area)


def _star_polygon(radii, phase):
    """Simple (star-shaped) N-gon: sorted angles, radii >= 1."""
    ang = np.sort(np.linspace(0, 2 * np.pi, N, endpoint=False) + phase)
    r = np.asarray(radii)
    return np.stack([r * np.cos(ang), r * np.sin(ang)], -1).astype(
        np.float32)


radii_st = st.lists(st.floats(1.0, 30.0), min_size=N, max_size=N)


class TestPolygonIoU:
    @SET
    @given(radii_st, st.floats(0.0, 0.3))
    def test_self_iou_is_one(self, radii, phase):
        p = jnp.asarray(_star_polygon(radii, phase))
        assert float(_iou(p, p)) == pytest.approx(1.0, abs=1e-3)

    @SET
    @given(radii_st, radii_st)
    def test_symmetric_and_bounded(self, r1, r2):
        p = jnp.asarray(_star_polygon(r1, 0.0))
        q = jnp.asarray(_star_polygon(r2, 0.1))
        a = float(_iou(p, q))
        b = float(_iou(q, p))
        assert a == pytest.approx(b, abs=2e-3)
        assert -1e-3 <= a <= 1.0 + 1e-3

    @SET
    @given(radii_st, radii_st,
           st.floats(-50.0, 50.0), st.floats(-50.0, 50.0))
    def test_translation_invariant(self, r1, r2, tx, ty):
        p = _star_polygon(r1, 0.0)
        q = _star_polygon(r2, 0.1)
        t = np.asarray([tx, ty], np.float32)
        a = float(_iou(jnp.asarray(p), jnp.asarray(q)))
        b = float(_iou(jnp.asarray(p + t), jnp.asarray(q + t)))
        assert a == pytest.approx(b, abs=5e-3)

    @SET
    @given(radii_st, st.floats(0.5, 3.0))
    def test_area_scales_quadratically(self, radii, s):
        p = _star_polygon(radii, 0.0)
        a1 = float(_area(jnp.asarray(p)))
        a2 = float(_area(jnp.asarray(p * s)))
        assert a2 == pytest.approx(a1 * s * s, rel=1e-3)

    @SET
    @given(radii_st)
    def test_subset_iou_is_area_ratio(self, radii):
        """q = 0.5 * p is contained in star-shaped p (both star-shaped
        about the origin), so IoU == area(q)/area(p) == 0.25."""
        p = _star_polygon(radii, 0.0)
        q = 0.5 * p
        got = float(_iou(jnp.asarray(p), jnp.asarray(q)))
        assert got == pytest.approx(0.25, abs=5e-3)


class TestPolarRoundtrip:
    @SET
    @given(radii_st)
    def test_cartesian_polar_cartesian(self, radii):
        p = _star_polygon(radii, 0.05)  # (N, 2)
        rt = cartesian_to_polar(jnp.asarray(p))
        back = np.asarray(polar_to_cartesian(rt))
        np.testing.assert_allclose(back, p, rtol=1e-4, atol=1e-4)


class TestAffineRoundtrip:
    @SET
    @given(st.floats(100.0, 1900.0), st.floats(100.0, 900.0),
           st.floats(200.0, 2000.0), st.integers(0, 3))
    def test_transform_preds_inverts_forward(self, cx, cy, s, k):
        out_w, out_h = 256, 128
        center = np.asarray([cx, cy], np.float32)
        trans = get_affine_transform(
            center, s, 0, [out_w, out_h])
        rng = np.random.RandomState(k)
        pts = rng.rand(8, 2).astype(np.float32) * [out_w, out_h]
        # forward maps source coords -> output; transform_preds maps
        # output coords back to source (ref utils/image.py + post_process)
        back = transform_preds(pts, center, s, (out_w, out_h))
        fwd = affine_transform_points(back, trans)
        np.testing.assert_allclose(fwd, pts, atol=0.05)
