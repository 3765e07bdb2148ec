"""Experimental raster losses (ref losses.py:961-1090 DiskLoss/AreaPolyLoss)."""
import numpy as np
import pytest

pytest.importorskip("PIL")

from centerpoly_tpu.losses.experimental import (
    disk_loss, area_poly_loss, create_mask)


def _octagon(r=10.0, n=8):
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    return np.stack([r * np.cos(ang), r * np.sin(ang)], -1).reshape(-1)


class TestCreateMask:
    def test_identical_polygons_match(self):
        v = _octagon()
        pm, gm = create_mask(v, v, 64, 96, "cartesian")
        assert (pm == gm).all()
        assert pm.max() == 255 and pm.min() == 0

    def test_polar_rep(self):
        n = 8
        ang = np.sort(np.linspace(0.1, 2 * np.pi - 0.1, n))
        row = np.zeros(2 * n)
        row[0::2] = 10.0
        row[1::2] = ang
        pm, gm = create_mask(row, row, 64, 96, "polar")
        assert pm.max() == 255 and (pm == gm).all()


class TestDiskLoss:
    def test_bigger_radius_covers_more(self):
        v = _octagon()
        mask = np.ones((1, 1))
        small = np.concatenate([v, [2.0]])[None, None, :]
        big = np.concatenate([v, [8.0]])[None, None, :]
        tgt = small.copy()
        l_small, _ = disk_loss(small, mask, tgt, 64, 96)
        l_big, _ = disk_loss(big, mask, tgt, 64, 96)
        # larger disks overlap the octagon more -> lower 1-IoU
        assert l_big < l_small

    def test_masked_objects_skipped(self):
        v = np.concatenate([_octagon(), [5.0]])[None, None, :]
        l, rep = disk_loss(v, np.zeros((1, 1)), v, 64, 96)
        assert l == 0.0 and rep == 0.0


class TestAreaPolyLoss:
    def test_matching_mask_lower_loss(self):
        v = _octagon()[None, None, :]
        centers = np.array([[[48, 32]]], np.float32)
        from centerpoly_tpu.losses.experimental import _fill_polygon
        pts = [(v[0, 0, j] + 48, v[0, 0, j + 1] + 32)
               for j in range(0, v.shape[2] - 1, 2)]
        gt_match = _fill_polygon(pts, 64, 96)[None]
        gt_empty = np.zeros((1, 64, 96), np.float32)
        mask = np.ones((1, 1))
        l_match = area_poly_loss(v, mask, gt_match, centers)
        l_empty = area_poly_loss(v, mask, gt_empty, centers)
        assert l_match < l_empty


class TestDeviceVariants:
    """TPU-native differentiable successors (soft rasterization)."""

    def test_soft_polygon_matches_pil(self):
        import jax.numpy as jnp
        from centerpoly_tpu.losses.experimental import (
            _fill_polygon, soft_polygon_mask)
        v = _octagon(r=12.0).reshape(-1, 2) + np.array([48.0, 32.0])
        hard = _fill_polygon([tuple(p) for p in v], 64, 96) / 255.0
        soft = np.asarray(soft_polygon_mask(
            jnp.asarray(v, jnp.float32), 64, 96, tau=0.25))
        # thresholded soft mask ~= PIL fill (disagreement only in the
        # one-pixel boundary band)
        disagree = np.mean((soft > 0.5) != (hard > 0.5))
        assert disagree < 0.02
        assert 0.0 <= soft.min() and soft.max() <= 1.0

    def test_disk_loss_device_tracks_host(self):
        import jax
        import jax.numpy as jnp
        from centerpoly_tpu.losses.experimental import disk_loss_device
        v = _octagon()
        mask = jnp.ones((1, 1))
        small = jnp.asarray(
            np.concatenate([v, [2.0]])[None, None, :], jnp.float32)
        big = jnp.asarray(
            np.concatenate([v, [8.0]])[None, None, :], jnp.float32)
        fn = jax.jit(lambda p, t: disk_loss_device(p, mask, t, 64, 96))
        l_small = float(fn(small, small))
        l_big = float(fn(big, small))
        assert l_big < l_small  # same ordering as the host diagnostic

    def test_disk_loss_device_differentiable(self):
        import jax
        import jax.numpy as jnp
        from centerpoly_tpu.losses.experimental import disk_loss_device
        v = _octagon()
        pred = jnp.asarray(
            np.concatenate([v * 0.8, [4.0]])[None, None, :], jnp.float32)
        tgt = jnp.asarray(
            np.concatenate([v, [4.0]])[None, None, :], jnp.float32)
        mask = jnp.ones((1, 1))
        g = jax.grad(
            lambda p: disk_loss_device(p, mask, tgt, 64, 96))(pred)
        g = np.asarray(g)
        assert np.all(np.isfinite(g)) and np.abs(g).max() > 0

    def test_area_poly_device_matching_lower_and_differentiable(self):
        import jax
        import jax.numpy as jnp
        from centerpoly_tpu.losses.experimental import (
            _fill_polygon, area_poly_loss_device)
        v = _octagon()[None, None, :]
        centers = jnp.asarray([[[48.0, 32.0]]], jnp.float32)
        pts = [(v[0, 0, j] + 48, v[0, 0, j + 1] + 32)
               for j in range(0, v.shape[2] - 1, 2)]
        gt_match = jnp.asarray(_fill_polygon(pts, 64, 96)[None] / 255.0)
        gt_empty = jnp.zeros((1, 64, 96), jnp.float32)
        mask = jnp.ones((1, 1))
        pv = jnp.asarray(v, jnp.float32)
        l_match = float(area_poly_loss_device(pv, mask, gt_match, centers))
        l_empty = float(area_poly_loss_device(pv, mask, gt_empty, centers))
        assert l_match < l_empty
        g = jax.grad(lambda p: area_poly_loss_device(
            p, mask, gt_match, centers))(pv)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_polar_reps_decode(self):
        import jax.numpy as jnp
        from centerpoly_tpu.losses.experimental import _rep_to_xy
        n = 8
        row = np.zeros(2 * n, np.float32)
        row[0::2] = 10.0
        row[1::2] = np.linspace(0.1, 6.1, n)
        xy = np.asarray(_rep_to_xy(jnp.asarray(row), "polar"))
        np.testing.assert_allclose(
            np.hypot(xy[..., 0], xy[..., 1]), 10.0, rtol=1e-5)
        xyf = np.asarray(_rep_to_xy(jnp.asarray(row), "polar_fixed"))
        # fixed-angle table: radius channels preserved, angles from the
        # reference's literal-2*3.14 table
        np.testing.assert_allclose(
            np.hypot(xyf[..., 0], xyf[..., 1]), 10.0, rtol=1e-5)
