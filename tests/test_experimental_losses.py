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
