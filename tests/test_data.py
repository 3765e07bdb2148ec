import json
import os

import numpy as np
import pytest

from centerpoly_tpu.configs import Config
from centerpoly_tpu.data import (
    CocoPolyAnnotations, PolydetSampler, CityscapesMeta, Loader)
from centerpoly_tpu.data.sampler import flip_vertex_permutation
from centerpoly_tpu.data.loader import stack_batch

REF_JSON = "/root/reference/cityscapesStuff/BBoxes/val8_regular_interval.json"


def synthetic_coco(tmp_path, n_images=2, n_objs=3, n_points=16):
    """Tiny COCO-poly fixture with deterministic polygons."""
    rng = np.random.RandomState(0)
    images, annotations = [], []
    ann_id = 0
    for i in range(n_images):
        images.append({"id": i, "file_name": f"img_{i}.png",
                       "height": 128, "width": 256})
        for k in range(n_objs):
            cx = rng.randint(40, 216)
            cy = rng.randint(30, 98)
            rad = rng.randint(8, 20)
            ang = np.sort(rng.rand(n_points) * 2 * np.pi)
            xs = cx + rad * np.cos(ang)
            ys = cy + rad * np.sin(ang)
            poly = np.stack([xs, ys], -1).reshape(-1).tolist()
            annotations.append({
                "id": ann_id, "image_id": i, "category_id": 3,
                "bbox": [float(xs.min()), float(ys.min()),
                         float(xs.max() - xs.min()),
                         float(ys.max() - ys.min())],
                "poly": poly, "pseudo_depth": k,
                "area": float(rad * rad * 3.14),
            })
            ann_id += 1
    data = {"images": images, "annotations": annotations,
            "categories": [{"id": c, "name": n} for c, n in
                           enumerate(CityscapesMeta.class_name[1:9], 1)]}
    path = os.path.join(tmp_path, "ann.json")
    with open(path, "w") as f:
        json.dump(data, f)
    return path


class TestCocoReader:
    def test_reads_reference_gt(self):
        if not os.path.exists(REF_JSON):
            pytest.skip("reference GT not mounted")
        coco = CocoPolyAnnotations(REF_JSON)
        ids = coco.get_img_ids()
        assert len(ids) > 0
        anns = coco.load_anns(ids[0])
        assert len(anns) >= 0
        # find an image with annotations and check the poly contract
        for i in ids:
            anns = coco.load_anns(i)
            if anns:
                a = anns[0]
                assert "poly" in a and "pseudo_depth" in a
                assert len(a["poly"]) == 16  # val8 -> 8 vertices
                break

    def test_synthetic(self, tmp_path):
        path = synthetic_coco(tmp_path)
        coco = CocoPolyAnnotations(path)
        assert len(coco) == 2
        assert len(coco.load_anns(0)) == 3


class TestFlipPermutation:
    def test_is_permutation(self):
        for n2 in (16, 32, 64):
            perm = flip_vertex_permutation(n2)
            assert sorted(perm.tolist()) == list(range(n2))

    def test_matches_reference_loops(self):
        """Cross-check against the reference's in-place loops
        (sample/polydet.py:177-186) run symbolically."""
        for n2 in (16, 32):
            nf = list(range(n2))          # identity "not_flipped" values
            pts = list(range(n2))
            first_angle = n2 // 4
            for i in range(0, n2 // 4 + 2, 2):
                pts[i] = nf[first_angle - i]
                pts[i + 1] = nf[first_angle - i + 1]
            for i in range(2, 3 * n2 // 4, 2):
                pts[first_angle + i] = nf[n2 - i]
                pts[first_angle + i + 1] = nf[n2 - i + 1]
            perm = flip_vertex_permutation(n2)
            assert pts == perm.tolist()


class TestSampler:
    def _sampler(self, tmp_path, split="train", rep="cartesian"):
        path = synthetic_coco(tmp_path)
        cfg = Config(task="polydet", dataset="cityscapes", rep=rep,
                     input_h=128, input_w=256)
        coco = CocoPolyAnnotations(path)
        return PolydetSampler(cfg, CityscapesMeta(), coco, split=split), cfg

    def test_output_contract(self, tmp_path):
        sampler, cfg = self._sampler(tmp_path)
        s = sampler(0)
        assert s["input"].shape == (128, 256, 3)
        assert s["hm"].shape == (32, 64, 8)
        assert s["poly"].shape == (128, 32)
        assert s["pseudo_depth"].shape == (128, 1)
        assert s["ind"].shape == (128,)
        assert s["reg"].shape == (128, 2)
        assert s["reg_mask"].sum() > 0
        assert s["hm"].max() == pytest.approx(1.0)

    def test_val_no_aug_and_meta(self, tmp_path):
        sampler, cfg = self._sampler(tmp_path, split="val")
        s1 = sampler(0)
        s2 = sampler(0)
        np.testing.assert_allclose(s1["input"], s2["input"])
        assert "meta" in s1
        assert s1["meta"]["img_id"] == 0

    def test_polygon_targets_reconstruct(self, tmp_path):
        """cartesian poly offsets + peak must reconstruct the warped verts."""
        sampler, cfg = self._sampler(tmp_path, split="val")
        s = sampler(0)
        k = int(np.argmax(s["reg_mask"]))
        ct = s["peak"][k]
        verts = s["poly"][k].reshape(-1, 2) + ct
        # all vertices inside output grid
        assert verts[:, 0].min() >= 0 and verts[:, 0].max() < 64
        assert verts[:, 1].min() >= 0 and verts[:, 1].max() < 32
        # ind encodes the int center
        assert s["ind"][k] == int(ct[1]) * 64 + int(ct[0])
        np.testing.assert_allclose(s["reg"][k], ct - ct.astype(np.int32),
                                   atol=1e-6)

    def test_polar_targets(self, tmp_path):
        sampler, cfg = self._sampler(tmp_path, split="val", rep="polar")
        s = sampler(0)
        k = int(np.argmax(s["reg_mask"]))
        r = s["poly"][k, 0::2]
        theta = s["poly"][k, 1::2]
        assert np.all(r >= 0)
        assert np.all((theta >= 0) & (theta < 2 * np.pi + 1e-6))

    def test_train_aug_changes_sample(self, tmp_path):
        sampler, cfg = self._sampler(tmp_path, split="train")
        a = sampler(0)["input"]
        b = sampler(0)["input"]
        assert not np.allclose(a, b)


class TestLoader:
    def test_batching(self, tmp_path):
        sampler, cfg = self._make(tmp_path)
        loader = Loader(sampler, len(sampler), batch_size=2)
        batches = list(loader)
        assert len(batches) == 1
        assert batches[0]["input"].shape == (2, 128, 256, 3)
        assert batches[0]["hm"].shape == (2, 32, 64, 8)

    def _make(self, tmp_path):
        path = synthetic_coco(tmp_path)
        cfg = Config(task="polydet", dataset="cityscapes",
                     input_h=128, input_w=256)
        coco = CocoPolyAnnotations(path)
        return PolydetSampler(cfg, CityscapesMeta(), coco), cfg

    def test_rank_world_partition(self):
        """Multi-host sharding: same seed -> disjoint, jointly
        exhaustive index shards of equal size, no duplicated samples."""
        n, world = 103, 4
        sampler = lambda i: {"i": np.asarray([i])}
        loaders = [Loader(sampler, n, batch_size=5, shuffle=True,
                          seed=7, rank=r, world=world)
                   for r in range(world)]
        lens = {len(ld) for ld in loaders}
        assert lens == {(n // world) // 5}
        seen = []
        for ld in loaders:
            for batch in ld:
                seen.extend(int(v) for v in batch["i"][:, 0])
        assert len(seen) == len(set(seen)), "duplicated samples across ranks"
        # single-host behavior unchanged
        solo = Loader(sampler, n, batch_size=5, shuffle=False, drop_last=False)
        got = [int(v) for b in solo for v in b["i"][:, 0]]
        assert got == list(range(n))

    def test_val_remainder_rotates_across_epochs(self):
        """Unshuffled multi-host loader: the N % world samples dropped
        by the equal-length truncation must ROTATE across epochs, not
        permanently exclude the same trailing images from every eval."""
        n, world = 103, 4
        sampler = lambda i: {"i": np.asarray([i])}
        loaders = [Loader(sampler, n, batch_size=1, shuffle=False,
                          rank=r, world=world) for r in range(world)]
        seen = set()
        for _epoch in range(world):
            for ld in loaders:
                for batch in ld:
                    seen.add(int(batch["i"][0, 0]))
        assert seen == set(range(n)), (
            f"{sorted(set(range(n)) - seen)} never evaluated")

    def test_producer_exception_propagates(self):
        """A sampler exception mid-epoch must raise in the consumer,
        not silently truncate the epoch (torch DataLoader semantics)."""
        def sampler(i):
            if i >= 3:
                raise RuntimeError("corrupt annotation")
            return {"i": np.asarray([i])}

        loader = Loader(sampler, 6, batch_size=1, shuffle=False)
        got = []
        with pytest.raises(RuntimeError, match="corrupt annotation"):
            for batch in loader:
                got.append(int(batch["i"][0, 0]))
        assert got == [0, 1, 2]

    def test_stack_batch(self):
        samples = [{"a": np.ones((2, 2)), "meta": {"x": 1}},
                   {"a": np.zeros((2, 2)), "meta": {"x": 2}}]
        out = stack_batch(samples)
        assert out["a"].shape == (2, 2, 2)
        assert isinstance(out["meta"], list)


class TestLoaderWorkers:
    def test_multiprocess_matches_threaded(self, tmp_path):
        path = synthetic_coco(tmp_path)
        cfg = Config(task="polydet", dataset="cityscapes",
                     input_h=128, input_w=256)
        meta = CityscapesMeta(str(tmp_path))
        sampler = PolydetSampler(cfg, meta, CocoPolyAnnotations(path),
                                 split="val")
        a = Loader(sampler, len(sampler), 2, shuffle=False,
                   drop_last=False, num_workers=0)
        b = Loader(sampler, len(sampler), 2, shuffle=False,
                   drop_last=False, num_workers=2)
        batches_a = list(a)
        batches_b = list(b)
        assert len(batches_a) == len(batches_b)
        for ba, bb in zip(batches_a, batches_b):
            for k in ba:
                if k == "meta":
                    continue
                np.testing.assert_allclose(ba[k], bb[k], rtol=1e-6)


class TestAuxTargets:
    def _sample(self, tmp_path, **kw):
        path = synthetic_coco(tmp_path)
        cfg = Config(task="polydet", dataset="cityscapes",
                     input_h=128, input_w=256, **kw)
        meta = CityscapesMeta(str(tmp_path))
        return PolydetSampler(cfg, meta, CocoPolyAnnotations(path),
                              split="train")(0), cfg

    def test_border_hm_and_fg(self, tmp_path):
        s, cfg = self._sample(tmp_path)
        assert s["border_hm"].shape == (cfg.output_h, cfg.output_w, 1)
        assert s["border_hm"].max() == pytest.approx(1.0)
        assert s["fg"].shape == (cfg.output_h, cfg.output_w, 1)

    def test_cat_spec_poly(self, tmp_path):
        s, cfg = self._sample(tmp_path, cat_spec_poly=True)
        n2 = cfg.nbr_points * 2
        assert s["cat_spec_poly"].shape == (cfg.max_objs,
                                            cfg.num_classes * n2)
        k = int(np.argmax(s["reg_mask"]))
        # fixture objects are class index 2 (category 3)
        base = 2 * n2
        np.testing.assert_allclose(
            s["cat_spec_poly"][k, base:base + n2], s["poly"][k])
        assert s["cat_spec_mask"][k, base:base + n2].all()

    def test_dense_poly(self, tmp_path):
        s, cfg = self._sample(tmp_path, dense_poly=True)
        n2 = cfg.nbr_points * 2
        assert "poly" not in s
        assert s["dense_poly"].shape == (cfg.output_h, cfg.output_w, n2)
        assert s["dense_poly_mask"].max() == 1.0
        # the dense map carries vertex vectors at annotated centers
        assert np.abs(s["dense_poly"]).max() > 0
