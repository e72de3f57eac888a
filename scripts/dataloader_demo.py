#!/usr/bin/env python
"""Data-pipeline demo + decode-stack AP sanity check.

Equivalent of the reference ``dataloader_demo.py``: (1) demonstrate the
augmentation pipeline by saving composite overview images (instead of
blocking matplotlib windows), and (2) run the *precomputed teacher
outputs* through the decoder and evaluate COCO AP on a minival split —
which measures the decode/grouping stack in isolation from any model
(reference ``dataloader_demo.py:90-121``).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser("dataloader_demo")
    home = os.path.expanduser("~")
    p.add_argument("--coco_dir", default=os.path.join(home, "datasets",
                                                      "coco"))
    p.add_argument("--dataset", default="val2017")
    p.add_argument("--teacher_dir", default=None)
    p.add_argument("--minival_file", default=None)
    p.add_argument("--num_demo_batches", type=int, default=2)
    p.add_argument("--max_eval_images", type=int, default=100)
    p.add_argument("--save_dir", default="/tmp")
    args = p.parse_args()

    import jax.numpy as jnp

    from rtpe_tpu.data import CocoDistillationDataset, read_whitelist
    from rtpe_tpu.data.pipeline import TrainPipeline
    from rtpe_tpu.decode import HeatmapParser
    from rtpe_tpu.obs.vis import heatmaps_grid
    from rtpe_tpu.utils import ColorLogger

    log = ColorLogger(os.path.basename(__file__))
    whitelist = (read_whitelist(args.minival_file)
                 if args.minival_file else None)

    # part 1: augmentation pipeline demo (no teacher maps needed) -------
    ds = CocoDistillationDataset(args.coco_dir, args.dataset,
                                 remove_images_without_annotations=True,
                                 gt_stddevs_pix=[7.0],
                                 host_gt_heatmaps=False)  # device-rendered
    pipeline = TrainPipeline(ds, batch_size=4, out_hw=(450, 450),
                             sigma=7.0)
    import cv2
    for bi, batch in enumerate(pipeline if args.num_demo_batches else []):
        if bi >= args.num_demo_batches:
            break
        img = np.asarray(batch["img"][0])
        img = (img - img.min()) / (img.max() - img.min() + 1e-9)
        hms = np.asarray(batch["gt_hms"][0]).max(axis=-1)
        seg = np.asarray(batch["segm_mask"][0, :, :, 0])
        panel = np.concatenate([
            (img * 255).astype(np.uint8),
            cv2.applyColorMap((hms * 255).astype(np.uint8),
                              cv2.COLORMAP_JET),
            cv2.cvtColor((seg * 255).astype(np.uint8),
                         cv2.COLOR_GRAY2BGR),
        ], axis=1)
        out = os.path.join(args.save_dir, f"dataloader_demo_{bi}.jpg")
        cv2.imwrite(out, panel)
        log.info(f"saved augmentation overview to {out}")

    # part 2: teacher-outputs -> decoder -> COCO AP ---------------------
    if args.teacher_dir is None:
        log.warning("no --teacher_dir given; skipping decode-AP part")
        return
    val_ds = CocoDistillationDataset(
        args.coco_dir, args.dataset, args.teacher_dir,
        remove_images_without_annotations=False,
        whitelist_ids=whitelist, host_gt_heatmaps=False)
    hm_parser = HeatmapParser(num_joints=17, max_num_people=30,
                              detection_threshold=0.1, tag_threshold=1.0,
                              use_detection_val=True,
                              ignore_too_much=False, tag_per_joint=True)
    n = min(len(val_ds), args.max_eval_images)
    all_preds, all_scores = [], []
    for i in range(n):
        s = val_ds[i]
        hms = jnp.asarray(s["teacher_hms"][None])
        aes = jnp.asarray(s["teacher_ae"][None])
        grouped, scores = hm_parser.parse(hms, aes, adjust=True,
                                          refine=True)
        all_preds.append([x for x in grouped[0] if x.size > 0])
        all_scores.append(scores)
        log.info(f"decoded {i + 1}/{n}")
    val_ds.ids = val_ds.ids[:n]
    stats = val_ds.evaluate(all_preds, all_scores)
    for k, v in stats.items():
        log.info(f"{k}={v}")
    print(stats)


if __name__ == "__main__":
    main()
