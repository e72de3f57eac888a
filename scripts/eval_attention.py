#!/usr/bin/env python
"""Evaluate a trained student's attention head on COCO val.

Equivalent of the reference ``eval_attention.py``: load a snapshot of
``AttentionStudentSteps`` by timestamp/epoch/step (the per-submodule
part files written by ``scripts/distillation.py``), run the validation
set, compute the attention BCE loss (pos_weight 7) against the human
segmentation masks, log to TensorBoard, and save attention-map overlays
(replacing the reference's blocking matplotlib windows).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser("eval_attention")
    home = os.path.expanduser("~")
    p.add_argument("--coco_dir", default=os.path.join(home, "datasets",
                                                      "coco"))
    p.add_argument("--dataset", default="val2017")
    p.add_argument("--snapshot_dir", default=os.path.join("models",
                                                          "snapshots"))
    p.add_argument("--load_timestamp", required=True)
    p.add_argument("--load_epoch", type=int, required=True)
    p.add_argument("--load_step", type=int, required=True)
    p.add_argument("--model_path",
                   default="models/pose_higher_hrnet_w48_640.pth.tar")
    p.add_argument("--inplanes", type=int, default=80)
    p.add_argument("--num_heatmaps", type=int, default=17)
    p.add_argument("--whitelist", default=None)
    p.add_argument("--max_images", type=int, default=None)
    p.add_argument("--save_every", type=int, default=1)
    p.add_argument("--save_dir", default="/tmp")
    p.add_argument("--tb_dir", default=os.path.join("tb_log", "att_val"))
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from rtpe_tpu.data import CocoDistillationDataset, read_whitelist
    from rtpe_tpu.data.preprocess import normalize_image
    from rtpe_tpu.io.checkpoint import load_student_parts
    from rtpe_tpu.models import AttentionStudentSteps
    from rtpe_tpu.models.factory import load_pretrained_stem
    from rtpe_tpu.obs import MetricWriter
    from rtpe_tpu.ops.resize import resize_bilinear
    from rtpe_tpu.train import bce_with_logits
    from rtpe_tpu.utils import ColorLogger, make_timestamp

    log = ColorLogger(os.path.basename(__file__))
    tb = MetricWriter(os.path.join(
        args.tb_dir,
        f"[eval_attention.py]_{make_timestamp(with_tz_output=False)}"))

    model = AttentionStudentSteps(inplanes=args.inplanes,
                                  num_heatmaps=args.num_heatmaps,
                                  ae_dims=0, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x0, x0, train=False)
    if args.model_path and os.path.exists(args.model_path):
        variables = load_pretrained_stem(variables, args.model_path)
    prefix = (f"{args.load_timestamp}_epoch{args.load_epoch}"
              f"_step{args.load_step}")
    variables = load_student_parts(variables, args.snapshot_dir, prefix)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    log.info(f"loaded snapshot {prefix} from {args.snapshot_dir}")

    whitelist = read_whitelist(args.whitelist) if args.whitelist else None
    ds = CocoDistillationDataset(args.coco_dir, args.dataset,
                                 remove_images_without_annotations=False,
                                 gt_stddevs_pix=[2.0],
                                 whitelist_ids=whitelist,
                                 alt_colorspace="LAB",
                                 host_gt_heatmaps=False)  # never read

    os.makedirs(args.save_dir, exist_ok=True)
    n = len(ds) if args.max_images is None else min(len(ds),
                                                    args.max_images)

    # bucket by image shape and evaluate whole batches per jitted call
    # (COCO has hundreds of distinct shapes; a bs=1 native-shape loop
    # recompiles the student for nearly every image).  Per-image losses
    # are exact: the reduction is per image.
    from collections import defaultdict
    buckets = defaultdict(list)
    for i in range(n):
        im = ds.coco.imgs[ds.ids[i]]
        buckets[(im["height"], im["width"])].append(i)

    @jax.jit
    def batch_att(imgs, alts, segms):
        att, _ = model.apply(variables, imgs, alts, train=False)
        segm = resize_bilinear(segms, att.shape[1:3],
                               align_corners=False)
        # quirk preserved: BCE-with-logits applied to the sigmoided map
        # (reference eval_attention.py:160-162)
        per_img = jax.vmap(lambda a, s: bce_with_logits(
            a[None], s[None], pos_weight=7.0))(att, segm)
        return att, per_img

    bs = 8
    losses = np.full(n, np.nan)
    img_ids = np.zeros(n, np.int64)
    for (h, w), idxs in sorted(buckets.items()):
        for c0 in range(0, len(idxs), bs):
            chunk = idxs[c0:c0 + bs]
            m = len(chunk)
            padded = chunk + [chunk[-1]] * (bs - m)
            imgs = np.zeros((bs, h, w, 3), np.float32)
            alts = np.zeros((bs, h, w, 3), np.float32)
            segms = np.zeros((bs, h, w, 1), np.float32)
            for k, i in enumerate(padded):
                s = ds[i]
                imgs[k] = normalize_image(s["img"])
                alts[k] = s["img_alt"]
                segms[k, :, :, 0] = s["segm_mask"]
                if k < m:
                    img_ids[i] = s["img_id"]
            att, per_img = batch_att(jnp.asarray(imgs),
                                     jnp.asarray(alts),
                                     jnp.asarray(segms))
            for k, i in enumerate(chunk):
                losses[i] = float(per_img[k])
                if args.save_every and i % args.save_every == 0:
                    import cv2
                    amap = np.asarray(att[k, :, :, 0], np.float32)
                    amap = (np.clip(amap, 0, 1) * 255).astype(np.uint8)
                    cv2.imwrite(os.path.join(args.save_dir,
                                             f"attention_{i}.png"), amap)
    for i in range(n):  # TB series in dataset order, like the reference
        log.info(f"VALIDATION img {i + 1}: att loss {losses[i]:.5f}")
        tb.scalar("validation att loss", losses[i], i + 1)
        tb.scalar("validation img id", img_ids[i], i + 1)
    log.info(f"mean attention loss over {n} images: "
             f"{float(np.mean(losses)):.5f}")
    tb.close()


if __name__ == "__main__":
    main()
