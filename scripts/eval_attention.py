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

    fwd = jax.jit(lambda x, alt: model.apply(variables, x, alt,
                                             train=False))

    whitelist = read_whitelist(args.whitelist) if args.whitelist else None
    ds = CocoDistillationDataset(args.coco_dir, args.dataset,
                                 remove_images_without_annotations=False,
                                 gt_stddevs_pix=[2.0],
                                 whitelist_ids=whitelist,
                                 alt_colorspace="LAB")

    os.makedirs(args.save_dir, exist_ok=True)
    n = len(ds) if args.max_images is None else min(len(ds),
                                                    args.max_images)
    losses = []
    for i in range(n):
        s = ds[i]
        img = normalize_image(s["img"])
        att, _ = fwd(jnp.asarray(img[None]),
                     jnp.asarray(s["img_alt"][None]))
        segm = resize_bilinear(
            jnp.asarray(s["segm_mask"][None, :, :, None]),
            att.shape[1:3], align_corners=False)
        # quirk preserved: BCE-with-logits applied to the sigmoided map
        # (reference eval_attention.py:160-162)
        att_loss = float(bce_with_logits(att, segm, pos_weight=7.0))
        losses.append(att_loss)
        log.info(f"VALIDATION img {i + 1}: att loss {att_loss:.5f}")
        tb.scalar("validation att loss", att_loss, i + 1)
        tb.scalar("validation img id", s["img_id"], i + 1)
        if args.save_every and i % args.save_every == 0:
            import cv2
            amap = np.asarray(att[0, :, :, 0], np.float32)
            amap = (np.clip(amap, 0, 1) * 255).astype(np.uint8)
            cv2.imwrite(os.path.join(args.save_dir,
                                     f"attention_{i}.png"), amap)
    log.info(f"mean attention loss over {n} images: "
             f"{float(np.mean(losses)):.5f}")
    tb.close()


if __name__ == "__main__":
    main()
