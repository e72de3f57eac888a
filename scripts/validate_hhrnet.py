#!/usr/bin/env python
"""Teacher COCO-AP validation.

Equivalent of the reference ``validate_hhrnet.py``: run the W48 teacher
over COCO val2017, bilinearly upsample the refined heatmaps and the
coarse-output AEs to image size, decode with the HeatmapParser
(adjust+refine), save periodic skeleton overlays, and report official
keypoint AP (reference :61-119).  The reference's hardcoded globals are
exposed as CLI flags with the same defaults.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser("validate_hhrnet")
    parser.add_argument("--coco_dir", type=str,
                        default=os.path.join(os.path.expanduser("~"),
                                             "datasets", "coco"))
    parser.add_argument("--dataset", type=str, default="val2017")
    parser.add_argument("-m", "--model_path", type=str,
                        default="models/pose_higher_hrnet_w48_640.pth.tar")
    parser.add_argument("--input_size", type=int, default=640)
    parser.add_argument("--whitelist", type=str, default=None,
                        help="minival id-list file")
    parser.add_argument("--save_every", type=int, default=100)
    parser.add_argument("--save_dir", type=str, default="/tmp")
    parser.add_argument("--max_images", type=int, default=None)
    parser.add_argument("--flip", action="store_true",
                        help="flip test-time augmentation (the 0.698-AP "
                             "pipeline uses it; legacy/valid_ae1dim.py)")
    parser.add_argument("--scales", type=str, default="1",
                        help="comma-separated multi-scale TTA factors")
    parser.add_argument("--batch_size", type=int, default=4,
                        help="images sharing a resize shape are "
                             "forwarded together (the reference is "
                             "strictly one image at a time)")
    parser.add_argument("--allow_random_init", action="store_true",
                        help="Proceed with a RANDOM-INIT teacher when "
                             "model_path does not exist (smoke/shape "
                             "runs only; the AP numbers are "
                             "meaningless). Missing path is otherwise "
                             "a hard error.")
    parser.add_argument("--packed", default=True,
                        action=argparse.BooleanOptionalAction,
                        help="Run the forward through the row-packed "
                             "fast path (BN folded; same function, "
                             "~2.5x on TPU).  --no-packed evaluates "
                             "the canonical parity surface.")
    parser.add_argument("--int8", action="store_true",
                        help="int8-quantized packed forward, "
                             "activation scales calibrated on the "
                             "first val images (requires --packed); "
                             "quantized numerics — compare AP vs bf16 "
                             "before quoting results")
    parser.add_argument("--int8_act", action="store_true",
                        help="additionally store inter-layer "
                             "activations int8 (requires --int8); "
                             "the fastest serving path — coarser "
                             "numerics than plain --int8")
    parser.add_argument("--ae_mode", default="full",
                        choices=["full", "first", "mean"],
                        help="associative-embedding ablations from the "
                             "reference's studies (explorations.md:"
                             "209-244): 'first' keeps only AE dim 0 "
                             "(legacy/valid_ae1dim.py), 'mean' averages "
                             "the dims (legacy/valid_ae_avg.py)")
    args = parser.parse_args()
    if args.int8 and not args.packed:
        parser.error("--int8 requires --packed")
    if args.int8_act and not args.int8:
        parser.error("--int8_act requires --int8")

    import jax
    import jax.numpy as jnp

    from rtpe_tpu.data import CocoDistillationDataset, read_whitelist
    from rtpe_tpu.data.preprocess import (
        normalize_image,
        resize_align_multi_scale,
    )
    from rtpe_tpu.decode import HeatmapParser
    from rtpe_tpu.models.factory import get_hrnet_w48_teacher
    from rtpe_tpu.obs.vis import save_valid_image
    from rtpe_tpu.ops.resize import resize_bilinear
    from rtpe_tpu.utils import ColorLogger

    from rtpe_tpu.utils.watchdog import CompileWatchdog
    wd = CompileWatchdog(interval=120.0).start()
    log = ColorLogger(os.path.basename(__file__))

    whitelist = read_whitelist(args.whitelist) if args.whitelist else None
    ds = CocoDistillationDataset(args.coco_dir, args.dataset,
                                 remove_images_without_annotations=False,
                                 whitelist_ids=whitelist,
                                 host_gt_heatmaps=False)  # never read
    mp = args.model_path if (args.model_path
                             and os.path.exists(args.model_path)) else None
    if mp is None:
        if not args.allow_random_init:
            log.error(f"model path {args.model_path!r} not found; pass "
                      f"--allow_random_init for a smoke/shape run")
            sys.exit(2)
        log.warning(f"model path {args.model_path!r} not found: "
                    f"RANDOM-INIT teacher (shape/drive runs only)")
    model, variables = get_hrnet_w48_teacher(mp)
    if args.packed:
        from rtpe_tpu.models import pack_w48_params, packed_forward
        cfg = model.cfg
        pk = jax.jit(lambda v: pack_w48_params(v, cfg))(variables)
        if args.int8:
            from rtpe_tpu.models import (calibrate_act_scales,
                                         quantize_packed)
            calib = []
            for i in range(min(4, len(ds))):
                im = ds[i]["img"] * 255.0
                r, _, _ = resize_align_multi_scale(im, args.input_size,
                                                   1, 1)
                calib.append(normalize_image(r / 255.0)[None])
            scales_d = calibrate_act_scales(pk, calib, cfg)
            pk = jax.jit(lambda p: quantize_packed(p, scales_d))(pk)
        fwd = jax.jit(lambda x: packed_forward(
            pk, x, cfg, int8_act=args.int8_act))
        log.info("forward path: packed"
                 + (" + int8_act" if args.int8_act
                    else " + int8" if args.int8 else " bf16"))
    else:
        fwd = jax.jit(lambda x: model.apply(variables, x, train=False))
        log.info("forward path: canonical")
    # parser params: reference validate_hhrnet.py:78; 'first'/'mean' AE
    # modes reduce tags to one channel shared across joints
    hm_parser = HeatmapParser(num_joints=17, max_num_people=30,
                              detection_threshold=0.1, tag_threshold=1.0,
                              use_detection_val=True, ignore_too_much=False,
                              tag_per_joint=args.ae_mode == "full",
                              nms_ksize=5, nms_padding=2)

    def reduce_ae(aes):
        if args.ae_mode == "first":
            return aes[..., 0:1]
        if args.ae_mode == "mean":
            return jnp.mean(aes, axis=-1, keepdims=True)
        return aes

    scales = tuple(float(s) for s in args.scales.split(","))
    use_tta = args.flip or scales != (1.0,)
    if use_tta:
        from rtpe_tpu.eval.tta import tta_forward

    os.makedirs(args.save_dir, exist_ok=True)
    n = len(ds) if args.max_images is None else min(len(ds),
                                                    args.max_images)

    # bucket indices by ORIGINAL (H, W) from the annotation metadata —
    # the post-resize shape is a pure function of it — and stream each
    # chunk: decode/preprocess just-in-time so host memory holds one
    # batch, not the whole dataset (the reference forwards one image at
    # a time, validate_hhrnet.py:84-93; a full val2017 preload would
    # need ~50 GB)
    from collections import defaultdict
    buckets = defaultdict(list)
    for i in range(n):
        im = ds.coco.imgs[ds.ids[i]]
        buckets[(im["height"], im["width"])].append(i)

    all_preds = [None] * n
    all_scores = [None] * n
    done = 0
    import time
    fwd_s = 0.0
    for shape, idxs in sorted(buckets.items()):
        # TTA batches like the plain path: flip is a doubled leading
        # axis inside tta_forward, scales are separate dispatches
        # (round-4; the reference and rounds 1-3 forced bs=1 here)
        bs = max(1, args.batch_size)
        for s0 in range(0, len(idxs), bs):
            chunk = []
            for i in idxs[s0:s0 + bs]:
                sample = ds[i]
                img = sample["img"] * 255.0
                resized, _, _ = resize_align_multi_scale(
                    img, args.input_size, 1, 1)
                chunk.append((i, normalize_image(resized / 255.0),
                              img, sample["img_id"]))
                wd.alive()
            xb = jnp.asarray(np.stack([x for _, x, _, _ in chunk]))
            t0 = time.time()
            if use_tta:
                hm_b, tag_b = tta_forward(
                    fwd, xb, num_joints=17, with_flip=args.flip,
                    scales=scales)
            else:
                coarse, refined = fwd(xb)
                hm_b = refined[..., :17].astype(jnp.float32)
                tag_b = coarse[..., 17:].astype(jnp.float32)
            hm_b.block_until_ready()
            fwd_s += time.time() - t0
            # one batched upsample + one batched decode per chunk: the
            # bucket shares the original (h, w), so parse_batch
            # amortizes the fixed per-dispatch host-pull latency over
            # the whole chunk (round-2 decode work; the reference
            # parses strictly per image, validate_hhrnet.py:100)
            h, w = shape
            hms_b = resize_bilinear(hm_b, (h, w), align_corners=True)
            aes_b = resize_bilinear(tag_b, (h, w), align_corners=True)
            grouped_b, scores_b = hm_parser.parse_batch(
                hms_b, reduce_ae(aes_b), adjust=True, refine=True)
            for k, (i, _, img, img_id) in enumerate(chunk):
                final = [p for p in grouped_b[k]
                         if np.asarray(p).size > 0]
                all_preds[i] = final
                all_scores[i] = scores_b[k]
                done += 1
                wd.alive()
                log.info(f"[{done}/{n}] {img_id}: {len(final)} people")
                if args.save_every and i % args.save_every == 0:
                    save_valid_image(
                        img.astype(np.uint8), final,
                        os.path.join(args.save_dir,
                                     f"validate_hhrnet_{i}.jpg"))

    if done and fwd_s > 0:
        log.info(f"teacher forward rate: {done / fwd_s:.1f} img/s "
                 f"({done} images, {fwd_s:.1f}s incl. compile)")
    ds.ids = ds.ids[:n]
    stats = ds.evaluate(all_preds, all_scores)
    for k, v in stats.items():
        log.info(f"{k}={v}")
    import json
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
