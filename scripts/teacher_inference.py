#!/usr/bin/env python
"""Batch teacher prediction -> per-image .npz cache.

TPU-native equivalent of the reference ``teacher_inference.py`` with the
same CLI contract (``-I`` images, ``-o`` out dir, ``-m`` statedict,
``-C`` force CPU; reference :46-55) and the same output file contract
(``{img}.jpg_w48_predictions.npz`` with pred_heatmaps / embeddings /
heatmaps_refined / heatmaps_order; reference :86-90).

Differences by design: images are bucketed by their 64-multiple resize
shape and batched per bucket, so XLA compiles once per bucket and the
MXU stays fed — instead of the reference's one-image-at-a-time loop.
"""

import argparse
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

INPUT_SIZE = 640


def main():
    parser = argparse.ArgumentParser("HigherHRNet Inference")
    parser.add_argument("-I", "--input_paths", required=True, type=str,
                        nargs="+", help="Abs paths for the input images")
    parser.add_argument("-o", "--out_dir", required=True, type=str,
                        help="Path to output the predictions")
    parser.add_argument("-m", "--model_path", required=True, type=str,
                        help="Path to the HigherHRNet_w48_640 state dict")
    parser.add_argument("-C", "--force_cpu", action="store_true",
                        help="Run on CPU even if a TPU is present")
    parser.add_argument("--input_size", type=int, default=INPUT_SIZE,
                        help="resize-align target (reference fixes 640)")
    parser.add_argument("-b", "--batch_size", type=int, default=4,
                        help="Per-bucket batch size")
    parser.add_argument("--allow_random_init", action="store_true",
                        help="Proceed with a RANDOM-INIT teacher when "
                             "model_path does not exist (smoke/shape "
                             "runs only: the npz corpus will be noise). "
                             "Without it a missing path is a hard "
                             "error.")
    parser.add_argument("--packed", default=True,
                        action=argparse.BooleanOptionalAction,
                        help="Serve through the row-packed fast path "
                             "(models/hrnet_packed.py; BN folded, "
                             "~2.5x the canonical forward on TPU — "
                             "the default for corpus jobs; "
                             "--no-packed runs the canonical parity "
                             "surface)")
    parser.add_argument("--int8", action="store_true",
                        help="Quantize the packed weights to int8 with "
                             "activation scales calibrated on the "
                             "first input images (requires --packed; "
                             "quantized numerics — validate before "
                             "trusting a production corpus)")
    parser.add_argument("--act_scales", default=None,
                        help="Activation-scale JSON for --int8 "
                             "(models.save_act_scales). If the file "
                             "exists it is used INSTEAD of calibrating "
                             "(a fleet calibrates once and ships the "
                             "file); if it does not, the scales "
                             "calibrated on this corpus are saved "
                             "there for the next process.")
    args = parser.parse_args()
    if args.int8 and not args.packed:
        parser.error("--int8 requires --packed")

    if args.force_cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from rtpe_tpu.data.preprocess import (
        normalize_image,
        resize_align_multi_scale,
    )
    from rtpe_tpu.data.teacher_cache import save_teacher_prediction
    from rtpe_tpu.models.factory import get_hrnet_w48_teacher
    from rtpe_tpu.utils import ColorLogger

    log = ColorLogger(os.path.basename(__file__))
    os.makedirs(args.out_dir, exist_ok=True)

    mp = args.model_path if (args.model_path
                             and os.path.exists(args.model_path)) else None
    if mp is None:
        if not args.allow_random_init:
            # a silent random-init corpus looks valid downstream but is
            # noise — fail loudly unless explicitly overridden
            log.error(f"model path {args.model_path!r} not found; pass "
                      f"--allow_random_init for a smoke/shape run")
            sys.exit(2)
        log.warning(f"model path {args.model_path!r} not found: "
                    f"RANDOM-INIT teacher (the npz corpus will be noise)")
    model, variables = get_hrnet_w48_teacher(mp)

    # bucket PATHS by original image size (from the header — no pixel
    # decode), then stream each chunk: decode/preprocess just-in-time so
    # a full-train2017 corpus run holds one batch in host memory, not
    # ~35+ GB of preloaded inputs
    from PIL import Image
    buckets = defaultdict(list)
    for img_path in args.input_paths:
        with Image.open(img_path) as im:
            w, h = im.size
        buckets[(h, w)].append(img_path)

    def load(img_path):
        img = np.asarray(Image.open(img_path).convert("RGB"),
                         dtype=np.float32)
        resized, _, _ = resize_align_multi_scale(img, args.input_size,
                                                 1, 1)
        return normalize_image(resized / 255.0)

    if args.packed:
        # the corpus job's hot path (VERDICT r2 item 1): BN folded +
        # row-packed layout, same (coarse, refined) contract as the
        # canonical apply (parity: tests/test_rowpack.py)
        from rtpe_tpu.models import pack_w48_params, packed_forward
        cfg = model.cfg
        pk = jax.jit(lambda v: pack_w48_params(v, cfg))(variables)
        if args.int8:
            from rtpe_tpu.models import (calibrate_act_scales,
                                         load_act_scales,
                                         quantize_packed,
                                         save_act_scales)
            import time as _time
            t0 = _time.time()
            if args.act_scales and os.path.exists(args.act_scales):
                scales = load_act_scales(args.act_scales)
                log.info(f"int8 scales loaded from {args.act_scales} "
                         f"({len(scales)} entries; calibration "
                         f"skipped)")
            else:
                # calibrate on REAL inputs from this very corpus (the
                # synthetic-calibration caveat does not apply here)
                calib_paths = args.input_paths[:4]
                calib = [load(p)[None] for p in calib_paths]
                scales = calibrate_act_scales(pk, calib, cfg)
                log.info(f"int8 calibration on {len(calib)} corpus "
                         f"images: {_time.time() - t0:.1f}s")
                if args.act_scales:
                    save_act_scales(args.act_scales, scales)
                    log.info(f"int8 scales saved to {args.act_scales}")
            pk = jax.jit(lambda p: quantize_packed(p, scales))(pk)
        fwd = jax.jit(lambda x: packed_forward(pk, x, cfg))
        log.info("serving path: packed" + (" + int8" if args.int8
                                           else " bf16"))
    else:
        fwd = jax.jit(lambda x: model.apply(variables, x, train=False))
        log.info("serving path: canonical")

    import time
    n_done, fwd_s = 0, 0.0
    for shape, paths in sorted(buckets.items()):
        for i in range(0, len(paths), args.batch_size):
            chunk = [(p, load(p)) for p in paths[i:i + args.batch_size]]
            x = jnp.asarray(np.stack([t for _, t in chunk]))
            t0 = time.time()
            coarse, refined = fwd(x)
            coarse = np.asarray(coarse, np.float32)  # sync + pull
            fwd_s += time.time() - t0
            refined = np.asarray(refined, np.float32)
            n_done += len(chunk)
            for k, (img_path, _) in enumerate(chunk):
                out = save_teacher_prediction(
                    args.out_dir, os.path.basename(img_path),
                    coarse[k], refined[k])
                log.info(f"saved predictions to {out}")
    if n_done and fwd_s > 0:
        # forward+pull rate (excl. compile-dominated first batch would
        # be nicer, but a corpus run amortizes it anyway)
        log.info(f"teacher forward rate: {n_done / fwd_s:.1f} img/s "
                 f"({n_done} images, {fwd_s:.1f}s forward+fetch)")


if __name__ == "__main__":
    main()
