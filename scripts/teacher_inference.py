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
    parser.add_argument("-b", "--batch_size", type=int, default=4,
                        help="Per-bucket batch size")
    args = parser.parse_args()

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

    model, variables = get_hrnet_w48_teacher(args.model_path)
    fwd = jax.jit(lambda x: model.apply(variables, x, train=False))

    # preprocess on host, bucket by resized shape
    from PIL import Image
    buckets = defaultdict(list)
    for img_path in args.input_paths:
        img = np.asarray(Image.open(img_path).convert("RGB"),
                         dtype=np.float32)
        resized, center, scale = resize_align_multi_scale(
            img, INPUT_SIZE, 1, 1)
        t = normalize_image(resized / 255.0)
        buckets[t.shape].append((img_path, t))
        log.info(f"prepared {img_path} -> {t.shape}")

    for shape, items in buckets.items():
        for i in range(0, len(items), args.batch_size):
            chunk = items[i:i + args.batch_size]
            x = jnp.asarray(np.stack([t for _, t in chunk]))
            coarse, refined = fwd(x)
            coarse = np.asarray(coarse, np.float32)
            refined = np.asarray(refined, np.float32)
            for k, (img_path, _) in enumerate(chunk):
                out = save_teacher_prediction(
                    args.out_dir, os.path.basename(img_path),
                    coarse[k], refined[k])
                log.info(f"saved predictions to {out}")


if __name__ == "__main__":
    main()
