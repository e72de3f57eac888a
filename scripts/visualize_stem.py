#!/usr/bin/env python
"""Dump the 256 stem feature planes of an image as PNGs.

Equivalent of the reference ``visualize_stem.py``: load the pretrained
fp16 stem (bf16 here), forward one image, write each feature plane as a
normalized grayscale PNG.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser("visualize_stem")
    p.add_argument("-i", "--image", required=True,
                   help="input image path")
    p.add_argument("-m", "--model_path",
                   default="models/pose_higher_hrnet_w48_640.pth.tar")
    p.add_argument("-o", "--out_dir", default="/tmp/stem_planes")
    p.add_argument("--max_planes", type=int, default=256)
    p.add_argument("--input_size", type=int, default=640,
                   help="resize target (reference fixes 640; smaller "
                        "keeps CPU smoke drives fast)")
    args = p.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from rtpe_tpu.data.preprocess import (
        normalize_image,
        resize_align_multi_scale,
    )
    from rtpe_tpu.io.torch_import import (
        import_stem_statedict,
        load_torch_statedict,
    )
    from rtpe_tpu.models import StemHRNet
    from rtpe_tpu.utils import ColorLogger

    log = ColorLogger(os.path.basename(__file__))
    os.makedirs(args.out_dir, exist_ok=True)

    class Holder(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return StemHRNet(dtype=jnp.bfloat16, name="stem")(x, train)

    model = Holder()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)))
    if os.path.exists(args.model_path):
        sd = load_torch_statedict(args.model_path)
        variables = import_stem_statedict(variables, sd)
        variables = jax.tree_util.tree_map(jnp.asarray, variables)
        log.info(f"loaded stem from {args.model_path}")
    else:
        log.warning("statedict not found; using random stem")

    img = cv2.cvtColor(cv2.imread(args.image), cv2.COLOR_BGR2RGB)
    resized, _, _ = resize_align_multi_scale(
        img.astype(np.float32), args.input_size, 1, 1)
    x = jnp.asarray(normalize_image(resized / 255.0)[None])
    feats = np.asarray(model.apply(variables, x), np.float32)[0]
    log.info(f"stem features: {feats.shape}")

    for plane in range(min(args.max_planes, feats.shape[-1])):
        f = feats[:, :, plane]
        f = (f - f.min()) / (f.max() - f.min() + 1e-9)
        out = os.path.join(args.out_dir, f"plane{plane}.png")
        cv2.imwrite(out, (f * 255).astype(np.uint8))
    log.info(f"wrote {min(args.max_planes, feats.shape[-1])} planes "
             f"to {args.out_dir}")


if __name__ == "__main__":
    main()
