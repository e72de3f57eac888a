"""Student evaluation loop (reference ``rtpe/engine.py:21-75``).

For each image: forward the model at native size, split heatmap / AE
channels, decode with the HeatmapParser, optionally save skeleton
overlays, and finally compute COCO keypoint AP over the dataset's ids.
"""

import os
from typing import Callable, Optional

import numpy as np

import jax.numpy as jnp


def eval_student(apply_fn: Callable, hm_parser, dataset,
                 num_heatmaps: int = 17,
                 save_every: Optional[int] = None,
                 save_dir: str = "/tmp",
                 logger=None):
    """:param apply_fn: ``f(img_nhwc, out_hw) -> (B, h, w, C)`` heatmap+AE
      prediction (already closed over model variables, jitted by caller).
    :param hm_parser: :class:`rtpe_tpu.decode.HeatmapParser`.
    :param dataset: :class:`rtpe_tpu.data.CocoDistillationDataset`.
    :returns: COCO stats dict (name -> value).
    """
    from ..obs.vis import save_valid_image

    all_preds = []
    all_scores = []
    for batch_i in range(len(dataset)):
        sample = dataset[batch_i]
        img = sample["img"]
        out_hw = img.shape[:2]
        pred = apply_fn(jnp.asarray(img[None]), out_hw)
        # slice on-device: pulling the native-resolution map to host
        # and re-uploading costs two full-tensor transfers per image
        pred = pred.astype(jnp.float32)
        grouped, scores = hm_parser.parse_batch(
            pred[..., :num_heatmaps], pred[..., num_heatmaps:],
            adjust=True, refine=True)
        final_results = [x for x in grouped[0] if x.size > 0]
        all_preds.append(final_results)
        all_scores.append(scores[0])
        if logger is not None:
            logger.info(f"eval: {batch_i} ({len(final_results)} people)")
        if save_every is not None and batch_i % save_every == 0:
            save_valid_image(
                img, final_results,
                os.path.join(save_dir, f"student_minival_{batch_i}.jpg"))

    stats = dataset.evaluate(all_preds, all_scores)
    if logger is not None:
        logger.info("\n".join(f"{k}={v}" for k, v in stats.items()))
    return stats
