"""Fixed-shape, device-augmented training pipeline.

The reference's data path is its biggest bottleneck: per-sample python
loading with ``num_workers=0`` and per-*channel* PIL augmentation replay
(``distillation.py:278-283``, SURVEY.md §3.5).  The TPU pipeline here:

1. host: decode + pad every sample onto a fixed canvas (numpy only) —
   with ``num_workers > 1``, a thread pool builds several batches
   concurrently (JPEG decode via cv2, RLE via the bundled C++ codec and
   numpy all release the GIL, so threads scale without pickling the
   ~60 MB host batches through process boundaries),
2. device: render Gaussian targets from joints, then warp *all* planes
   of the batch with one affine matrix per sample in a single batched
   ``affine_warp`` (image, alt image, masks, teacher maps, heatmaps
   together), entirely inside one jitted program,
3. ``prefetch`` finished batches are kept ahead of the consumer.

Every batch has identical shapes -> one XLA compilation.  With
``num_workers > 1`` each batch gets its own seed drawn up-front, so the
augmentation stream is deterministic for a given pipeline seed
regardless of worker count or scheduling; ``num_workers=1`` keeps the
round-1 sequential stream byte-for-byte.
"""

import queue
import threading
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from functools import partial
from typing import Iterator, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.affine import affine_warp
from ..ops.color import rgb_to_hsv, rgb_to_lab
from .augment import AugmentConfig, sample_affine_matrices
from .preprocess import IMG_MEAN, IMG_STD
from .targets import render_heatmaps

MAX_PEOPLE = 30


@partial(jax.jit, static_argnames=("out_hw", "sigmas", "num_joints",
                                   "alt_colorspace"))
def _augment_batch_device(imgs, masks, segms, teacher_hms, teacher_ae,
                          joints, matrices, out_hw: Tuple[int, int],
                          sigmas: Tuple[float, ...], num_joints: int,
                          alt_colorspace: str):
    """One fused device program: normalize, colorspace, render, warp.

    Accepts compact host dtypes (uint8 images/masks, float16 teacher
    maps) and widens on-device — the dtype is static under jit, so each
    combination compiles once.
    """
    if imgs.dtype == jnp.uint8:
        imgs = imgs.astype(jnp.float32) / 255.0
    else:
        imgs = imgs.astype(jnp.float32)
    masks = masks.astype(jnp.float32)
    segms = segms.astype(jnp.float32)
    teacher_hms = teacher_hms.astype(jnp.float32)
    teacher_ae = teacher_ae.astype(jnp.float32)
    alt_fn = rgb_to_lab if alt_colorspace == "LAB" else rgb_to_hsv
    img_alt = alt_fn(imgs)
    img_norm = (imgs - jnp.asarray(IMG_MEAN)) / jnp.asarray(IMG_STD)
    # one target set per sigma (reference gt_stddevs_pix list semantics,
    # dataloaders.py:114-118; live configs use a single sigma)
    gt_sets = [render_heatmaps(joints, imgs.shape[1:3], s)
               for s in sigmas]

    planes = jnp.concatenate([
        img_norm, img_alt, masks[..., None], segms[..., None],
        *gt_sets, teacher_hms, teacher_ae,
    ], axis=-1)
    warped = affine_warp(planes, matrices, out_hw)

    i = 0
    def take(n):
        nonlocal i
        out = warped[..., i:i + n]
        i += n
        return out

    out = {
        "img": take(3),
        "img_alt": take(3),
        "mask": take(1),
        "segm_mask": take(1),
        "gt_hms": take(num_joints),
    }
    for k in range(1, len(sigmas)):
        out[f"gt_hms_{k + 1}"] = take(num_joints)
    out["teacher_hms"] = take(teacher_hms.shape[-1])
    out["teacher_ae"] = take(teacher_ae.shape[-1])
    return out


class TrainPipeline:
    """Iterate device-ready augmented batches from a
    :class:`CocoDistillationDataset`."""

    def __init__(self, dataset, batch_size: int = 16,
                 out_hw: Tuple[int, int] = (450, 450),
                 sigma=7.0,
                 canvas_hw: Tuple[int, int] = (640, 640),
                 augment: Optional[AugmentConfig] = None,
                 alt_colorspace: str = "LAB",
                 teacher_ae_dims: int = 17,
                 seed: int = 0,
                 shuffle: bool = True,
                 prefetch: int = 2,
                 num_workers: int = 1,
                 compact_transfer: bool = True):
        self.ds = dataset
        self.batch_size = batch_size
        self.out_hw = tuple(out_hw)
        self.sigmas = tuple(float(s) for s in (
            sigma if isinstance(sigma, (tuple, list)) else (sigma,)))
        self.canvas_hw = tuple(canvas_hw)
        self.augment = augment or AugmentConfig(out_hw=self.out_hw)
        self.alt_colorspace = alt_colorspace
        self.teacher_ae_dims = teacher_ae_dims
        self.rng = np.random.RandomState(seed)
        self.shuffle = shuffle
        self.prefetch = prefetch
        self.num_workers = max(1, int(num_workers))
        self.num_joints = dataset.num_joints
        # Compact host->device transfer: images/masks ship as uint8 and
        # teacher maps as float16, halving+ the per-batch PCIe/ICI bytes
        # (a bs-16 640px batch drops ~64 MB -> ~30 MB).  The uint8 image
        # round-trip is EXACT (the decoder emits uint8/255 floats);
        # teacher maps quantize to f16 (~5e-4 relative) — distillation
        # targets, not gradients, so this is far below training noise.
        self.compact = bool(compact_transfer)

    # ------------------------------------------------------------------
    def _host_batch(self, indices, rng=None):
        rng = self.rng if rng is None else rng
        ch, cw = self.canvas_hw
        b = len(indices)
        j = self.num_joints
        img_dt = np.uint8 if self.compact else np.float32
        map_dt = np.float16 if self.compact else np.float32
        imgs = np.zeros((b, ch, cw, 3), img_dt)
        masks = np.zeros((b, ch, cw), img_dt)
        segms = np.zeros((b, ch, cw), img_dt)
        t_hms = np.zeros((b, ch, cw, j), map_dt)
        t_ae = np.zeros((b, ch, cw, self.teacher_ae_dims), map_dt)
        joints = np.zeros((b, MAX_PEOPLE, j, 3), np.float32)
        mats = np.zeros((b, 2, 3), np.float32)
        img_ids = np.zeros((b,), np.int64)

        for k, idx in enumerate(indices):
            s = self.ds[idx]
            h, w = s["img"].shape[:2]
            if h > ch or w > cw:
                raise ValueError(
                    f"sample {idx}: image {h}x{w} exceeds the "
                    f"{ch}x{cw} canvas — raise canvas_hw (COCO fits 640; "
                    f"silent cropping would corrupt joints/targets)")
            if self.compact:
                # exact inverse of load_image's uint8/255 -> float32
                imgs[k, :h, :w] = (s["img"][:h, :w] * 255.0 + 0.5)
            else:
                imgs[k, :h, :w] = s["img"][:h, :w]
            masks[k, :h, :w] = s["mask"][:h, :w]
            segms[k, :h, :w] = s["segm_mask"][:h, :w]
            if s["teacher_hms"].size:
                t_hms[k, :h, :w] = s["teacher_hms"][:h, :w]
                d = min(self.teacher_ae_dims, s["teacher_ae"].shape[-1])
                t_ae[k, :h, :w, :d] = s["teacher_ae"][:h, :w, :d]
            p = min(MAX_PEOPLE, s["joints"].shape[0])
            joints[k, :p] = s["joints"][:p]
            mats[k] = sample_affine_matrices(rng, 1, (h, w),
                                             self.augment)[0]
            img_ids[k] = s["img_id"]
        return imgs, masks, segms, t_hms, t_ae, joints, mats, img_ids

    def _epoch_indices(self):
        idx = np.arange(len(self.ds))
        if self.shuffle:
            self.rng.shuffle(idx)
        n_full = len(idx) // self.batch_size
        return [idx[i * self.batch_size:(i + 1) * self.batch_size]
                for i in range(n_full)]

    # ------------------------------------------------------------------
    def host_batches(self) -> Iterator[tuple]:
        """Yield raw host batches for one epoch (the CPU-side feed)."""
        batches = self._epoch_indices()
        if self.num_workers == 1:
            q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
            # stop flag so an abandoned generator (consumer breaks out
            # early) releases the producer instead of leaking a thread
            # blocked on q.put holding a ~60 MB batch per epoch
            stop = threading.Event()

            def put(item) -> bool:
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.5)
                        return True
                    except queue.Full:
                        continue
                return False

            def producer():
                try:
                    for inds in batches:
                        if not put(self._host_batch(inds)):
                            return
                    put(None)
                except BaseException as e:  # re-raised on consumer side
                    put(e)

            t = threading.Thread(target=producer, daemon=True)
            t.start()
            try:
                while True:
                    item = q.get()
                    if item is None:
                        return
                    if isinstance(item, BaseException):
                        raise item
                    yield item
            finally:
                stop.set()
        else:
            # per-batch seeds drawn up front: deterministic streams
            # independent of scheduling
            seeds = self.rng.randint(0, 2 ** 31 - 1, size=len(batches))
            inflight = self.num_workers + self.prefetch
            with ThreadPoolExecutor(self.num_workers) as ex:
                futs = deque()
                nxt = 0
                while nxt < min(inflight, len(batches)):
                    futs.append(ex.submit(
                        self._host_batch, batches[nxt],
                        np.random.RandomState(seeds[nxt])))
                    nxt += 1
                while futs:
                    item = futs.popleft().result()
                    if nxt < len(batches):
                        futs.append(ex.submit(
                            self._host_batch, batches[nxt],
                            np.random.RandomState(seeds[nxt])))
                        nxt += 1
                    yield item

    def __iter__(self) -> Iterator[dict]:
        for item in self.host_batches():
            imgs, masks, segms, t_hms, t_ae, joints, mats, img_ids = item
            batch = _augment_batch_device(
                jnp.asarray(imgs), jnp.asarray(masks), jnp.asarray(segms),
                jnp.asarray(t_hms), jnp.asarray(t_ae), jnp.asarray(joints),
                jnp.asarray(mats), self.out_hw, self.sigmas,
                self.num_joints, self.alt_colorspace)
            batch["img_id"] = img_ids
            yield batch

    def __len__(self):
        return len(self.ds) // self.batch_size
