"""HeatmapParser: the full decode pipeline with the reference's API.

Equivalent of ``rtpe/third_party/group.py:125-287``: device-side
NMS/top-k (jit, batched), host-side grouping, quarter-pixel adjust
(DARK-style) and tag-guided refinement of missed joints.

Inputs are NHWC jax arrays (or numpy); the reference took NCHW torch
tensors — callers inside this package always produce NHWC.

PROVENANCE / LICENSE: ``adjust_people`` / ``refine_person`` below are
host-side transliterations of the HigherHRNet adjust/refine steps the
reference vendors (Copyright (c) Microsoft, MIT License — see
``THIRD_PARTY_NOTICES.md``).  Their ±0.25-px and tag-penalized-argmax
logic cannot differ and still be parity-exact; they are kept SOLELY as
the parity oracles for the TPU-native device implementations in
``refine_device.py`` and ``fused.py``.
"""

from typing import List, Tuple

import numpy as np

from .group import GroupingParams, match_by_tag
from .nms import top_k, top_k_adjusted


def adjust_people(people: np.ndarray, det_hw_j: np.ndarray) -> np.ndarray:
    """Quarter-pixel adjust toward the heatmap gradient + 0.5 centering.

    Semantics of reference ``HeatmapParser.adjust`` (``group.py:181-200``)
    for one image.

    :param people: (P, J, 3+D) grouped joints, x/y in columns 0/1.
    :param det_hw_j: (H, W, J) heatmaps (numpy, host).
    """
    h, w, _ = det_hw_j.shape
    for person in people:
        for joint_id, joint in enumerate(person):
            if joint[2] > 0:
                xf, yf = joint[0:2]
                xi, yi = int(xf), int(yf)
                tmp = det_hw_j[:, :, joint_id]
                # x direction (columns)
                if tmp[yi, min(xi + 1, w - 1)] > tmp[yi, max(xi - 1, 0)]:
                    xf += 0.25
                else:
                    xf -= 0.25
                # y direction (rows)
                if tmp[min(yi + 1, h - 1), xi] > tmp[max(0, yi - 1), xi]:
                    yf += 0.25
                else:
                    yf -= 0.25
                joint[0:2] = (xf + 0.5, yf + 0.5)
    return people


def refine_person(det: np.ndarray, tag: np.ndarray,
                  keypoints: np.ndarray) -> np.ndarray:
    """Recover missed joints of one person by tag-distance-penalized
    argmax (reference ``HeatmapParser.refine``, ``group.py:202-264``).

    :param det: (H, W, J) heatmaps.
    :param tag: (H, W, J, D) tag maps.
    :param keypoints: (J, 3+D) this person's joints (modified copy
      returned).
    """
    h, w, num_joints = det.shape
    if tag.ndim == 3:
        tag = tag[:, :, :, None]

    tags = []
    for i in range(keypoints.shape[0]):
        if keypoints[i, 2] > 0:
            x, y = keypoints[i][:2].astype(np.int32)
            x = np.clip(x, 0, w - 1)
            y = np.clip(y, 0, h - 1)
            tags.append(tag[y, x, i])
    if not tags:
        return keypoints
    prev_tag = np.mean(tags, axis=0)

    ans = []
    for i in range(keypoints.shape[0]):
        tmp = det[:, :, i]
        tt = np.sqrt(((tag[:, :, i] - prev_tag[None, None, :]) ** 2)
                     .sum(axis=2))
        tmp2 = tmp - np.round(tt)
        y, x = np.unravel_index(np.argmax(tmp2), tmp.shape)
        xx, yy = x, y
        val = tmp[y, x]
        x = x + 0.5
        y = y + 0.5
        if tmp[yy, min(xx + 1, w - 1)] > tmp[yy, max(xx - 1, 0)]:
            x += 0.25
        else:
            x -= 0.25
        if tmp[min(yy + 1, h - 1), xx] > tmp[max(0, yy - 1), xx]:
            y += 0.25
        else:
            y -= 0.25
        ans.append((x, y, val))
    ans = np.array(ans)

    for i in range(num_joints):
        if ans[i, 2] > 0 and keypoints[i, 2] == 0:
            keypoints[i, :2] = ans[i, :2]
            keypoints[i, 2] = ans[i, 2]
    return keypoints


class HeatmapParser:
    """Same constructor surface as the reference class (``group.py:125``)."""

    def __init__(self, num_joints=17, max_num_people=30,
                 detection_threshold=0.1, tag_threshold=1.0,
                 use_detection_val=True, ignore_too_much=False,
                 tag_per_joint=True, nms_ksize=5, nms_padding=2):
        self.params = GroupingParams(num_joints, max_num_people,
                                     detection_threshold, tag_threshold,
                                     use_detection_val, ignore_too_much)
        self.tag_per_joint = tag_per_joint
        self.nms_ksize = nms_ksize
        self.nms_padding = nms_padding

    def top_k(self, det, tag):
        """Device-side NMS + top-k.  det (B, H, W, J); tag (B, H, W, T).
        Uses the fused Pallas kernel on TPU backends."""
        import jax
        use_pallas = jax.devices()[0].platform == "tpu"
        val_k, loc_k, tag_k = top_k(
            det, tag, self.params.max_num_people,
            self.nms_ksize, self.nms_padding, self.tag_per_joint,
            use_pallas=use_pallas)
        # one batched transfer: each host pull over the interconnect has
        # tens of ms of fixed latency
        val_k, loc_k, tag_k = jax.device_get((val_k, loc_k, tag_k))
        return (val_k.astype(np.float32), loc_k.astype(np.int32),
                tag_k.astype(np.float32))

    def match(self, val_k, loc_k, tag_k) -> List[np.ndarray]:
        return [match_by_tag(t, l, v, self.params)
                for t, l, v in zip(tag_k, loc_k, val_k)]

    def parse(self, det, tag, adjust: bool = True, refine: bool = True,
              on_device=None) -> Tuple[List[np.ndarray], List[float]]:
        """Full decode of a batch-1 NHWC heatmap/tag pair.

        :param on_device: when both adjust and refine are requested, run
          them as one jitted program on device (only the tiny grouped
          people tensor crosses the host boundary).  The host path is
          the reference-exact fallback and the parity oracle.  Default
          (None) picks by heatmap size: beyond ~32 MB the device path
          avoids the dominant full-tensor device->host pull.
        :returns: ``([people], scores)``: people (P, J, 3+D) float32,
          scores list of per-person mean joint values (pre-refine, like
          the reference, ``group.py:272``).
        """
        val_k, loc_k, tag_k = self.top_k(det, tag)
        ans = self.match(val_k, loc_k, tag_k)

        if on_device is None:
            nbytes = (int(np.prod(det.shape)) + int(np.prod(tag.shape))) * 4
            on_device = nbytes > 32 * 1024 * 1024

        if on_device and adjust and refine:
            return self._finish_on_device(det, tag, ans[0])

        det_np = np.asarray(det, dtype=np.float32)
        tag_np = np.asarray(tag, dtype=np.float32)

        if adjust:
            for b, people in enumerate(ans):
                ans[b] = adjust_people(people, det_np[b])

        scores = [float(person[:, 2].mean()) for person in ans[0]]

        if refine:
            people = ans[0]
            tag_img = self._tag_image(tag_np[0], det_np[0].shape[-1])
            for i in range(len(people)):
                people[i] = refine_person(det_np[0], tag_img, people[i])
            ans = [people]

        return ans, scores

    def parse_batch(self, det, tag, adjust: bool = True,
                    refine: bool = True, fast: bool = True
                    ) -> Tuple[List[List[np.ndarray]], List[List[float]]]:
        """Production batched decode: at most two device dispatches.

        Per-candidate quarter-pixel adjust runs inside the top-k
        dispatch (``nms.adjust_locs`` — exact, since grouping never
        moves coordinates), grouping runs on host per image
        (array-based ``match_by_tag_fast`` unless ``fast=False``), and
        the tag-guided refine batches ONLY the people that actually
        have missing joints into one device program
        (``refine_device.refine_batch_device``); images of complete
        people skip the second dispatch entirely.  Results equal
        :meth:`parse` with the host/oracle path per image (up to the
        ulp-level mean caveat in ``group_fast``).

        :param det: (B, H, W, J) heatmaps; tag (B, H, W, J*D or D).
        :returns: ``(people, scores)`` — per image: list of (J, 3+D)
          person arrays, list of per-person scores.
        """
        import jax

        from .group_fast import match_by_tag_fast

        use_pallas = jax.devices()[0].platform == "tpu"
        fn = top_k_adjusted if adjust else top_k
        val_k, loc_k, tag_k = jax.device_get(fn(
            det, tag, self.params.max_num_people, self.nms_ksize,
            self.nms_padding, self.tag_per_joint, use_pallas=use_pallas))
        matcher = match_by_tag_fast if fast else match_by_tag
        ans = [matcher(t, l, v, self.params)
               for t, l, v in zip(tag_k, loc_k, val_k)]
        scores = [[float(p[:, 2].mean()) for p in people]
                  for people in ans]
        ans = [list(a) for a in ans]

        if refine:
            # (image, person) indices that actually need refinement
            needy = [(i, k) for i, people in enumerate(ans)
                     for k, p in enumerate(people)
                     if (p[:, 2] == 0).any()]
            if needy:
                import jax.numpy as jnp

                b = len(ans)
                j = self.params.num_joints
                d = tag_k.shape[-1]
                per_img = [[] for _ in range(b)]
                for i, k in needy:
                    per_img[i].append(k)
                # bucket the per-image people dim to bound recompiles
                max_p = max(len(ks) for ks in per_img)
                p_pad = ((max_p + 14) // 15) * 15
                padded = np.zeros((b, p_pad, j, 3 + d), np.float32)
                for i, ks in enumerate(per_img):
                    for slot, k in enumerate(ks):
                        padded[i, slot] = ans[i][k]
                det_j = jnp.asarray(det)
                tag_j = jnp.asarray(tag)
                h, w = det_j.shape[1:3]
                if self.tag_per_joint:
                    tag_img = tag_j.reshape(b, h, w, j, d)
                else:
                    tag_img = jnp.broadcast_to(
                        tag_j[:, :, :, None, :], (b, h, w, j, d))
                from .refine_device import refine_batch_device
                refined = np.asarray(refine_batch_device(
                    det_j, tag_img, jnp.asarray(padded)))
                for i, ks in enumerate(per_img):
                    for slot, k in enumerate(ks):
                        ans[i][k] = refined[i, slot]
        return ans, scores

    def parse_fused(self, det, tag):
        """Whole decode as ONE device program + one host pull
        (:mod:`rtpe_tpu.decode.fused`).  Output contract identical to
        :meth:`parse` with adjust+refine.  Assignment tie-breaking may
        differ from munkres on exact cost ties (same total cost)."""
        import jax

        from .fused import decode_full

        use_pallas = jax.devices()[0].platform == "tpu"
        people, n_people, scores = jax.device_get(decode_full(
            det, tag,
            max_num_people=self.params.max_num_people,
            detection_threshold=self.params.detection_threshold,
            tag_threshold=self.params.tag_threshold,
            use_detection_val=self.params.use_detection_val,
            ignore_too_much=self.params.ignore_too_much,
            tag_per_joint=self.tag_per_joint,
            nms_ksize=self.nms_ksize, nms_padding=self.nms_padding,
            use_pallas=use_pallas))
        n = int(n_people)
        return [list(people[:n])], [float(s) for s in scores[:n]]

    def parse_fused_batch(self, det, tag
                          ) -> Tuple[List[List[np.ndarray]],
                                     List[List[float]]]:
        """Batched :meth:`parse_fused`: the WHOLE batch decode as one
        device program + one host pull (:func:`fused.decode_full_batch`
        — on TPU the greedy grouping mega-kernel, 2.08 ms/img at
        crowded batch-32 vs 7.6 for :meth:`parse_batch`'s hybrid
        host-grouping path).  Output contract equals
        :meth:`parse_batch` (adjust+refine); assignment tie-breaking
        may differ from munkres on exact cost ties."""
        import jax

        from .fused import decode_full_batch

        use_pallas = jax.devices()[0].platform == "tpu"
        people, n_people, scores = jax.device_get(decode_full_batch(
            det, tag,
            max_num_people=self.params.max_num_people,
            detection_threshold=self.params.detection_threshold,
            tag_threshold=self.params.tag_threshold,
            use_detection_val=self.params.use_detection_val,
            ignore_too_much=self.params.ignore_too_much,
            tag_per_joint=self.tag_per_joint,
            nms_ksize=self.nms_ksize, nms_padding=self.nms_padding,
            use_pallas=use_pallas))
        out_p: List[List[np.ndarray]] = []
        out_s: List[List[float]] = []
        for i in range(people.shape[0]):
            n = int(n_people[i])
            out_p.append(list(people[i, :n]))
            out_s.append([float(s) for s in scores[i, :n]])
        return out_p, out_s

    def _tag_image(self, tag_hwt: np.ndarray, j: int) -> np.ndarray:
        h, w = tag_hwt.shape[:2]
        if self.tag_per_joint:
            d = tag_hwt.shape[-1] // j
            return tag_hwt.reshape(h, w, j, d)
        d = tag_hwt.shape[-1]
        return np.broadcast_to(tag_hwt[:, :, None, :], (h, w, j, d))

    def _finish_on_device(self, det, tag, people: List[np.ndarray]):
        import jax.numpy as jnp

        from .refine_device import adjust_refine_device

        if len(people) == 0:
            d = (tag.shape[-1] // det.shape[-1] if self.tag_per_joint
                 else tag.shape[-1])
            return [np.zeros((0, self.params.num_joints, 3 + d),
                             np.float32)], []
        j = self.params.num_joints
        d = people[0].shape[-1] - 3
        # pad the people dim to a small set of buckets to bound recompiles
        p = len(people)
        p_pad = ((p + 29) // 30) * 30
        padded = np.zeros((p_pad, j, 3 + d), np.float32)
        padded[:p] = np.stack(people)

        det0 = jnp.asarray(det)[0]
        tag0 = jnp.asarray(tag)[0]
        h, w = det0.shape[:2]
        if self.tag_per_joint:
            tag_img = tag0.reshape(h, w, j, d)
        else:
            tag_img = jnp.broadcast_to(tag0[:, :, None, :], (h, w, j, d))
        import jax
        out, scores = jax.device_get(adjust_refine_device(
            det0, tag_img, jnp.asarray(padded)))
        out = out[:p]
        scores = [float(s) for s in scores[:p]]
        return [list(out)], scores
