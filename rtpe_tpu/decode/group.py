"""Associative-embedding grouping (host side, numpy).

Re-implements the exact decision procedure of the reference
``match_by_tag`` (``rtpe/third_party/group.py:26-97``): joints are
visited in order; detections above ``detection_threshold`` are matched
to existing people by L2 tag distance via a Hungarian assignment (with
the ``round(dist)*100 - val`` detection-value tie-break), gated by
``tag_threshold``; unmatched detections found new people keyed by their
first tag value.

The Hungarian solve uses the bundled C++ Jonker-Volgenant solver when
built (``rtpe_tpu/native``), else scipy.  Both reproduce the munkres
zero-padding semantics the reference relies on: rectangular matrices are
padded to square with zeros, every row/col of the square matrix is
assigned, and all pairs are returned (the caller drops out-of-range
ones, exactly like the reference's bounds check at ``group.py:81-85``).

PROVENANCE / LICENSE: ``match_by_tag`` below is a deliberate host-side
transliteration of the HigherHRNet grouping algorithm the reference
vendors (Copyright (c) Microsoft, MIT License — see
``THIRD_PARTY_NOTICES.md``; originally by Bin Xiao, modified by Bowen
Cheng, derived in turn from princeton-vl/pose-ae-train).  It exists
SOLELY as the bit-exact parity oracle that the genuinely TPU-native
device implementations (``group_jit.py``, ``fused.py``) are asserted
against (SURVEY.md §7 hard-part 1); it is not a product component.
"""

import numpy as np

from ..native import lap_solve


def munkres_assign(cost: np.ndarray) -> np.ndarray:
    """All (row, col) pairs of the optimal square assignment of ``cost``
    zero-padded to square — munkres-compatible output."""
    cost = np.asarray(cost, dtype=np.float64)
    n, m = cost.shape
    k = max(n, m)
    if n != m:
        sq = np.zeros((k, k), dtype=np.float64)
        sq[:n, :m] = cost
    else:
        sq = cost
    rows, cols = lap_solve(sq)
    return np.stack([rows, cols], axis=1).astype(np.int32)


class GroupingParams:
    """Mirror of the reference ``Params`` object (``group.py:100-122``)."""

    def __init__(self, num_joints, max_num_people, detection_threshold,
                 tag_threshold, use_detection_val, ignore_too_much):
        self.num_joints = num_joints
        self.max_num_people = max_num_people
        self.detection_threshold = detection_threshold
        self.tag_threshold = tag_threshold
        self.use_detection_val = use_detection_val
        self.ignore_too_much = ignore_too_much
        self.joint_order = list(range(num_joints))


def match_by_tag(tag_k: np.ndarray, loc_k: np.ndarray, val_k: np.ndarray,
                 params: GroupingParams) -> np.ndarray:
    """Group one image's top-k detections into people.

    :param tag_k: (J, K, D) tag vectors of the top-k peaks per joint.
    :param loc_k: (J, K, 2) x, y integer peak locations.
    :param val_k: (J, K) peak scores.
    :returns: (P, J, 3 + D) array: per person per joint
      (x, y, score, tags...); empty (0, J, 3+D) when nothing detected.
    """
    tag_k = np.asarray(tag_k, dtype=np.float64)
    loc_k = np.asarray(loc_k, dtype=np.float64)
    val_k = np.asarray(val_k, dtype=np.float64)
    d = tag_k.shape[2]
    default = np.zeros((params.num_joints, 3 + d))

    joint_dict = {}
    tag_dict = {}
    for i in range(params.num_joints):
        idx = params.joint_order[i]

        tags = tag_k[idx]
        joints = np.concatenate(
            (loc_k[idx], val_k[idx, :, None], tags), axis=1)
        mask = joints[:, 2] > params.detection_threshold
        tags = tags[mask]
        joints = joints[mask]

        if joints.shape[0] == 0:
            continue

        if i == 0 or len(joint_dict) == 0:
            for tag, joint in zip(tags, joints):
                key = tag[0]
                joint_dict.setdefault(key, np.copy(default))[idx] = joint
                tag_dict[key] = [tag]
            continue

        grouped_keys = list(joint_dict.keys())[:params.max_num_people]
        grouped_tags = [np.mean(tag_dict[k], axis=0) for k in grouped_keys]

        if (params.ignore_too_much
                and len(grouped_keys) == params.max_num_people):
            continue

        diff = joints[:, None, 3:] - np.array(grouped_tags)[None, :, :]
        diff_normed = np.linalg.norm(diff, ord=2, axis=2)
        diff_saved = np.copy(diff_normed)

        if params.use_detection_val:
            diff_normed = np.round(diff_normed) * 100 - joints[:, 2:3]

        num_added = diff.shape[0]
        num_grouped = diff.shape[1]
        if num_added > num_grouped:
            diff_normed = np.concatenate(
                (diff_normed,
                 np.zeros((num_added, num_added - num_grouped)) + 1e10),
                axis=1)

        pairs = munkres_assign(diff_normed)
        for row, col in pairs:
            if (row < num_added and col < num_grouped
                    and diff_saved[row][col] < params.tag_threshold):
                key = grouped_keys[col]
                joint_dict[key][idx] = joints[row]
                tag_dict[key].append(tags[row])
            else:
                if row >= num_added:
                    continue
                key = tags[row][0]
                joint_dict.setdefault(key, np.copy(default))[idx] = \
                    joints[row]
                tag_dict[key] = [tags[row]]

    if not joint_dict:
        return np.zeros((0, params.num_joints, 3 + d), dtype=np.float32)
    return np.array([joint_dict[k] for k in joint_dict]).astype(np.float32)
