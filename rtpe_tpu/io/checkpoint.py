"""Checkpointing: orbax train-state snapshots with auto-resume, plus
reference-style per-submodule statedict parts.

The reference saves 7 per-submodule torch statedicts per epoch named
``{timestamp}_epoch{E}_step{S}{part}.statedict``
(``distillation.py:422-431``) and resumes by manually uncommenting a
load block; here:

* full train state (params, batch stats, optimizer, step) goes through
  orbax with retention + latest-step discovery -> automatic resume
  (SURVEY.md §5.3/5.4 names this as a gap to close);
* :func:`save_student_parts` / :func:`load_student_parts` keep the
  reference's part granularity (npz per part) so individual submodules
  can be shipped/loaded like the 4MB pretrained attention snapshot
  (``assets/pretrained_segm_4MB``).
"""

import os
import re
import signal
from typing import Dict, List, Optional

import numpy as np

from flax.traverse_util import flatten_dict, unflatten_dict

# part name -> top-level flax param prefixes (AttentionStudentSteps)
STUDENT_PARTS = {
    "mid_stem": ("mid_stem_conv0", "mid_stem_bn0",
                 "mid_stem_conv1", "mid_stem_bn1"),
    "att_lo": ("att/lo",),
    "att_mid": ("att/mid",),
    "att_hi": ("att/hi",),
    "att_top": ("att_top",),
    "steps": ("step0", "step1", "step2", "det_top"),
    "alt_img_stem": ("alt_stem_conv0", "alt_stem_bn0",
                     "alt_stem_conv1", "alt_stem_bn1"),
}


def _part_of(path) -> Optional[str]:
    joined = "/".join(path)
    for part, prefixes in STUDENT_PARTS.items():
        if any(joined == p or joined.startswith(p + "/")
               for p in prefixes):
            return part
    return None


def save_student_parts(variables: Dict, out_dir: str, prefix: str) -> List[str]:
    """Write one ``{prefix}{part}.statedict.npz`` per part."""
    os.makedirs(out_dir, exist_ok=True)
    buckets = {part: {} for part in STUDENT_PARTS}
    for collection in ("params", "batch_stats"):
        if collection not in variables:
            continue
        for path, val in flatten_dict(variables[collection]).items():
            part = _part_of(path)
            if part is not None:
                key = collection + "/" + "/".join(path)
                buckets[part][key] = np.asarray(val)
    written = []
    for part, arrs in buckets.items():
        if not arrs:
            continue
        path = os.path.join(out_dir, f"{prefix}{part}.statedict.npz")
        np.savez_compressed(path, **arrs)
        written.append(path)
    return written


def save_parts_by_toplevel(variables: Dict, out_dir: str,
                           prefix: str) -> List[str]:
    """Part snapshots for arbitrary students: one npz per top-level
    module (stem excluded — it is the frozen pretrained part)."""
    os.makedirs(out_dir, exist_ok=True)
    buckets: Dict[str, Dict[str, np.ndarray]] = {}
    for collection in ("params", "batch_stats"):
        if collection not in variables:
            continue
        for path, val in flatten_dict(variables[collection]).items():
            top = path[0]
            if top == "stem":
                continue
            key = collection + "/" + "/".join(path)
            buckets.setdefault(top, {})[key] = np.asarray(val)
    written = []
    for part, arrs in buckets.items():
        path = os.path.join(out_dir, f"{prefix}{part}.statedict.npz")
        np.savez_compressed(path, **arrs)
        written.append(path)
    return written


def load_student_parts(variables: Dict, in_dir: str, prefix: str,
                       parts: Optional[List[str]] = None) -> Dict:
    """Load saved parts back into a variable template (non-strict over
    parts, strict within a part)."""
    flat = {c: dict(flatten_dict(variables[c]))
            for c in variables}
    for part in (parts or STUDENT_PARTS):
        path = os.path.join(in_dir, f"{prefix}{part}.statedict.npz")
        if not os.path.exists(path):
            continue
        npz = np.load(path)
        for key in npz.files:
            collection, *rest = key.split("/")
            tpl = flat[collection].get(tuple(rest))
            if tpl is None:
                raise KeyError(f"unknown key {key} in {path}")
            if tuple(np.shape(tpl)) != npz[key].shape:
                raise ValueError(f"shape mismatch for {key}")
            flat[collection][tuple(rest)] = npz[key]
    return {c: unflatten_dict(d) for c, d in flat.items()}


class TrainCheckpointer:
    """Orbax checkpoint manager with latest-step auto-resume and a
    SIGTERM save hook (preemption tolerance)."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )
        self._sigterm_state = None

    def save(self, step: int, state) -> None:
        import orbax.checkpoint as ocp
        self.manager.save(int(step), args=ocp.args.StandardSave(state))
        self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, state_template):
        """Restore the latest checkpoint into the template's structure;
        returns the template unchanged when no checkpoint exists."""
        import orbax.checkpoint as ocp
        step = self.latest_step()
        if step is None:
            return state_template, None
        restored = self.manager.restore(
            step, args=ocp.args.StandardRestore(state_template))
        return restored, step

    def install_sigterm_save(self, get_state) -> None:
        """On SIGTERM, save the current state before exiting."""

        def handler(signum, frame):
            state = get_state()
            if state is not None:
                self.save(int(np.asarray(state.step)), state)
            raise SystemExit(143)

        signal.signal(signal.SIGTERM, handler)
