"""Torch-statedict -> Flax-variables importer.

The pretrained HigherHRNet-W48 teacher ships as a torch statedict
(reference path contract ``models/pose_higher_hrnet_w48_640.pth.tar``,
``README.md:14``) whose keys carry a ``"1."`` prefix from the fp16
``network_to_half`` Sequential wrapper (``rtpe/helpers.py:69``,
``rtpe/students.py:275``).  This module maps those keys onto the flax
module tree of :class:`rtpe_tpu.models.PoseHigherHRNet` /
:class:`rtpe_tpu.models.StemHRNet`, with the layout conversions:

* conv weight      OIHW   -> HWIO
* conv-transpose   IOHW   -> HWIO (stored (kh, kw, in, out))
* linear weight    (o, i) -> (i, o)
* BN weight/bias/running_mean/running_var -> scale/bias/mean/var

The mapping is *structural*: every leaf of the flax variable template is
translated to exactly one torch key, and unmatched torch keys (other
than ``num_batches_tracked``) are reported, so a silent partial load is
impossible.
"""

import re
from typing import Any, Dict, Tuple

import numpy as np

try:
    from flax.traverse_util import flatten_dict, unflatten_dict
except ImportError:  # pragma: no cover
    flatten_dict = unflatten_dict = None


def load_torch_statedict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch statedict file into numpy arrays (CPU, no grad)."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.detach().to(torch.float32).numpy()
            for k, v in sd.items() if hasattr(v, "detach")}


def strip_fp16_prefix(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Remove the ``network_to_half`` Sequential ``"1."`` key prefix."""
    if all(k.startswith("1.") for k in sd):
        return {k[2:]: v for k, v in sd.items()}
    return sd


# -----------------------------------------------------------------------------
# flax-path -> torch-key translation
# -----------------------------------------------------------------------------
# flax leaf name -> torch key suffix (single source for every importer)
_LEAF_SUFFIXES = {"kernel": "weight", "scale": "weight", "bias": "bias",
                  "mean": "running_mean", "var": "running_var"}


def _block_inner(parts: Tuple[str, ...]) -> str:
    """Translate the inside of a BasicBlock/Bottleneck."""
    name = parts[0]
    if name == "downsample_conv":
        return "downsample.0"
    if name == "downsample_bn":
        return "downsample.1"
    return name  # conv1/bn1/conv2/bn2/conv3/bn3


def _teacher_prefix(parts: Tuple[str, ...]) -> str:
    """Torch module prefix for a flax module path inside PoseHigherHRNet."""
    head = parts[0]

    m = re.fullmatch(r"(conv1|bn1|conv2|bn2)", head)
    if m:
        return head

    m = re.fullmatch(r"layer1_(\d+)", head)
    if m:
        return f"layer1.{m.group(1)}." + _block_inner(parts[1:])

    m = re.fullmatch(r"transition(\d)_(\d+)_(conv|bn)", head)
    if m:
        t, i, kind = m.groups()
        idx = 0 if kind == "conv" else 1
        return f"transition{t}.{i}.{idx}"

    m = re.fullmatch(r"transition(\d)_(\d+)_(\d+)_(conv|bn)", head)
    if m:
        t, i, j, kind = m.groups()
        idx = 0 if kind == "conv" else 1
        return f"transition{t}.{i}.{j}.{idx}"

    m = re.fullmatch(r"stage(\d)_(\d+)", head)
    if m:
        s, mod = m.groups()
        inner = parts[1]
        mi = re.fullmatch(r"branch(\d+)_(\d+)", inner)
        if mi:
            i, j = mi.groups()
            return (f"stage{s}.{mod}.branches.{i}.{j}."
                    + _block_inner(parts[2:]))
        mi = re.fullmatch(r"fuse(\d+)_(\d+)_(conv|bn)", inner)
        if mi:
            i, j, kind = mi.groups()
            idx = 0 if kind == "conv" else 1
            return f"stage{s}.{mod}.fuse_layers.{i}.{j}.{idx}"
        mi = re.fullmatch(r"fuse(\d+)_(\d+)_(\d+)_(conv|bn)", inner)
        if mi:
            i, j, k, kind = mi.groups()
            idx = 0 if kind == "conv" else 1
            return f"stage{s}.{mod}.fuse_layers.{i}.{j}.{k}.{idx}"
        raise KeyError(f"unknown stage member {parts}")

    m = re.fullmatch(r"final_(\d+)", head)
    if m:
        return f"final_layers.{m.group(1)}"

    m = re.fullmatch(r"deconv(\d+)_tconv", head)
    if m:
        return f"deconv_layers.{m.group(1)}.0.0"

    m = re.fullmatch(r"deconv(\d+)_bn", head)
    if m:
        return f"deconv_layers.{m.group(1)}.0.1"

    m = re.fullmatch(r"deconv(\d+)_block(\d+)", head)
    if m:
        i, b = m.groups()
        return (f"deconv_layers.{i}.{int(b) + 1}.0."
                + _block_inner(parts[1:]))

    raise KeyError(f"unknown teacher module path {parts}")


def _convert_leaf(torch_arr: np.ndarray, leaf: str,
                  is_tconv: bool) -> np.ndarray:
    if leaf == "kernel":
        if torch_arr.ndim == 4:
            if is_tconv:  # torch (in, out, kh, kw) -> (kh, kw, in, out)
                return np.transpose(torch_arr, (2, 3, 0, 1))
            return np.transpose(torch_arr, (2, 3, 1, 0))  # OIHW -> HWIO
        if torch_arr.ndim == 2:  # linear (o, i) -> (i, o)
            return torch_arr.T
    return torch_arr


def _import_by_translator(variables: Dict, sd: Dict[str, np.ndarray],
                          prefix_fn) -> Dict:
    """Generic walk: every template leaf gets its torch value."""
    flat = flatten_dict(variables)
    out = {}
    used = set()
    suffixes = _LEAF_SUFFIXES
    for path, template in flat.items():
        collection, *mods, leaf = path
        prefix = prefix_fn(tuple(mods))
        if leaf not in suffixes:
            raise KeyError(f"unknown leaf {path}")
        key = f"{prefix}.{suffixes[leaf]}"
        if key not in sd:
            raise KeyError(f"torch statedict missing {key} (for {path})")
        arr = _convert_leaf(np.asarray(sd[key]), leaf,
                            is_tconv="tconv" in mods[-1])
        if tuple(arr.shape) != tuple(np.shape(template)):
            raise ValueError(
                f"shape mismatch at {path}: torch {arr.shape} vs "
                f"flax {np.shape(template)}")
        out[path] = arr.astype(np.asarray(template).dtype
                               if hasattr(template, "dtype") else np.float32)
        used.add(key)
    leftover = [k for k in sd
                if k not in used and not k.endswith("num_batches_tracked")]
    return unflatten_dict(out), leftover


def import_teacher_statedict(variables: Dict,
                             sd: Dict[str, np.ndarray],
                             strict: bool = True) -> Dict:
    """Fill a PoseHigherHRNet variable template from a torch statedict.

    :param variables: output of ``model.init(...)`` (used as shape/dtype
      template; contents are discarded).
    :param sd: torch statedict as numpy (``load_torch_statedict``),
      fp16-prefix already tolerated.
    """
    sd = strip_fp16_prefix(sd)
    new_vars, leftover = _import_by_translator(variables, sd,
                                               _teacher_prefix)
    if strict and leftover:
        raise ValueError(f"unconsumed torch keys: {leftover[:10]}"
                         f" (+{max(0, len(leftover) - 10)} more)")
    return new_vars


def _cam_prefix(parts: Tuple[str, ...], torch_root: str) -> str:
    """Map a flax ContextAwareModule member path onto the reference
    CAM's torch names (``rtpe/students.py:145-178``)."""
    name = parts[0]
    if name == "residual_conv":
        return f"{torch_root}.residual.0"
    if name == "residual_bn":
        return f"{torch_root}.residual.1"
    if name == "se":
        fc = {"fc1": "0", "fc2": "2"}[parts[1]]
        return f"{torch_root}.se.fc.{fc}"
    m = re.fullmatch(r"hdc(\d+)_(conv|bn)", name)
    if m:
        i, kind = m.groups()
        return f"{torch_root}.hdcs.{i}.{0 if kind == 'conv' else 1}"
    if name == "hdc_top_conv":
        return f"{torch_root}.hdc_top.0"
    if name == "hdc_top_bn":
        return f"{torch_root}.hdc_top.1"
    raise KeyError(f"unknown CAM member {parts}")


def import_attention_student_parts(variables: Dict, snapshot_dir: str,
                                   prefix: str) -> Dict:
    """Load a reference per-part ``AttentionStudent`` snapshot (the 4MB
    ``assets/pretrained_segm_4MB`` artifact and anything saved by the
    reference's ``load_state_dicts`` contract,
    ``rtpe/students.py:708-722``) into the flax
    :class:`rtpe_tpu.models.AttentionStudent` template.

    Parts: ``mid_stem`` (Sequential conv,bn,relu ×2), ``att_hi`` (CAM at
    Sequential index 0), ``att_mid``/``att_lo`` (AvgPool+CAM, CAM at
    index 1), ``att_top`` (conv at index 0).  Detection-body parts are
    left untouched when absent.
    """
    import os

    import torch

    def load(part):
        path = os.path.join(snapshot_dir, f"{prefix}{part}.statedict")
        sd = torch.load(path, map_location="cpu", weights_only=False)
        return {k: v.detach().to(torch.float32).numpy()
                for k, v in sd.items()
                if not k.endswith("num_batches_tracked")}

    mid = load("mid_stem")
    tops = load("att_top")
    cams = {"hi": (load("att_hi"), "0"),
            "mid": (load("att_mid"), "1"),
            "lo": (load("att_lo"), "1")}

    mid_map = {"mid_stem_conv0": "0", "mid_stem_bn0": "1",
               "mid_stem_conv1": "3", "mid_stem_bn1": "4"}

    flat = dict(flatten_dict(variables))
    out = dict(flat)
    suffixes = _LEAF_SUFFIXES
    for path, template in flat.items():
        collection, *mods, leaf = path
        if not mods:
            continue
        if mods[0] in mid_map:
            key = f"{mid_map[mods[0]]}.{suffixes[leaf]}"
            src = mid[key]
        elif mods[0] == "att_top":
            src = tops[f"0.{suffixes[leaf]}"]
        elif mods[0] == "att" and mods[1] in cams:
            sd, root = cams[mods[1]]
            key = (_cam_prefix(tuple(mods[2:]), root)
                   + f".{suffixes[leaf]}")
            src = sd[key]
        else:
            continue
        arr = _convert_leaf(np.asarray(src), leaf, is_tconv=False)
        if tuple(arr.shape) != tuple(np.shape(template)):
            raise ValueError(f"shape mismatch at {path}: {arr.shape} vs"
                             f" {np.shape(template)}")
        out[path] = arr
    return unflatten_dict(out)


def import_attention_student_statedict(variables: Dict,
                                       sd: Dict[str, np.ndarray]) -> Dict:
    """Full torch ``AttentionStudent`` statedict -> flax
    (``rtpe/students.py:595-781``).  The unused torch ``det_mid`` branch
    (never called in the reference forward) is dropped."""
    sd = {k: np.asarray(v) for k, v in sd.items()
          if not k.endswith("num_batches_tracked")}
    suffixes = _LEAF_SUFFIXES
    seq_stem = {"conv0": "0", "bn0": "1", "conv1": "3", "bn1": "4"}

    def torch_key(mods: Tuple[str, ...], leaf: str) -> str:
        head = mods[0]
        if head == "stem":
            return "stem.1." + _teacher_prefix(tuple(mods[1:])) \
                + f".{suffixes[leaf]}"
        m = re.fullmatch(r"mid_stem_(conv0|bn0|conv1|bn1)", head)
        if m:
            return f"mid_stem.{seq_stem[m.group(1)]}.{suffixes[leaf]}"
        if head == "att":
            root = {"hi": "att_hi.0", "mid": "att_mid.1",
                    "lo": "att_lo.1"}[mods[1]]
            return _cam_prefix(tuple(mods[2:]), root) \
                + f".{suffixes[leaf]}"
        if head == "att_top":
            return f"att_top.0.{suffixes[leaf]}"
        if head == "det_hi":
            return _cam_prefix(tuple(mods[1:]), "det_hi.0") \
                + f".{suffixes[leaf]}"
        if head == "det_lo":
            return _cam_prefix(tuple(mods[1:]), "det_lo.1") \
                + f".{suffixes[leaf]}"
        if head == "det_top":
            return f"det_top.0.{suffixes[leaf]}"
        raise KeyError(f"unknown AttentionStudent module {mods}")

    flat = flatten_dict(variables)
    out = {}
    for path, template in flat.items():
        collection, *mods, leaf = path
        key = torch_key(tuple(mods), leaf)
        if key not in sd:
            raise KeyError(f"torch statedict missing {key} (for {path})")
        arr = _convert_leaf(sd[key], leaf, is_tconv=False)
        if tuple(arr.shape) != tuple(np.shape(template)):
            raise ValueError(f"shape mismatch at {path}: torch "
                             f"{arr.shape} vs flax {np.shape(template)}")
        out[path] = arr
    return unflatten_dict(out)


def import_attention_steps_statedict(variables: Dict,
                                     sd: Dict[str, np.ndarray]) -> Dict:
    """Load a full torch ``AttentionStudentSteps`` statedict (reference
    ``rtpe/students.py:786-1073``) into the flax
    :class:`rtpe_tpu.models.AttentionStudentSteps` template — stem,
    mid/alt stems, attention pyramid, steps and det head.

    Accepts both stem layouts: fp16-wrapped (``stem.1.``) and identity-
    wrapped (``half_precision=False``).
    """
    sd = {k: np.asarray(v) for k, v in sd.items()
          if not k.endswith("num_batches_tracked")}
    suffixes = _LEAF_SUFFIXES
    seq_stem = {"conv0": "0", "bn0": "1", "conv1": "3", "bn1": "4"}

    def torch_key(mods: Tuple[str, ...], leaf: str) -> str:
        head = mods[0]
        if head == "stem":
            return "stem.1." + _teacher_prefix(tuple(mods[1:])) \
                + f".{suffixes[leaf]}"
        m = re.fullmatch(r"mid_stem_(conv0|bn0|conv1|bn1)", head)
        if m:
            return f"mid_stem.{seq_stem[m.group(1)]}.{suffixes[leaf]}"
        m = re.fullmatch(r"alt_stem_(conv0|bn0|conv1|bn1)", head)
        if m:
            return f"alt_img_stem.{seq_stem[m.group(1)]}.{suffixes[leaf]}"
        if head == "att":
            root = {"hi": "att_hi.0", "mid": "att_mid.1",
                    "lo": "att_lo.1"}[mods[1]]
            return _cam_prefix(tuple(mods[2:]), root) \
                + f".{suffixes[leaf]}"
        if head == "att_top":
            return f"att_top.0.{suffixes[leaf]}"
        m = re.fullmatch(r"step(\d)", head)
        if m:
            return _cam_prefix(tuple(mods[1:]), f"steps.{m.group(1)}") \
                + f".{suffixes[leaf]}"
        if head == "det_top":
            return f"steps.3.{suffixes[leaf]}"
        raise KeyError(f"unknown AttentionStudentSteps module {mods}")

    flat = flatten_dict(variables)
    out = {}
    for path, template in flat.items():
        collection, *mods, leaf = path
        key = torch_key(tuple(mods), leaf)
        if key not in sd and key.startswith("stem.1."):
            key = key.replace("stem.1.", "stem.", 1)  # identity wrap
        if key not in sd:
            raise KeyError(f"torch statedict missing {key} (for {path})")
        arr = _convert_leaf(sd[key], leaf, is_tconv=False)
        if tuple(arr.shape) != tuple(np.shape(template)):
            raise ValueError(f"shape mismatch at {path}: torch "
                             f"{arr.shape} vs flax {np.shape(template)}")
        out[path] = arr
    return unflatten_dict(out)


def _skipconv_key(mods: Tuple[str, ...], leaf: str, torch_root: str,
                  suffixes: Dict[str, str]) -> str:
    """flax SkipConv member -> reference SkipConv names
    (``rtpe/students.py:37-90``: convs/bns ModuleLists + downsample)."""
    name = mods[0]
    m = re.fullmatch(r"conv(\d+)", name)
    if m:
        return f"{torch_root}.convs.{m.group(1)}.{suffixes[leaf]}"
    m = re.fullmatch(r"bn(\d+)", name)
    if m:
        return f"{torch_root}.bns.{m.group(1)}.{suffixes[leaf]}"
    if name == "downsample_conv":
        return f"{torch_root}.downsample.0.{suffixes[leaf]}"
    if name == "downsample_bn":
        return f"{torch_root}.downsample.1.{suffixes[leaf]}"
    raise KeyError(f"unknown SkipConv member {mods}")


def import_student_statedict(variables: Dict, sd: Dict[str, np.ndarray],
                             arch: str) -> Dict:
    """Full torch statedict -> flax for the legacy student family.

    :param arch: 'cam' (``CamStudent``, students.py:502-592),
      'refiner' (``RefinerStudent``, :302-386) or 'multistage'
      (``MultistageStudent``, :389-498).
    """
    sd = {k: np.asarray(v) for k, v in sd.items()
          if not k.endswith("num_batches_tracked")}
    suffixes = _LEAF_SUFFIXES

    def torch_key(mods: Tuple[str, ...], leaf: str) -> str:
        head = mods[0]
        if head == "stem":
            return "stem.1." + _teacher_prefix(tuple(mods[1:])) \
                + f".{suffixes[leaf]}"
        if arch == "cam":
            if head == "mid_stem_conv":
                return f"mid_stem.0.{suffixes[leaf]}"
            if head == "mid_stem_bn":
                return f"mid_stem.1.{suffixes[leaf]}"
            m = re.fullmatch(r"cam(\d+)", head)
            if m:
                return _cam_prefix(tuple(mods[1:]), f"cams.{m.group(1)}"
                                   ) + f".{suffixes[leaf]}"
            m = re.fullmatch(r"hm_conv(\d+)", head)
            if m:
                return f"hm_convs.{m.group(1)}.{suffixes[leaf]}"
        else:  # refiner / multistage: stages of SkipConvs
            m = re.fullmatch(r"stage(\d+)", head)
            if m:
                return _skipconv_key(tuple(mods[1:]), leaf,
                                     f"stages.{m.group(1)}", suffixes)
        raise KeyError(f"unknown {arch} module {mods}")

    flat = flatten_dict(variables)
    out = {}
    for path, template in flat.items():
        collection, *mods, leaf = path
        key = torch_key(tuple(mods), leaf)
        if key not in sd:
            raise KeyError(f"torch statedict missing {key} (for {path})")
        arr = _convert_leaf(sd[key], leaf, is_tconv=False)
        if tuple(arr.shape) != tuple(np.shape(template)):
            raise ValueError(f"shape mismatch at {path}: torch "
                             f"{arr.shape} vs flax {np.shape(template)}")
        out[path] = arr
    return unflatten_dict(out)


_STEM_KEYS = re.compile(r"^(conv1|bn1|conv2|bn2|layer1)\.")


def import_stem_statedict(variables: Dict, sd: Dict[str, np.ndarray],
                          submodule: str = "stem") -> Dict:
    """Fill the ``stem`` submodule of a student variable template from a
    (full) teacher statedict, mirroring ``StemHRNet.load_pretrained``
    (``rtpe/students.py:263-282``).  Other variables are left untouched.
    """
    sd = {k: v for k, v in strip_fp16_prefix(sd).items()
          if _STEM_KEYS.match(k)}
    flat = flatten_dict(variables)
    stem_tpl = {}
    for path, v in flat.items():
        if len(path) > 1 and path[1] == submodule:
            stem_tpl[(path[0],) + path[2:]] = v
    stem_vars, leftover = _import_by_translator(
        unflatten_dict(stem_tpl), sd, _teacher_prefix)
    if leftover:
        raise ValueError(f"unconsumed stem keys: {leftover}")
    stem_flat = flatten_dict(stem_vars)
    out = dict(flat)
    for path, v in stem_flat.items():
        out[(path[0], submodule) + path[1:]] = v
    return unflatten_dict(out)
