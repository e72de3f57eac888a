"""Deployable serving artifact: weights + calibration + config in one dir.

The reference has no deployment story beyond raw torch checkpoints: its
serving flow (``validate_hhrnet.py:84-110``) re-assembles model config,
statedict path, and preprocessing constants by hand in every script, and
torch PTQ would pickle observer state inside the model object.  Here a
serving process is constructed from ONE directory:

``export_serving_artifact`` writes

* ``weights.npz`` — the canonical variable tree (params + batch_stats),
  flat ``collection/path`` keys, original dtypes;
* ``act_scales.json`` — the calibrated activation-scale set
  (:func:`~rtpe_tpu.models.hrnet_packed.save_act_scales` format), present
  iff the artifact declares an int8 mode;
* ``meta.json`` — format marker, model config, predictor construction
  kwargs, and a sha256 over the weights file.

and ``PosePredictor.from_artifact(dir)`` rebuilds the exact serving
process — BN fold, row-packing, and int8 quantization happen
deterministically at load time from the shipped scales, so the artifact
stays ONE format for every serving mode (canonical / packed / int8 /
int8-act) and the quantized weights are bit-identical to the exporting
process's (asserted in ``tests/test_serving_artifact.py``).  No torch,
no calibration corpus, and no config code needed at load time.
"""

import dataclasses
import hashlib
import json
import os
from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np

from flax.traverse_util import flatten_dict, unflatten_dict

_FORMAT = "rtpe_tpu-serving-artifact-v1"
_WEIGHTS = "weights.npz"
_SCALES = "act_scales.json"
_META = "meta.json"


def _cfg_to_dict(cfg) -> Dict[str, Any]:
    d = dataclasses.asdict(cfg)
    # asdict turns nested StageCfg dataclasses into plain dicts; tuples
    # become lists under json — normalized back in _cfg_from_dict
    return d


def _cfg_from_dict(d: Dict[str, Any]):
    from ..models.hrnet import HRNetConfig, StageCfg

    def tup(v):
        return tuple(v) if isinstance(v, list) else v

    kw = {k: tup(v) for k, v in d.items()
          if k not in ("stage2", "stage3", "stage4")}
    for s in ("stage2", "stage3", "stage4"):
        sd = {k: tup(v) for k, v in d[s].items()}
        kw[s] = StageCfg(**sd)
    return HRNetConfig(**kw)


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def export_serving_artifact(out_dir: str, variables, cfg=None, *,
                            num_joints: int = 17,
                            input_size: int = 640,
                            packed: bool = True,
                            int8: bool = False,
                            int8_act: bool = False,
                            act_scales: Optional[Dict[str, float]] = None,
                            with_flip: bool = False,
                            scales: Sequence[float] = (1.0,),
                            extra_meta: Optional[Dict[str, Any]] = None,
                            ) -> str:
    """Write a self-contained serving artifact directory.

    :param variables: canonical ``{"params", "batch_stats"}`` tree of
        :class:`~rtpe_tpu.models.PoseHigherHRNet` (init or torch import).
    :param cfg: the model's :class:`HRNetConfig` (default W48).
    :param act_scales: calibrated activation scales — REQUIRED when
        ``int8``: the artifact is the post-calibration product and a
        fleet must never re-calibrate (or silently synthesize scales)
        at load time.  Either the dict from ``calibrate_act_scales`` /
        ``PosePredictor.act_scales`` or a path to a scale JSON.
    :returns: ``out_dir``.
    """
    from ..models.hrnet import w48_config
    from ..models.hrnet_packed import load_act_scales, save_act_scales

    cfg = cfg or w48_config()
    if int8_act and not int8:
        raise ValueError("int8_act=True requires int8=True")
    if int8 and not packed:
        raise ValueError("int8=True requires packed=True")
    if int8:
        if act_scales is None:
            raise ValueError(
                "int8 artifact without act_scales: calibrate first "
                "(models.calibrate_act_scales or "
                "PosePredictor(..., calibration_images=...).act_scales)"
                " — the artifact must ship validated scales, never "
                "re-calibrate at load time")
        if not isinstance(act_scales, dict):
            act_scales = load_act_scales(act_scales)
    elif act_scales is not None:
        raise ValueError("act_scales given but int8=False")

    os.makedirs(out_dir, exist_ok=True)
    flat: Dict[str, np.ndarray] = {}
    for collection in ("params", "batch_stats"):
        if collection not in variables:
            continue
        for path, val in flatten_dict(variables[collection]).items():
            arr = np.asarray(val)
            if arr.dtype.name == "bfloat16":
                # npz round-trips bf16 only when ml_dtypes is imported
                # at load time; widen value-exactly instead (the packed
                # path re-rounds to bf16 at load, bit-identically)
                arr = arr.astype(np.float32)
            flat[collection + "/" + "/".join(path)] = arr
    if not any(k.startswith("params/") for k in flat):
        raise ValueError("variables has no 'params' collection")

    wpath = os.path.join(out_dir, _WEIGHTS)
    # uncompressed zip: weights are high-entropy floats (compression
    # buys ~nothing and costs minutes on the 64M-param teacher)
    np.savez(wpath, **flat)
    if int8:
        save_act_scales(os.path.join(out_dir, _SCALES), act_scales)

    meta = {
        "format": _FORMAT,
        "model_family": "pose_higher_hrnet",
        "cfg": _cfg_to_dict(cfg),
        "predictor": {
            "num_joints": int(num_joints),
            "input_size": int(input_size),
            "packed": bool(packed),
            "int8": bool(int8),
            "int8_act": bool(int8_act),
            "with_flip": bool(with_flip),
            "scales": [float(s) for s in scales],
        },
        "weights": {
            "file": _WEIGHTS,
            "num_arrays": len(flat),
            "total_bytes": int(sum(a.nbytes for a in flat.values())),
            "sha256": _sha256(wpath),
        },
        "act_scales_file": _SCALES if int8 else None,
    }
    if extra_meta:
        meta["extra"] = dict(extra_meta)
    tmp = os.path.join(out_dir, _META + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, _META))
    return out_dir


@dataclasses.dataclass
class ServingArtifact:
    """Loaded artifact: everything a serving process constructs from."""
    cfg: Any
    variables: Dict[str, Any]
    predictor_kwargs: Dict[str, Any]
    meta: Dict[str, Any]


def load_serving_artifact(path: str, verify_hash: bool = True
                          ) -> ServingArtifact:
    """Read + validate an artifact directory written by
    :func:`export_serving_artifact`.

    Fails loudly on a foreign/truncated meta, a weights file whose
    sha256 or array count diverges from the manifest, or a missing
    scale file for a declared int8 mode — a serving fleet must never
    come up on silently-corrupt weights.
    """
    mpath = os.path.join(path, _META)
    if not os.path.isfile(mpath):
        raise FileNotFoundError(
            f"{path}: no {_META} — not a serving artifact directory")
    with open(mpath) as f:
        meta = json.load(f)
    if not isinstance(meta, dict) or meta.get("format") != _FORMAT:
        raise ValueError(
            f"{mpath}: expected format={_FORMAT!r}, got "
            f"{meta.get('format') if isinstance(meta, dict) else type(meta).__name__!r}")
    if meta.get("model_family") != "pose_higher_hrnet":
        raise ValueError(
            f"{mpath}: unsupported model_family "
            f"{meta.get('model_family')!r}")

    wmeta = meta["weights"]
    wpath = os.path.join(path, wmeta["file"])
    if verify_hash:
        got = _sha256(wpath)
        if got != wmeta["sha256"]:
            raise ValueError(
                f"{wpath}: sha256 mismatch (manifest "
                f"{wmeta['sha256'][:12]}…, file {got[:12]}…) — "
                f"corrupt or tampered weights")
    with np.load(wpath) as z:
        flat = {k: z[k] for k in z.files}
    if len(flat) != wmeta["num_arrays"]:
        raise ValueError(
            f"{wpath}: {len(flat)} arrays, manifest says "
            f"{wmeta['num_arrays']}")

    variables: Dict[str, Dict] = {}
    for key, arr in flat.items():
        collection, rest = key.split("/", 1)
        variables.setdefault(collection, {})[tuple(rest.split("/"))] = arr
    variables = {c: unflatten_dict(d) for c, d in variables.items()}

    pkw = dict(meta["predictor"])
    pkw["scales"] = tuple(float(s) for s in pkw.get("scales", [1.0]))
    if pkw.get("int8"):
        from ..models.hrnet_packed import load_act_scales
        sfile = meta.get("act_scales_file")
        if not sfile:
            raise ValueError(f"{mpath}: int8 artifact without an "
                             f"act_scales_file entry")
        pkw["act_scales"] = load_act_scales(os.path.join(path, sfile))

    return ServingArtifact(cfg=_cfg_from_dict(meta["cfg"]),
                           variables=variables,
                           predictor_kwargs=pkw, meta=meta)
