#!/usr/bin/env python
"""Export a deployable serving artifact from teacher weights.

One command turns the torch statedict (+ optional int8 calibration
corpus) into the single directory a production fleet serves from
(``rtpe_tpu/io/serving.py``): weights.npz + act_scales.json +
meta.json, consumed by ``PosePredictor.from_artifact(dir)`` with no
torch, no calibration images, and no config code at load time.

The reference has no deployment format — each of its scripts
re-assembles config + statedict path by hand
(``validate_hhrnet.py:84-110``); torch PTQ would pickle observer state
inside the model object.  After writing, the artifact is re-loaded and
its forward checked bit-identical against the exporting process
(``--no-verify`` skips).
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser("Serving artifact export")
    parser.add_argument("-m", "--model_path", required=True,
                        help="HigherHRNet_w48_640 statedict path")
    parser.add_argument("-o", "--out_dir", required=True,
                        help="Artifact directory to write")
    parser.add_argument("--input_size", type=int, default=640)
    parser.add_argument("--packed", default=True,
                        action=argparse.BooleanOptionalAction,
                        help="Record the row-packed fast path as the "
                             "serving mode (--no-packed: canonical)")
    parser.add_argument("--int8", action="store_true",
                        help="Ship calibrated int8 scales (requires "
                             "--calib images or --act_scales file)")
    parser.add_argument("--int8_act", action="store_true",
                        help="Additionally record int8 activation "
                             "storage (requires --int8)")
    parser.add_argument("--calib", nargs="*", default=None,
                        help="Image paths for int8 activation-range "
                             "calibration")
    parser.add_argument("--act_scales", default=None,
                        help="Existing scale JSON "
                             "(models.save_act_scales) to ship instead "
                             "of calibrating")
    parser.add_argument("--no-verify", action="store_true",
                        help="Skip the reload + bit-parity check")
    parser.add_argument("-C", "--force_cpu", action="store_true")
    parser.add_argument("--allow_random_init", action="store_true",
                        help="Proceed with a RANDOM-INIT teacher when "
                             "model_path does not exist (smoke runs "
                             "only: the artifact serves noise)")
    args = parser.parse_args()
    if args.int8_act and not args.int8:
        parser.error("--int8_act requires --int8")
    if args.int8 and not args.packed:
        parser.error("--int8 requires --packed")
    if args.int8 and not args.calib and not args.act_scales:
        parser.error("--int8 needs --calib images or an --act_scales "
                     "file: the artifact must ship validated scales")

    if args.force_cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    from rtpe_tpu.eval.predictor import PosePredictor
    from rtpe_tpu.io import export_serving_artifact
    from rtpe_tpu.models.factory import get_hrnet_w48_teacher
    from rtpe_tpu.utils import ColorLogger

    log = ColorLogger(os.path.basename(__file__))
    mp = args.model_path if (args.model_path
                             and os.path.exists(args.model_path)) else None
    if mp is None:
        if not args.allow_random_init:
            log.error(f"model path {args.model_path!r} not found; pass "
                      f"--allow_random_init for a smoke run")
            sys.exit(2)
        log.warning(f"model path {args.model_path!r} not found: "
                    f"RANDOM-INIT artifact (serves noise)")
    model, variables = get_hrnet_w48_teacher(mp)

    act_scales = None
    if args.int8:
        if args.act_scales and os.path.exists(args.act_scales):
            act_scales = args.act_scales
            log.info(f"shipping existing scales {args.act_scales}")
        else:
            from PIL import Image
            calib = [np.asarray(Image.open(p).convert("RGB"))
                     for p in args.calib]
            log.info(f"calibrating int8 scales on {len(calib)} images")
            pred = PosePredictor(model, variables, packed=True,
                                 int8=True,
                                 input_size=args.input_size,
                                 calibration_images=calib)
            act_scales = pred.act_scales

    d = export_serving_artifact(
        args.out_dir, variables, model.cfg,
        input_size=args.input_size, packed=args.packed,
        int8=args.int8, int8_act=args.int8_act, act_scales=act_scales,
        extra_meta={"source_statedict": args.model_path,
                    "random_init": mp is None})
    size_mb = sum(os.path.getsize(os.path.join(d, f))
                  for f in os.listdir(d)) / 1e6

    verified = None
    if not args.no_verify:
        ref = PosePredictor(model, variables,
                            input_size=args.input_size,
                            packed=args.packed, int8=args.int8,
                            int8_act=args.int8_act,
                            act_scales=act_scales,
                            fused_decode=False)
        got = PosePredictor.from_artifact(d, fused_decode=False)
        x = jax.numpy.asarray(np.random.RandomState(0)
                              .rand(1, 256, 256, 3).astype(np.float32))
        (ca, ra), (cb, rb) = ref._fwd(x), got._fwd(x)
        np.testing.assert_array_equal(np.asarray(ca, np.float32),
                                      np.asarray(cb, np.float32))
        np.testing.assert_array_equal(np.asarray(ra, np.float32),
                                      np.asarray(rb, np.float32))
        verified = True
        log.info("reload parity: artifact forward bit-identical")

    print(json.dumps({"artifact": d, "size_mb": round(size_mb, 1),
                      "packed": args.packed, "int8": args.int8,
                      "int8_act": args.int8_act,
                      "verified": verified}))


if __name__ == "__main__":
    main()
