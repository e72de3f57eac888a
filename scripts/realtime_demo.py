#!/usr/bin/env python
"""Single-stream realtime pose demo: frames -> people, pipelined.

The reference repo is NAMED realtime-pose-estimation but ships no
streaming entry point — its closest surface is the one-image-at-a-time
loop in ``validate_hhrnet.py:84-110`` (forward, CPU munkres decode,
next image, everything serialized).  This script is the framework's
realtime story as a product CLI: frames flow through
:meth:`rtpe_tpu.eval.PosePredictor.stream`, which dispatches the device
forward of frame N+1 *before* frame N's host-side grouping runs (JAX
dispatch is asynchronous), so device compute and host decode overlap
and sustained throughput approaches ``max(stage)`` instead of the sum.

Prints one JSON line of steady-state stats (p50/p90 frame latency,
sustained FPS — the first frame's compile is excluded) and optionally
dumps annotated frames (``-o``).

Examples::

    # 640px packed bf16 stream over a directory of frames, 3 loops
    python scripts/realtime_demo.py -I frames/*.jpg --loops 3 \\
        -m models/pose_higher_hrnet_w48_640.pth.tar

    # int8 weights + int8 activation storage, annotated dump
    python scripts/realtime_demo.py -I frames/*.jpg -m <sd> \\
        --int8 --int8_act --act_scales scales.json -o /tmp/annotated
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser("realtime_demo")
    p.add_argument("-I", "--input_paths", required=True, nargs="+",
                   help="Frame image paths (shell glob), streamed in "
                        "order")
    p.add_argument("-m", "--model_path", required=True,
                   help="Path to the HigherHRNet_w48_640 state dict")
    p.add_argument("--allow_random_init", action="store_true",
                   help="Proceed with a RANDOM-INIT teacher when "
                        "model_path does not exist (smoke runs only)")
    p.add_argument("--loops", type=int, default=1,
                   help="Cycle the frame list this many times (simulate "
                        "a longer stream; stats cover all frames)")
    p.add_argument("--input_size", type=int, default=640,
                   help="resize-align target (reference fixes 640)")
    p.add_argument("-C", "--force_cpu", action="store_true")
    p.add_argument("--packed", default=True,
                   action=argparse.BooleanOptionalAction,
                   help="Row-packed BN-folded serving path (default; "
                        "--no-packed = canonical parity surface)")
    p.add_argument("--int8", action="store_true",
                   help="int8 weights (requires --packed); activation "
                        "scales calibrate on the first frames unless "
                        "--act_scales points at an existing file")
    p.add_argument("--int8_act", action="store_true",
                   help="additionally store inter-layer activations "
                        "int8 (requires --int8)")
    p.add_argument("--act_scales", default=None,
                   help="Activation-scale JSON (models.save_act_scales)"
                        ": used if it exists, else written after "
                        "calibration")
    p.add_argument("--flip", action="store_true",
                   help="Flip-TTA on the streamed forward (doubled "
                        "leading axis, still pipelined — ~1.8x the "
                        "per-frame device cost for 2 forwards)")
    p.add_argument("-o", "--out_dir", default=None,
                   help="If set, write annotated frames here")
    p.add_argument("--save_frames", type=int, default=8,
                   help="Max annotated frames to write with -o")
    args = p.parse_args()
    if args.int8 and not args.packed:
        p.error("--int8 requires --packed")
    if args.int8_act and not args.int8:
        p.error("--int8_act requires --int8")

    if args.force_cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    from PIL import Image

    from rtpe_tpu.eval.predictor import PosePredictor
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
                    f"RANDOM-INIT teacher (poses will be noise)")
    model, variables = get_hrnet_w48_teacher(mp)

    frames = [np.asarray(Image.open(fp).convert("RGB"))
              for fp in args.input_paths]
    log.info(f"{len(frames)} frames x {args.loops} loops, "
             f"input_size={args.input_size}, backend="
             f"{jax.devices()[0].platform}")

    kw = {}
    if args.int8:
        if args.act_scales and os.path.exists(args.act_scales):
            kw["act_scales"] = args.act_scales
            log.info(f"int8 scales loaded from {args.act_scales}")
        else:
            # the stream's own frames are the calibration corpus —
            # real-image scales, same gate contract as PosePredictor
            kw["calibration_images"] = frames[:8]
    pred = PosePredictor(model, variables,
                         input_size=args.input_size,
                         packed=args.packed, int8=args.int8,
                         int8_act=args.int8_act,
                         with_flip=args.flip, **kw)
    if args.int8 and args.act_scales \
            and not os.path.exists(args.act_scales):
        from rtpe_tpu.models import save_act_scales
        save_act_scales(pred.act_scales, args.act_scales)
        log.info(f"int8 scales calibrated on {min(8, len(frames))} "
                 f"frames -> {args.act_scales}")

    def frame_iter():
        for _ in range(args.loops):
            yield from frames

    n_total = len(frames) * args.loops
    lat_ms = []
    people_total = 0
    saved = 0
    t_prev = time.time()
    t_first_done = None
    for i, (people, scores) in enumerate(pred.stream(frame_iter())):
        now = time.time()
        lat_ms.append((now - t_prev) * 1e3)
        t_prev = now
        if t_first_done is None:
            t_first_done = now
        people_total += len(people)
        if args.out_dir and saved < args.save_frames:
            from rtpe_tpu.obs.vis import save_valid_image
            os.makedirs(args.out_dir, exist_ok=True)
            save_valid_image(frames[i % len(frames)], people,
                             os.path.join(args.out_dir,
                                          f"frame{i:05d}.png"),
                             seed=0)
            saved += 1
        if i == 0:
            log.info(f"first frame (incl. compile): "
                     f"{lat_ms[0]:.0f} ms")

    # steady state excludes frame 0 (compile + pipeline fill)
    steady = lat_ms[1:] or lat_ms
    fps = ((n_total - 1) / (t_prev - t_first_done)
           if n_total > 1 and t_prev > t_first_done else 0.0)
    stats = {
        "frames": n_total,
        "fps_sustained": round(fps, 2),
        "lat_p50_ms": round(float(np.percentile(steady, 50)), 2),
        "lat_p90_ms": round(float(np.percentile(steady, 90)), 2),
        "first_frame_ms": round(lat_ms[0], 1),
        "people_total": people_total,
        "backend": jax.devices()[0].platform,
        "path": ("int8_act" if args.int8_act else
                 "int8" if args.int8 else
                 "packed" if args.packed else "canonical"),
        # TTA state must be in the archived record: a --flip run's FPS
        # is not comparable to a plain run's (ADVICE r4)
        "flip": bool(args.flip),
        # bs-1 streaming with int8/int8-act routes through the bf16
        # program below the predictor's threshold (r5) — record which
        # program actually served so archived latency numbers are
        # attributable
        "routed_bf16": bool((args.int8 or args.int8_act)
                            and 1 < pred.int8_min_batch
                            and pred._fwd_bf16 is not None),
    }
    log.info(f"sustained {stats['fps_sustained']} FPS, "
             f"p50 {stats['lat_p50_ms']} ms")
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
