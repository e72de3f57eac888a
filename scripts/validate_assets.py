#!/usr/bin/env python
"""Real-asset validation runbook: ONE command the day assets mount.

The framework's remaining unverified claims all need artifacts this
build environment lacks (VERDICT r2 missing #1): the pretrained
``pose_higher_hrnet_w48_640.pth.tar``, real COCO, and a real teacher
npz corpus.  This script runs every gated validation in dependency
order, skipping (loudly) whatever asset is absent, so validation is
one command instead of a sprint:

1. **Teacher import sanity** — statedict loads structurally (63,827,139
   params), fp32 forward on the bundled ``data/*.jpg`` is finite and
   the stem matches the torch reference when torch + the reference
   repo are importable (same check as ``tests/test_teacher_parity``,
   but on the REAL weights).
2. **Packed / int8 forward parity on real weights** — the serving
   paths against the canonical forward on real images (relative-norm
   and peak-set agreement; the random-weight tolerances in
   ``tests/test_rowpack.py`` are the machinery check, THIS is the
   accuracy check).
3. **Decode-stack AP** (needs COCO + teacher corpus) — teacher npz ->
   decode -> minival AP, isolating grouping correctness from the model
   (reference ``dataloader_demo.py:90-121``).
4. **Teacher COCO AP** (needs COCO) — ``validate_hhrnet`` pipeline on
   minival-100 and, with ``--full``, val2017; compares against the
   reference's recorded numbers: 0.418 (simplified in-repo pipeline)
   and 0.698 (flip-TTA pipeline), ``assets/explorations.md:156-247``.
   Also re-runs with ``--int8`` to measure the quantized AP delta.

Exit code 0 = everything that COULD run passed; 1 = a runnable check
failed.  Reference CLI contract: none (this script is new — the
reference validated by hand, SURVEY.md §4).
"""

import argparse
import glob
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the reference's golden numbers (assets/explorations.md:156-247)
GOLDEN_SIMPLIFIED_AP = 0.418
GOLDEN_FLIP_TTA_AP = 0.698
AP_TOLERANCE = 0.1  # BASELINE.json: "COCO minival AP within 0.1"


def log(msg):
    print(f"[validate_assets] {msg}", flush=True)


class Results:
    def __init__(self):
        self.passed, self.failed, self.skipped = [], [], []

    def record(self, name, ok, detail=""):
        (self.passed if ok else self.failed).append((name, detail))
        log(f"{'PASS' if ok else 'FAIL'}: {name} {detail}")

    def skip(self, name, why):
        self.skipped.append((name, why))
        log(f"SKIP: {name} ({why})")


def step_teacher_import(res, args):
    if not os.path.exists(args.model_path):
        res.skip("teacher_import", f"no statedict at {args.model_path}")
        return None
    import numpy as np

    import jax
    import jax.numpy as jnp

    from rtpe_tpu.models.factory import get_hrnet_w48_teacher
    from rtpe_tpu.utils.summary import param_count

    model, variables = get_hrnet_w48_teacher(args.model_path,
                                             dtype=jnp.float32)
    n = param_count(variables["params"])
    res.record("teacher_param_count", n == 63_827_139, f"({n})")

    imgs = sorted(glob.glob(os.path.join(args.data_dir, "*.jpg")))
    if imgs:
        from PIL import Image

        from rtpe_tpu.data.preprocess import (normalize_image,
                                              resize_align_multi_scale)
        img = np.asarray(Image.open(imgs[0]).convert("RGB"), np.float32)
        resized, _, _ = resize_align_multi_scale(img, 320, 1, 1)
        x = jnp.asarray(normalize_image(resized / 255.0)[None])
        coarse, refined = jax.jit(
            lambda v, xx: model.apply(v, xx, train=False))(variables, x)
        finite = bool(np.isfinite(np.asarray(coarse)).all()
                      and np.isfinite(np.asarray(refined)).all())
        res.record("teacher_forward_finite", finite,
                   f"{os.path.basename(imgs[0])} "
                   f"coarse[max]={float(jnp.max(coarse)):.3f}")
    return model, variables


def step_packed_parity(res, args, teacher):
    if teacher is None:
        res.skip("packed_parity_real_weights", "needs the statedict")
        return
    import numpy as np

    import jax
    import jax.numpy as jnp

    from rtpe_tpu.models.hrnet_packed import (calibrate_act_scales,
                                              pack_w48_params,
                                              packed_forward,
                                              quantize_packed)

    model, variables = teacher
    cfg = model.cfg
    imgs = sorted(glob.glob(os.path.join(args.data_dir, "*.jpg")))
    if not imgs:
        res.skip("packed_parity_real_weights", "no data/*.jpg")
        return
    from PIL import Image

    from rtpe_tpu.data.preprocess import (normalize_image,
                                          resize_align_multi_scale)
    xs = []
    for p in imgs[:2]:
        img = np.asarray(Image.open(p).convert("RGB"), np.float32)
        resized, _, _ = resize_align_multi_scale(img, 320, 1, 1)
        xs.append(normalize_image(resized / 255.0))
    # distinct shapes: evaluate per image
    pk32 = jax.jit(lambda v: pack_w48_params(v, cfg,
                                             dtype=jnp.float32)
                   )(variables)
    pkbf = jax.jit(lambda v: pack_w48_params(v, cfg))(variables)
    scales = calibrate_act_scales(
        pk32, [x[None] for x in xs], cfg, dtype=jnp.float32,
        percentile=99.9)
    pkq = jax.jit(lambda p: quantize_packed(p, scales))(pk32)
    worst = {"packed_fp32": 0.0, "packed_bf16": 0.0, "int8": 0.0,
             "int8_act": 0.0}
    for x in xs:
        xj = jnp.asarray(x[None])
        wc, wr = model.apply(variables, xj, train=False)
        want = np.asarray(wr, np.float32)

        def rel(got):
            g = np.asarray(got, np.float32)
            return float(np.linalg.norm(want - g)
                         / (np.linalg.norm(want) + 1e-12))

        _, r32 = packed_forward(pk32, xj, cfg, dtype=jnp.float32)
        worst["packed_fp32"] = max(worst["packed_fp32"], rel(r32))
        _, rbf = packed_forward(pkbf, xj, cfg)
        worst["packed_bf16"] = max(worst["packed_bf16"], rel(rbf))
        _, rq = packed_forward(pkq, xj, cfg, dtype=jnp.float32)
        worst["int8"] = max(worst["int8"], rel(rq))
        _, ra = packed_forward(pkq, xj, cfg, dtype=jnp.float32,
                               int8_act=True)
        worst["int8_act"] = max(worst["int8_act"], rel(ra))
    res.record("packed_fp32_parity", worst["packed_fp32"] < 1e-4,
               f"rel={worst['packed_fp32']:.2e}")
    res.record("packed_bf16_parity", worst["packed_bf16"] < 0.02,
               f"rel={worst['packed_bf16']:.2e}")
    # real-weight int8 accuracy: the numbers to quote instead of the
    # random-weight bounds
    res.record("int8_forward_drift", worst["int8"] < 0.05,
               f"rel={worst['int8']:.3f}")
    res.record("int8_act_forward_drift", worst["int8_act"] < 0.08,
               f"rel={worst['int8_act']:.3f}")
    # scale-file round trip on the REAL calibration: persisted scales
    # must reproduce the quantized params bit-exactly (the production
    # calibrate-once/ship-the-file path, models.save_act_scales)
    import tempfile

    from rtpe_tpu.models.hrnet_packed import (load_act_scales,
                                              save_act_scales)
    with tempfile.NamedTemporaryFile(suffix=".json") as f:
        save_act_scales(f.name, scales)
        pkq2 = jax.jit(lambda p: quantize_packed(
            p, load_act_scales(f.name)))(pk32)
    same = all(
        np.array_equal(np.asarray(getattr(pkq[k], f2)),
                       np.asarray(getattr(pkq2[k], f2)))
        for k in pkq for f2 in ("kernel", "alpha", "inv_sx")
        if getattr(pkq[k], f2) is not None)
    res.record("act_scales_file_roundtrip", same,
               f"{len(scales)} entries")


def _have_coco(args):
    return os.path.exists(os.path.join(
        args.coco_dir, "annotations", "person_keypoints_val2017.json"))


def step_decode_stack_ap(res, args):
    if not (_have_coco(args) and args.teacher_dir
            and os.path.isdir(args.teacher_dir)):
        res.skip("decode_stack_minival_ap",
                 "needs COCO val2017 + teacher npz corpus")
        return
    cmd = [sys.executable, os.path.join(REPO, "scripts",
                                        "dataloader_demo.py"),
           "--coco_dir", args.coco_dir,
           "--teacher_dir", args.teacher_dir,
           "--num_demo_batches", "0",
           "--max_eval_images", str(args.minival_images)]
    r = subprocess.run(cmd, capture_output=True, text=True,
                       timeout=3600)
    ok = r.returncode == 0 and "AP" in (r.stdout + r.stderr)
    res.record("decode_stack_minival_ap", ok,
               (r.stdout + r.stderr).strip().splitlines()[-1][:200]
               if ok else f"rc={r.returncode}")


def step_teacher_coco_ap(res, args):
    if not (_have_coco(args) and os.path.exists(args.model_path)):
        res.skip("teacher_coco_ap", "needs COCO val2017 + statedict")
        return
    wl = args.whitelist or os.path.join(
        "/root/reference/assets", "coco_minival2017_100.txt")
    variants = [
        ("simplified", [], GOLDEN_SIMPLIFIED_AP),
        ("flip_tta", ["--flip", "--batch_size", "1"],
         GOLDEN_FLIP_TTA_AP),
        # batched TTA (round 4: flip as a doubled leading axis) must
        # reproduce the bs=1 flip AP exactly — cross-checked below
        ("flip_tta_batched", ["--flip", "--batch_size", "8"],
         GOLDEN_FLIP_TTA_AP),
        ("int8", ["--int8"], GOLDEN_SIMPLIFIED_AP),
        ("int8_act", ["--int8", "--int8_act"], GOLDEN_SIMPLIFIED_AP),
        # multi-scale + flip: the full legacy TTA shape
        # (`legacy/valid_ae1dim.py:166-191` iterates TEST.SCALE_FACTOR
        # around the flip forward).  No dedicated golden exists — the
        # published 0.698 is the flip@scale-1 protocol — so this is
        # held to the flip golden and cross-checked against the
        # measured flip AP below (VERDICT r4 item 7: the --scales
        # path had unit parity but no real-asset AP line)
        ("flip_ms_tta", ["--flip", "--scales", "1.0,0.5",
                         "--batch_size", "8"], GOLDEN_FLIP_TTA_AP),
    ]
    baseline_ap = {}
    for name, extra, golden in variants:
        cmd = [sys.executable,
               os.path.join(REPO, "scripts", "validate_hhrnet.py"),
               "--coco_dir", args.coco_dir, "-m", args.model_path,
               "--save_every", "0"]
        if os.path.exists(wl):
            cmd += ["--whitelist", wl]
        if args.full:
            pass  # whole val2017
        else:
            cmd += ["--max_images", str(args.minival_images)]
        cmd += extra
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=4 * 3600)
        if r.returncode != 0:
            res.record(f"teacher_coco_ap_{name}", False,
                       f"rc={r.returncode}: {r.stderr[-200:]}")
            continue
        stats = json.loads(r.stdout.strip().splitlines()[-1])
        ap = stats.get("AP", float("nan"))
        baseline_ap[name] = ap
        ok = abs(ap - golden) <= AP_TOLERANCE
        res.record(f"teacher_coco_ap_{name}", ok,
                   f"AP={ap:.3f} vs golden {golden} "
                   f"(±{AP_TOLERANCE})")
    if "simplified" in baseline_ap and "int8" in baseline_ap:
        delta = baseline_ap["simplified"] - baseline_ap["int8"]
        res.record("int8_ap_delta", abs(delta) <= 0.02,
                   f"bf16->int8 AP delta {delta:+.3f}")
    if "simplified" in baseline_ap and "int8_act" in baseline_ap:
        delta = baseline_ap["simplified"] - baseline_ap["int8_act"]
        res.record("int8_act_ap_delta", abs(delta) <= 0.03,
                   f"bf16->int8_act AP delta {delta:+.3f}")
    if "flip_tta" in baseline_ap and "flip_tta_batched" in baseline_ap:
        delta = baseline_ap["flip_tta"] - baseline_ap["flip_tta_batched"]
        res.record("tta_batched_equals_bs1", abs(delta) <= 0.005,
                   f"bs1 vs batched flip-TTA AP delta {delta:+.3f}")
    if "flip_tta" in baseline_ap and "flip_ms_tta" in baseline_ap:
        # adding the 0.5x scale may move AP either way on a minival
        # slice; a collapse means the multi-scale aggregation is broken
        delta = baseline_ap["flip_ms_tta"] - baseline_ap["flip_tta"]
        res.record("tta_multiscale_sane", delta >= -0.05,
                   f"flip+2-scale vs flip AP delta {delta:+.3f}")


def step_greedy_decode_parity(res, args, teacher):
    """Greedy-vs-exact grouping on REAL teacher outputs (round 4: the
    TPU decode 'auto' path is the greedy mega-kernel for BOTH the
    single-image and the batch entry, and PosePredictor serves
    parse_fused_batch by default on TPU).  Decodes the bundled sample
    images through decode_full with lap='greedy' and lap='xla' —
    and the stacked batch through decode_full_batch — and records
    people-table agreement; on TPU this also compile-validates both
    kernels on real hardware."""
    if teacher is None:
        res.skip("greedy_decode_parity", "needs the statedict")
        return
    import numpy as np

    import jax
    import jax.numpy as jnp

    from rtpe_tpu.decode.fused import decode_full
    from rtpe_tpu.ops.resize import resize_bilinear

    model, variables = teacher
    imgs = sorted(glob.glob(os.path.join(args.data_dir, "*.jpg")))
    if not imgs:
        res.skip("greedy_decode_parity", "no data/*.jpg")
        return
    from PIL import Image

    from rtpe_tpu.data.preprocess import (normalize_image,
                                          resize_align_multi_scale)
    on_tpu = jax.default_backend() == "tpu"
    greedy = "greedy" if on_tpu else "greedy_interpret"

    # Gate on BOUNDED SUBOPTIMALITY, not membership: on tie-heavy tag
    # fields (and any random-init teacher, where tags are pure noise)
    # greedy and optimal assignments legitimately group different —
    # equally plausible — people; what must hold on ANY weights is
    # that greedy captures (nearly) the same detection mass the exact
    # LAP does, and finds the same number of people.  Person-level AP
    # agreement on realistic scenes is tests/test_e2e_ap.py's job, and
    # decode_stack_minival_ap covers end-AP once COCO mounts.
    from rtpe_tpu.decode.fused import decode_full_batch

    worst_people = 0
    worst_ratio = 1.0
    hms_all, tags_all = [], []
    for p in imgs[:2]:
        img = np.asarray(Image.open(p).convert("RGB"), np.float32)
        resized, _, _ = resize_align_multi_scale(img, 320, 1, 1)
        x = jnp.asarray(normalize_image(resized / 255.0)[None])
        coarse, refined = jax.jit(
            lambda v, xx: model.apply(v, xx, train=False))(variables, x)
        hms = refined[..., :17].astype(jnp.float32)
        tags = resize_bilinear(coarse[..., 17:].astype(jnp.float32),
                               hms.shape[1:3], align_corners=True)
        hms_all.append(hms)
        tags_all.append(tags)
        p_g, n_g, s_g = decode_full(hms, tags, lap=greedy)
        p_x, n_x, s_x = decode_full(hms, tags, lap="xla")
        worst_people = max(worst_people, abs(int(n_g) - int(n_x)))
        mass_g = float(np.clip(np.asarray(p_g)[:int(n_g), :, 2],
                               0, None).sum())
        mass_x = float(np.clip(np.asarray(p_x)[:int(n_x), :, 2],
                               0, None).sum())
        worst_ratio = min(worst_ratio,
                          mass_g / max(mass_x, 1e-6))
    # the batch kernel (PosePredictor's serving default on TPU):
    # same gate over the stacked sample batch
    if len({h.shape for h in hms_all}) == 1 and len(hms_all) > 1:
        hb = jnp.concatenate(hms_all)
        tb = jnp.concatenate(tags_all)
        pb_g, nb_g, _ = decode_full_batch(hb, tb, lap=greedy)
        pb_x, nb_x, _ = decode_full_batch(hb, tb, lap="xla")
        for i in range(hb.shape[0]):
            worst_people = max(worst_people,
                               abs(int(nb_g[i]) - int(nb_x[i])))
            mg = float(np.clip(np.asarray(pb_g)[i, :int(nb_g[i]), :, 2],
                               0, None).sum())
            mx = float(np.clip(np.asarray(pb_x)[i, :int(nb_x[i]), :, 2],
                               0, None).sum())
            worst_ratio = min(worst_ratio, mg / max(mx, 1e-6))
    res.record("greedy_decode_parity",
               worst_people <= 1 and worst_ratio >= 0.95,
               f"max people delta {worst_people}, grouped-mass ratio "
               f"greedy/exact {worst_ratio:.3f} (single + batch)")


def step_stream_consistency(res, args, teacher):
    """The realtime streaming surface on REAL weights:
    ``PosePredictor.stream`` (the pipelined path behind
    ``scripts/realtime_demo.py``) must yield exactly the per-frame
    results of ``predict`` — pipelining may only overlap, never
    change, the numbers."""
    if teacher is None:
        res.skip("stream_matches_predict", "needs the statedict")
        return
    imgs = sorted(glob.glob(os.path.join(args.data_dir, "*.jpg")))[:2]
    if not imgs:
        res.skip("stream_matches_predict", "no data/*.jpg")
        return
    import numpy as np
    from PIL import Image

    from rtpe_tpu.eval.predictor import PosePredictor

    model, variables = teacher
    frames = [np.asarray(Image.open(f).convert("RGB")) for f in imgs]
    ok, detail = True, ""
    for label, kw in (("packed", {}),
                      ("packed+flip", {"with_flip": True})):
        pred = PosePredictor(model, variables, input_size=320,
                             packed=True, **kw)
        streamed = list(pred.stream(iter(frames)))
        if len(streamed) != len(frames):
            ok, detail = False, f"{label}: frame count mismatch"
            break
        for frame, (people, _) in zip(frames, streamed):
            p1, _ = pred.predict(frame)
            if len(people) != len(p1) or not all(
                    np.allclose(np.asarray(a), np.asarray(b),
                                rtol=1e-4, atol=1e-4)
                    for a, b in zip(people, p1)):
                ok, detail = False, f"{label}: per-frame people mismatch"
                break
        if not ok:
            break
    res.record("stream_matches_predict", ok,
               detail or f"({len(frames)} frames, packed + flip)")


def step_artifact_roundtrip(res, args, teacher):
    """Deployable artifact on REAL weights: export (int8 scales
    calibrated on the bundled jpgs) -> ``from_artifact`` -> the loaded
    process's forward must be bit-identical to the exporting one
    (``io/serving.py``; the production hand-off path)."""
    if teacher is None:
        res.skip("artifact_roundtrip_real_weights", "needs the statedict")
        return
    imgs = sorted(glob.glob(os.path.join(args.data_dir, "*.jpg")))[:2]
    if not imgs:
        res.skip("artifact_roundtrip_real_weights", "no data/*.jpg")
        return
    import tempfile

    import numpy as np
    from PIL import Image

    import jax.numpy as jnp

    from rtpe_tpu.eval.predictor import PosePredictor
    from rtpe_tpu.io import export_serving_artifact

    model, variables = teacher
    calib = [np.asarray(Image.open(p).convert("RGB")) for p in imgs]
    ref = PosePredictor(model, variables, input_size=320, packed=True,
                        int8=True, calibration_images=calib,
                        fused_decode=False)
    with tempfile.TemporaryDirectory() as td:
        d = export_serving_artifact(td, variables, model.cfg,
                                    input_size=320, packed=True,
                                    int8=True,
                                    act_scales=ref.act_scales)
        got = PosePredictor.from_artifact(d, fused_decode=False)
        x = jnp.asarray(np.random.RandomState(0)
                        .rand(1, 256, 256, 3).astype(np.float32))
        (ca, ra), (cb, rb) = ref._fwd(x), got._fwd(x)
        ok = (np.array_equal(np.asarray(ca, np.float32),
                             np.asarray(cb, np.float32))
              and np.array_equal(np.asarray(ra, np.float32),
                                 np.asarray(rb, np.float32)))
    res.record("artifact_roundtrip_real_weights", ok,
               "(int8, scales shipped in-artifact)")


def main():
    p = argparse.ArgumentParser("validate_assets")
    p.add_argument("-m", "--model_path",
                   default="models/pose_higher_hrnet_w48_640.pth.tar")
    p.add_argument("--coco_dir",
                   default=os.path.join(os.path.expanduser("~"),
                                        "datasets", "coco"))
    p.add_argument("--teacher_dir", default=None,
                   help="precomputed teacher npz corpus dir")
    p.add_argument("--data_dir", default="/root/reference/data",
                   help="bundled sample jpgs")
    p.add_argument("--whitelist", default=None,
                   help="minival id list (default: the reference's "
                        "coco_minival2017_100.txt)")
    p.add_argument("--minival_images", type=int, default=100)
    p.add_argument("--full", action="store_true",
                   help="run the AP comparison on ALL of val2017 "
                        "(hours), not just minival")
    args = p.parse_args()

    res = Results()
    teacher = step_teacher_import(res, args)
    step_packed_parity(res, args, teacher)
    step_greedy_decode_parity(res, args, teacher)
    step_stream_consistency(res, args, teacher)
    step_artifact_roundtrip(res, args, teacher)
    step_decode_stack_ap(res, args)
    step_teacher_coco_ap(res, args)

    log(f"summary: {len(res.passed)} passed, {len(res.failed)} failed, "
        f"{len(res.skipped)} skipped")
    for name, why in res.skipped:
        log(f"  skipped: {name} — {why}")
    print(json.dumps({
        "passed": [n for n, _ in res.passed],
        "failed": [n for n, _ in res.failed],
        "skipped": [n for n, _ in res.skipped],
    }))
    sys.exit(1 if res.failed else 0)


if __name__ == "__main__":
    main()
