"""Capture a jax.profiler trace of N train steps and print the HLO ops
ranked by self time (authoritative — measured on-device, unlike the
byte/padding models in train_hlo_bytes.py / train_hlo_physical.py).

Run: timeout 500 python experiments/profile_step.py [--steps 5]
Output: top self-time HLO ops + category totals, from the xplane via
tensorboard_plugin_profile's raw_to_tool_data converter.
"""

import argparse
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def capture(outdir, steps, remat=False, bn_f32=False):
    import jax
    import jax.numpy as jnp

    from rtpe_tpu.models import AttentionStudentSteps
    from rtpe_tpu.train import (
        DistillConfig, DistillTrainState, make_distill_train_step)

    bs, hw = 16, 450
    student = AttentionStudentSteps(
        inplanes=80, num_heatmaps=17, ae_dims=0,
        detach_att_for_det=True, dtype=jnp.bfloat16, remat=remat)
    x0 = jnp.zeros((1, hw, hw, 3))
    sv = jax.jit(lambda: student.init(
        jax.random.PRNGKey(0), x0, x0, train=False))()
    dcfg = DistillConfig()
    state = DistillTrainState.create(sv, dcfg)
    step_fn = make_distill_train_step(
        student, dcfg, bn_dtype=None if bn_f32 else jnp.bfloat16)
    rng = np.random.RandomState(0)
    batch = {
        "img": rng.rand(bs, hw, hw, 3).astype(np.float32),
        "img_alt": rng.rand(bs, hw, hw, 3).astype(np.float32),
        "segm_mask": np.ones((bs, hw, hw, 1), np.float32),
        "gt_hms": np.zeros((bs, hw, hw, 17), np.float32),
        "teacher_hms": rng.rand(bs, hw, hw, 17).astype(np.float32),
        "mask": np.ones((bs, hw, hw, 1), np.float32),
    }
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    print("compile ...", file=sys.stderr, flush=True)
    state, _ = jax.block_until_ready(step_fn(state, batch))
    print("tracing ...", file=sys.stderr, flush=True)
    with jax.profiler.trace(outdir):
        for _ in range(steps):
            state, m = step_fn(state, batch)
        jax.block_until_ready(state)
    return outdir


def report(outdir, top):
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    runs = glob.glob(os.path.join(outdir, "plugins/profile/*"))
    run = sorted(runs)[-1]
    xplanes = glob.glob(os.path.join(run, "*.xplane.pb"))
    params = {"graph_viewer_options": {}}
    for tool in ("hlo_stats", "framework_op_stats"):
        try:
            data, _ = raw_to_tool_data.xspace_to_tool_data(
                xplanes, tool + "^", params)
        except Exception as e:
            print(f"{tool}: {type(e).__name__}: {e}", file=sys.stderr)
            continue
        if isinstance(data, bytes):
            try:
                data = gzip.decompress(data)
            except OSError:
                pass
            data = data.decode("utf-8", "replace")
        fn = os.path.join(outdir, tool + ".json")
        with open(fn, "w") as f:
            f.write(data)
        print(f"wrote {fn} ({len(data)} bytes)")
        try:
            j = json.loads(data)
        except json.JSONDecodeError:
            continue
        # gviz table: {cols: [...], rows: [{c: [{v: ...}...]}]}
        if isinstance(j, list):
            j = j[0]
        cols = [c.get("label") or c.get("id") for c in j.get("cols", [])]
        rows = j.get("rows", [])
        print(f"\n== {tool}: columns = {cols}")
        # rank by the first column containing 'self' and 'time'
        tcol = next((i for i, c in enumerate(cols)
                     if c and "self" in c.lower()
                     and ("time" in c.lower() or "(us)" in c.lower())), None)
        if tcol is None:
            continue
        vals = []
        for r in rows:
            c = [x.get("v") if isinstance(x, dict) else x
                 for x in r.get("c", [])]
            try:
                vals.append((float(c[tcol]), c))
            except (TypeError, ValueError):
                pass
        vals.sort(reverse=True, key=lambda t: t[0])
        tot = sum(v for v, _ in vals)
        print(f"total self time: {tot:.0f}")
        for v, c in vals[:top]:
            brief = [str(x)[:60] for x in c[:min(len(c), 8)]]
            print(f"  {v:12.1f}  {' | '.join(brief)}")
        break


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--bn_f32", action="store_true")
    ap.add_argument("--outdir", default="/tmp/prof_train")
    ap.add_argument("--report_only", action="store_true")
    args = ap.parse_args()
    if not args.report_only:
        capture(args.outdir, args.steps, args.remat, args.bn_f32)
    report(args.outdir, args.top)


if __name__ == "__main__":
    main()
