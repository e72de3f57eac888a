"""Profile the EXACT int8-act serving program: int8 weights + int8
activation storage, bs128@640, 64 MB scoped-VMEM (the bench's serving
default), and rank op self-times with xplane_ops.py.

Purpose (VERDICT r4 item 4): the int8-act path meets its >=550 img/s
target but sits at ~58% of the int8 MXU peak with ~53% of HBM peak —
"neither roofline binds" and nothing names the binding factor.  This
gives the int8-act program the same trace-dossier treatment the bf16
headline got (profile_headline.py): per-op ranking, where the wide
bytes live, device busy fraction.

Run:  python experiments/profile_int8act.py [--bs 128] [--out DIR]
Then: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
          python experiments/xplane_ops.py /tmp/rtpe_prof_int8act --top 60
"""

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from rtpe_tpu.models import (
    PoseHigherHRNet, calibrate_act_scales, quantize_packed, w48_config)
from rtpe_tpu.models.hrnet_packed import pack_w48_params, packed_forward
from rtpe_tpu.utils.compile import serving_compiler_options


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=128)
    ap.add_argument("--hw", type=int, default=640)
    ap.add_argument("--out", default="/tmp/rtpe_prof_int8act")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    shutil.rmtree(args.out, ignore_errors=True)
    cfg = w48_config()
    model = PoseHigherHRNet(cfg=cfg, dtype=jnp.bfloat16)
    v = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        train=False))()
    pk = jax.jit(lambda v: pack_w48_params(v, cfg))(v)
    scales_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_act_scales.json")
    if os.path.exists(scales_path):
        with open(scales_path) as f:
            scales = json.load(f)
    else:
        scales = calibrate_act_scales(
            pk, [jax.random.normal(jax.random.PRNGKey(9),
                                   (1, 320, 320, 3))], cfg)
    pkq = jax.jit(lambda p: quantize_packed(p, scales))(pk)
    fwd = jax.jit(lambda pk, x: packed_forward(pk, x, cfg,
                                               int8_act=True),
                  compiler_options=serving_compiler_options())
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (args.bs, args.hw, args.hw, 3), jnp.float32)
    jax.block_until_ready(fwd(pkq, x))
    print("compiled", flush=True)
    jax.profiler.start_trace(args.out)
    for t in range(args.reps):
        x2 = jax.random.normal(jax.random.PRNGKey(50 + t),
                               (args.bs, args.hw, args.hw, 3),
                               jnp.float32)
        jax.block_until_ready(fwd(pkq, x2))
    jax.profiler.stop_trace()
    print(f"traced -> {args.out}", flush=True)


if __name__ == "__main__":
    main()
