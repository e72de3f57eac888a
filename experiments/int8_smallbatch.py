"""Small-batch forward latency: bf16 vs int8 vs int8-act (VERDICT r4
item 6).

The r4 batteries recorded the bs-1 END-TO-END realtime number at
22.4 ms bf16 vs 31.5 ms int8-act (and 31.5 int8-weights-only — the
slowdown is the quantized program's dispatch itself, not activation
storage).  At bs128 int8-act is 1.6x FASTER.  Somewhere in between the
ranking flips; this measures the forward-only ms/img for the three
packed variants across small batches to locate the crossover and set
``PosePredictor``'s default ``int8_min_batch`` routing threshold.

Run: python experiments/int8_smallbatch.py [--batches 1,4,16]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("RTPE_LAP_SELFCHECK", "0")

import jax
import jax.numpy as jnp
import numpy as np

from rtpe_tpu.models import (
    PoseHigherHRNet, calibrate_act_scales, pack_w48_params,
    packed_forward, quantize_packed, w48_config)
from rtpe_tpu.utils.compile import serving_compiler_options

SCAN_LEN = 10


def measure(fwd, pk, bs, hw=640):
    def loop(a, x):
        def body(c, _):
            y = fwd(a, c)[-1]
            c = c + (jnp.mean(y.astype(jnp.float32)) * 1e-9
                     ).astype(c.dtype)
            return c, jnp.sum(y.astype(jnp.float32))
        _, outs = jax.lax.scan(body, x, None, length=SCAN_LEN)
        return outs

    x = jax.random.normal(jax.random.PRNGKey(1), (bs, hw, hw, 3),
                          jnp.float32)
    t0 = time.time()
    c = jax.jit(loop, compiler_options=serving_compiler_options()
                ).lower(pk, x).compile()
    jax.device_get(c(pk, x))
    compile_s = time.time() - t0
    times = []
    for t in range(5):
        x2 = jax.random.normal(jax.random.PRNGKey(61 + t),
                               (bs, hw, hw, 3), jnp.float32)
        jax.device_get(jnp.sum(x2))
        t0 = time.time()
        jax.device_get(c(pk, x2))
        times.append(time.time() - t0)
    ms_img = float(np.median(times)) / SCAN_LEN / bs * 1e3
    return ms_img, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,4,16")
    ap.add_argument("--variants", default="bf16,int8act")
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]
    variants = args.variants.split(",")

    cfg = w48_config()
    model = PoseHigherHRNet(cfg=cfg, dtype=jnp.bfloat16)
    v = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        train=False))()
    pk = jax.jit(lambda vv: pack_w48_params(vv, cfg))(v)
    pkq = None
    if any(vt != "bf16" for vt in variants):
        scales_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "bench_act_scales.json")
        if os.path.exists(scales_path):
            with open(scales_path) as f:
                scales = json.load(f)
        else:
            scales = calibrate_act_scales(
                pk, [jax.random.normal(jax.random.PRNGKey(9),
                                       (1, 320, 320, 3))], cfg)
        pkq = jax.jit(lambda p: quantize_packed(p, scales))(pk)

    out = {}
    for bs in batches:
        for vt in variants:
            params = pk if vt == "bf16" else pkq
            int8_act = vt == "int8act"
            fwd = lambda a, x: packed_forward(a, x, cfg,
                                              int8_act=int8_act)
            ms, cs = measure(fwd, params, bs)
            out[f"{vt}_bs{bs}_ms_img"] = round(ms, 2)
            print(f"{vt:8s} bs={bs:3d}: {ms:7.2f} ms/img "
                  f"({1e3 / ms:.1f} img/s amortized; compile "
                  f"{cs:.0f}s)", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
