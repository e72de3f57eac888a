"""Profile the EXACT headline serving program: packed bf16 forward,
bs128@640, 64 MB scoped-VMEM (the bench's serving default), and rank
op self-times with xplane_ops.py.

Purpose (VERDICT r3 weak #2): name where the last ~28% of bf16 peak
goes — relayout copies at packed/dense branch boundaries vs non-matmul
op tail — with trace evidence rather than analysis.

Run:  python experiments/profile_headline.py [--bs 128] [--out DIR]
Then: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
          python experiments/xplane_ops.py /tmp/rtpe_prof_headline --top 50
"""

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from rtpe_tpu.models import PoseHigherHRNet, w48_config
from rtpe_tpu.models.hrnet_packed import pack_w48_params, packed_forward
from rtpe_tpu.utils.compile import serving_compiler_options


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=128)
    ap.add_argument("--hw", type=int, default=640)
    ap.add_argument("--out", default="/tmp/rtpe_prof_headline")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    shutil.rmtree(args.out, ignore_errors=True)
    cfg = w48_config()
    model = PoseHigherHRNet(cfg=cfg, dtype=jnp.bfloat16)
    v = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        train=False))()
    pk = jax.jit(lambda v: pack_w48_params(v, cfg))(v)
    fwd = jax.jit(lambda pk, x: packed_forward(pk, x, cfg),
                  compiler_options=serving_compiler_options())
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (args.bs, args.hw, args.hw, 3), jnp.float32)
    jax.block_until_ready(fwd(pk, x))
    print("compiled", flush=True)
    jax.profiler.start_trace(args.out)
    for t in range(args.reps):
        x2 = jax.random.normal(jax.random.PRNGKey(50 + t),
                               (args.bs, args.hw, args.hw, 3),
                               jnp.float32)
        jax.block_until_ready(fwd(pk, x2))
    jax.profiler.stop_trace()
    print(f"traced -> {args.out}", flush=True)


if __name__ == "__main__":
    main()
