"""Effective HBM/MXU utilization of the packed W48 serving forward.

Combines XLA's compiled cost analysis (flops + bytes accessed) with the
measured img/s to estimate how close the forward runs to the chip's
peak compute and bandwidth (VERDICT r1 "weak 1" asks for these numbers
recorded before/after).  Usage:

    python experiments/util_estimate.py [img_s]

v5e (TPU v5 lite) peaks used: 197 TFLOP/s bf16, 819 GB/s HBM.
"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from rtpe_tpu.models import PoseHigherHRNet, w48_config
from rtpe_tpu.models.hrnet_packed import pack_w48_params, packed_forward

PEAK_TFLOPS_BF16 = 197.0
PEAK_HBM_GBS = 819.0

img_s = float(sys.argv[1]) if len(sys.argv) > 1 else 334.3
bs = 128

cfg = w48_config()
model = PoseHigherHRNet(cfg=cfg, dtype=jnp.bfloat16)
v = jax.jit(lambda: model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)), train=False))()
pk = jax.jit(lambda v: pack_w48_params(v, cfg))(v)
lowered = jax.jit(lambda a, x: packed_forward(a, x, cfg)).lower(
    pk, jnp.zeros((bs, 640, 640, 3), jnp.float32))
ca = lowered.compile().cost_analysis()
flops = ca.get("flops", 0.0)
bytes_ = ca.get("bytes accessed", 0.0)
gflops_img = flops / bs / 1e9
gb_img = bytes_ / bs / 1e9
eff_tflops = img_s * gflops_img / 1e3
eff_gbs = img_s * gb_img
print(f"packed W48 forward, bs={bs}: {gflops_img:.1f} GFLOP/img, "
      f"{gb_img:.2f} GB/img (cost analysis)")
print(f"at {img_s:.1f} img/s: {eff_tflops:.1f} TFLOP/s "
      f"({100 * eff_tflops / PEAK_TFLOPS_BF16:.1f}% of bf16 peak), "
      f"{eff_gbs:.0f} GB/s ({100 * eff_gbs / PEAK_HBM_GBS:.1f}% of HBM peak)")
